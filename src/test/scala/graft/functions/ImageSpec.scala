package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Codec + Catalyst image expressions: roundtrip fidelity, the PSNR>=40dB
  * gate from BASELINE.json, resize plumbing, histogram normalization. */
class ImageSpec extends SparkSpec {
  import spark.implicits._

  test("lossless roundtrip: decode == pixelAt; psnr capped at 99") {
    val b = ImageCodec.encode(42L, 5, 4, lossy = false)
    assert(ImageCodec.width(b) === 5 && ImageCodec.height(b) === 4)
    val px = ImageCodec.decode(b)
    assert(px.length === 20)
    for (y <- 0 until 4; x <- 0 until 5)
      assert(px(y * 5 + x) === ImageCodec.pixelAt(42L, x, y, 5, 4))
    assert(ImageCodec.psnr(b, b) === 99.0)
  }

  test("lossy quantization keeps PSNR >= 40 dB (BASELINE gate)") {
    for (seed <- 1L to 20L) {
      val truth = ImageCodec.encode(seed, 16, 16, lossy = false)
      val lossy = ImageCodec.encode(seed, 16, 16, lossy = true)
      val p = ImageCodec.psnr(truth, lossy)
      assert(p >= 40.0, s"seed $seed psnr $p")
      assert(ImageCodec.isLossy(lossy) && !ImageCodec.isLossy(truth))
    }
  }

  test("resize: dims + nearest-neighbor identity on same size") {
    val b = ImageCodec.encode(7L, 8, 6, lossy = false)
    val r = ImageCodec.resize(b, 4, 3)
    assert(ImageCodec.width(r) === 4 && ImageCodec.height(r) === 3)
    assert(ImageCodec.decode(ImageCodec.resize(b, 8, 6)).toSeq === ImageCodec.decode(b).toSeq)
  }

  test("intensity histogram sums to 1 and matches brightness range") {
    val b = ImageCodec.encode(9L, 12, 12, lossy = false)
    val h = ImageCodec.intensityHistogram(b)
    assert(h.length === 16)
    assert(math.abs(h.sum - 1.0) < 1e-12)
    val mb = ImageCodec.meanBrightness(b)
    assert(mb >= 0.0 && mb <= 255.0)
  }

  test("catalyst expressions agree with the codec (and run codegen'd)") {
    val df = Seq((1L, 6, 5, false), (2L, 7, 7, true))
      .toDF("seed", "w", "h", "lossy")
      .withColumn("bytes", udf(ImageCodec.encode _).apply(col("seed"), col("w"), col("h"), col("lossy")))
    val rows = df.select(
      ImageFunctions.mean_brightness(col("bytes")).as("mb"),
      size(ImageFunctions.decode_image(col("bytes"))).as("n"),
      ImageFunctions.intensity_histogram(col("bytes")).as("hist"),
      length(ImageFunctions.resize_image(col("bytes"), lit(3), lit(3))).as("rl"),
      ImageFunctions.psnr(col("bytes"), col("bytes")).as("p"),
      col("seed"), col("w"), col("h"), col("lossy")).collect()
    rows.foreach { r =>
      val bytes = ImageCodec.encode(r.getAs[Long]("seed"), r.getAs[Int]("w"),
        r.getAs[Int]("h"), r.getAs[Boolean]("lossy"))
      assert(math.abs(r.getAs[Double]("mb") - ImageCodec.meanBrightness(bytes)) < 1e-12)
      assert(r.getAs[Int]("n") === r.getAs[Int]("w") * r.getAs[Int]("h"))
      assert(r.getAs[Seq[Double]]("hist").sum > 0.999)
      assert(r.getAs[Int]("rl") === ImageCodec.HeaderLen + 9)
      assert(r.getAs[Double]("p") === 99.0)
    }
  }
}

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

  test("aHash64: bits match the resize path; corrupt input hashes to 0") {
    for (seed <- 0L until 20L; (w, h) <- Seq((8, 8), (12, 9), (32, 17))) {
      val bytes = ImageCodec.encode(seed, w, h, lossy = seed % 2 == 0)
      val hash = ImageCodec.aHash64(bytes)
      // independent reference: the documented semantics via the resize
      // operator — sample to 8x8 (same index arithmetic), bit = px above
      // the integer grid mean
      val s = ImageCodec.decode(ImageCodec.resize(bytes, 8, 8))
      val sum = s.sum
      val expected = (0 until 64).foldLeft(0L) { (acc, i) =>
        if (s(i) * 64 > sum) acc | (1L << i) else acc
      }
      assert(hash === expected, s"seed=$seed w=$w h=$h")
    }
    // total on corrupt payloads (error-channel rows flow through the same
    // codegen'd expressions before being split off)
    assert(ImageCodec.aHash64(Array.empty[Byte]) === 0L)
    assert(ImageCodec.aHash64(Array[Byte](1, 2, 3)) === 0L)
    assert(ImageCodec.aHash64(
      ImageCodec.encode(1L, 4, 4, lossy = false).take(10)) === 0L)
    // forged header whose w*h overflows Int (46341^2 wraps negative):
    // must hash to 0, not crash the sampling loop
    val forged = ("GR01".getBytes("ASCII") ++
      Array[Byte](0xB5.toByte, 0x05, 0xB5.toByte, 0x05, 1, 2, 3, 4))
    assert(ImageCodec.aHash64(forged) === 0L)
    // resize shares the totality contract: forged/truncated sources yield
    // the requested-size zero payload, never an out-of-bounds read
    val rzForged = ImageCodec.resize(forged, 8, 8)
    assert(rzForged.length === ImageCodec.HeaderLen + 64)
    assert(ImageCodec.decode(rzForged).forall(_ == 0))
    assert(ImageCodec.decode(ImageCodec.resize(
      ImageCodec.encode(1L, 8, 8, lossy = false).take(20), 4, 4)).forall(_ == 0))
  }

  test("crop: region copy, zero-fill past bounds, total on corrupt input") {
    val bytes = ImageCodec.encode(3L, 10, 6, lossy = false)
    val px = ImageCodec.decode(bytes)
    val c = ImageCodec.crop(bytes, 7, 3, 4) // spills 1 col / 1 row past edge
    assert(ImageCodec.width(c) === 4 && ImageCodec.height(c) === 4)
    val cp = ImageCodec.decode(c)
    for (dy <- 0 until 4; dx <- 0 until 4) {
      val (sx, sy) = (7 + dx, 3 + dy)
      val want = if (sx < 10 && sy < 6) px(sy * 10 + sx) else 0
      assert(cp(dy * 4 + dx) === want, s"($dx,$dy)")
    }
    // corrupt source -> zero payload of the requested size
    assert(ImageCodec.decode(ImageCodec.crop(bytes.take(9), 0, 0, 3)).forall(_ == 0))
    // size outside the header's representable range (crop_image exposes s
    // to SQL): no NegativeArraySizeException at 46341+, no silent 2-byte
    // header truncation past 65535 — the empty payload instead
    assert(ImageCodec.crop(bytes, 0, 0, 0).isEmpty)
    assert(ImageCodec.crop(bytes, 0, 0, -5).isEmpty)
    assert(ImageCodec.crop(bytes, 0, 0, 46341).isEmpty)
    assert(ImageCodec.crop(bytes, 0, 0, 0x10000).isEmpty)
    assert(ImageCodec.crop(bytes, 0, 0, Int.MaxValue).isEmpty)
    // the max representable size still allocates fine and round-trips dims
    // (not executed at 65535 — 4 GiB; 1000 is a sane large-but-real probe)
    assert(ImageCodec.width(ImageCodec.crop(bytes, 0, 0, 1000)) === 1000)
  }

  test("pixelStd: exact integer moments; corrupt input yields 0") {
    for (seed <- 0L until 10L) {
      val bytes = ImageCodec.encode(seed, 12, 9, lossy = false)
      val px = ImageCodec.decode(bytes)
      val mean = px.sum.toDouble / px.length
      val ref = math.sqrt(px.map(p => p.toDouble * p).sum / px.length - mean * mean)
      assert(math.abs(ImageCodec.pixelStd(bytes) - ref) < 1e-9, s"seed=$seed")
    }
    assert(ImageCodec.pixelStd(Array.empty[Byte]) === 0.0)
    assert(ImageCodec.pixelStd(Array[Byte](1, 2, 3)) === 0.0)
    // uniform pixels -> zero contrast
    val flat = Array.fill[Byte](8 + 16)(0x40)
    System.arraycopy("GR01".getBytes("ASCII"), 0, flat, 0, 4)
    flat(4) = 0; flat(5) = 4; flat(6) = 0; flat(7) = 4
    assert(ImageCodec.pixelStd(flat) === 0.0)
  }

  test("aHash64 expression: parity with codec, small hamming on a near-dup") {
    val df = Seq(0L, 1L, 2L, 3L).map { seed =>
      (seed, ImageCodec.encode(seed, 16, 16, lossy = false))
    }.toDF("seed", "bytes")
    val rows = df.select(col("seed"),
        ImageFunctions.ahash64(col("bytes")).as("ah"),
        // byte surgery on pixel (0,0) — the q91 near-dup injection
        ImageFunctions.ahash64(concat(
          substring(col("bytes"), 1, 8),
          lit(Array(0xFF.toByte)),
          substring(col("bytes"), 10, Int.MaxValue))).as("ah_dup"))
      .collect()
    rows.foreach { r =>
      val seed = r.getAs[Long]("seed")
      val exp = ImageCodec.aHash64(ImageCodec.encode(seed, 16, 16, lossy = false))
      assert(r.getAs[Long]("ah") === exp, s"seed=$seed")
      // flipping one sampled pixel moves the hash by only a few bits
      val d = java.lang.Long.bitCount(r.getAs[Long]("ah") ^ r.getAs[Long]("ah_dup"))
      assert(d >= 1 && d <= 8, s"seed=$seed hamming=$d")
    }
  }
}

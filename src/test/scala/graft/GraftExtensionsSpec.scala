package graft

import org.apache.spark.sql.functions._
import graft.functions.ImageCodec

/** SQL-surface registration: the image expression family callable from
  * spark.sql(...) and the as-of strategy injectable via the public
  * SparkSessionExtensions hook. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registerSql: expressions callable from SQL with codegen parity") {
    GraftExtensions.registerSql(spark)
    Seq((1L, ImageCodec.encode(5L, 6, 4, lossy = false)))
      .toDF("id", "bytes").createOrReplaceTempView("imgs")
    val r = spark.sql(
      """SELECT mean_brightness(bytes) AS mb, size(decode_image(bytes)) AS n,
        | psnr(bytes, bytes) AS p, length(resize_image(bytes, 3, 2)) AS rl,
        | intensity_histogram(bytes)[0] AS h0
        |FROM imgs""".stripMargin).collect()(0)
    assert(math.abs(r.getAs[Double]("mb") -
      ImageCodec.meanBrightness(ImageCodec.encode(5L, 6, 4, lossy = false))) < 1e-12)
    assert(r.getAs[Int]("n") === 24)
    assert(r.getAs[Double]("p") === 99.0)
    assert(r.getAs[Int]("rl") === ImageCodec.HeaderLen + 6)
  }

  test("registerSql: text-signature family callable from SQL") {
    GraftExtensions.registerSql(spark)
    Seq(("the quick brown fox", "the quick brown cat"))
      .toDF("a", "b").createOrReplaceTempView("txt")
    val r = spark.sql(
      """SELECT size(minhash(a)) AS k16, size(minhash(a, 32)) AS k32,
        | size(lsh_bands(minhash(a))) AS bands,
        | hamming64(simhash(a), simhash(a)) AS self_d,
        | hamming64(simhash(a), simhash(b)) AS near_d
        |FROM txt""".stripMargin).collect()(0)
    assert(r.getAs[Int]("k16") === 16 && r.getAs[Int]("k32") === 32)
    assert(r.getAs[Int]("bands") === 4)
    assert(r.getAs[Int]("self_d") === 0)
    assert(r.getAs[Int]("near_d") > 0)
  }

  test("registerSql: audio + video payload families callable from SQL") {
    import graft.functions.{AudioCodec, VideoCodec}
    GraftExtensions.registerSql(spark)
    Seq((AudioCodec.encode(3L, 8000, 100, lossy = false), VideoCodec.encode(4L, 5, 4, 4)))
      .toDF("au", "vid").createOrReplaceTempView("clips")
    val r = spark.sql(
      """SELECT size(decode_audio(au)) AS ns, mean_amplitude(au) AS ma,
        | zero_crossings(au) AS zc, size(frame_rms(au, 32)) AS nf,
        | audio_psnr(au, au) AS ap,
        | frame_count(vid) AS vf, size(sample_frames(vid, 2)) AS sf,
        | mean_brightness(extract_frame(vid, 1)) AS fb
        |FROM clips""".stripMargin).collect()(0)
    val au = AudioCodec.encode(3L, 8000, 100, lossy = false)
    assert(r.getAs[Int]("ns") === 100)
    assert(math.abs(r.getAs[Double]("ma") - AudioCodec.meanAmplitude(au)) < 1e-12)
    assert(r.getAs[Int]("zc") === AudioCodec.zeroCrossings(au))
    assert(r.getAs[Int]("nf") === 4) // ceil(100/32)
    assert(r.getAs[Double]("ap") === 99.0)
    assert(r.getAs[Int]("vf") === 5 && r.getAs[Int]("sf") === 3)
    val frame = VideoCodec.extractFrame(VideoCodec.encode(4L, 5, 4, 4), 1)
    assert(math.abs(r.getAs[Double]("fb") - ImageCodec.meanBrightness(frame)) < 1e-12)
  }

  test("registerSql: split_fraction callable from SQL, matches Sampling") {
    GraftExtensions.registerSql(spark)
    spark.range(0, 50).createOrReplaceTempView("ids")
    val got = spark.sql(
      "SELECT id, split_fraction(id) AS f, split_fraction(id, 'other') AS g FROM ids")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val want = graft.ops.Sampling
    got.foreach { case (_, f, g) =>
      assert(f >= 0.0 && f < 1.0 && g >= 0.0 && g < 1.0)
    }
    // matches the Column API bit-for-bit, and salts are independent
    val api = spark.range(0, 50)
      .select(org.apache.spark.sql.functions.col("id"),
        want.splitFraction(org.apache.spark.sql.functions.col("id"), "split").as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (id, f, g) => assert(api(id) === f); }
    assert(got.count { case (_, f, g) => f != g } > 40)
  }

  test("extensions object wires the strategy and all sql functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders total
    assert(GraftExtensions.sqlFunctions.map(_._1).toSet === Set(
      "decode_image", "mean_brightness", "intensity_histogram", "psnr", "resize_image",
      "ahash64", "pixel_std", "crop_image", "minhash", "lsh_bands", "simhash",
      "hamming64",
      "decode_audio", "mean_amplitude", "zero_crossings", "frame_rms", "audio_psnr",
      "frame_count", "sample_frames", "extract_frame", "split_fraction"))
  }
}

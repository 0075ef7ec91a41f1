package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Audio codec + Catalyst expressions: header/roundtrip, the PSNR>=40dB
  * payload-fidelity gate on the lossy fmt, frame-RMS windowing semantics,
  * zero-crossing convention, and codec/expression agreement. */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  test("roundtrip: header fields + decode == sampleAt; psnr capped at 99") {
    val b = AudioCodec.encode(42L, 16000, 100, lossy = false)
    assert(AudioCodec.sampleRate(b) === 16000)
    assert(AudioCodec.numSamples(b) === 100)
    val s = AudioCodec.decode(b)
    assert(s.length === 100)
    for (i <- 0 until 100) assert(s(i) === AudioCodec.sampleAt(42L, i))
    assert(AudioCodec.psnr(b, b) === 99.0)
    // short/corrupt payloads are total, never throw
    assert(AudioCodec.sampleRate(Array[Byte](1, 2, 3)) === 0)
    assert(AudioCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioCodec.zeroCrossings(Array.empty[Byte]) === 0)
    assert(AudioCodec.frameRms(Array.empty[Byte], 256).isEmpty)
  }

  test("lossy quantization keeps PSNR >= 40 dB (payload-fidelity gate)") {
    for (seed <- 1L to 20L) {
      val truth = AudioCodec.encode(seed, 8000, 400, lossy = false)
      val lossy = AudioCodec.encode(seed, 8000, 400, lossy = true)
      val p = AudioCodec.psnr(truth, lossy)
      assert(p >= 40.0, s"seed $seed psnr $p")
      assert(AudioCodec.isLossy(lossy) && !AudioCodec.isLossy(truth))
    }
  }

  test("frameRms: frame count, partial tail, hand-checked values") {
    // 5 samples, frameLen 2 -> frames [2, 2, 1]
    val payload = Array[Int](128, 130, 126, 128, 133)
    val b = new Array[Byte](AudioCodec.HeaderLen + 5)
    "GA01".getBytes.copyToArray(b)
    b(6) = 0; b(7) = 5
    payload.zipWithIndex.foreach { case (v, i) => b(AudioCodec.HeaderLen + i) = v.toByte }
    val rms = AudioCodec.frameRms(b, 2)
    assert(rms.length === 3)
    assert(math.abs(rms(0) - math.sqrt((0 * 0 + 2 * 2) / 2.0)) < 1e-12)
    assert(math.abs(rms(1) - math.sqrt((2 * 2 + 0 * 0) / 2.0)) < 1e-12)
    assert(math.abs(rms(2) - 5.0) < 1e-12) // single-sample tail, |133-128|
    // zero crossings: signs are + + - + + (>=128) -> 2 flips
    assert(AudioCodec.zeroCrossings(b) === 2)
    // mean amplitude: (0+2+2+0+5)/5
    assert(math.abs(AudioCodec.meanAmplitude(b) - 1.8) < 1e-12)
  }

  test("catalyst expressions agree with the codec and stay codegen'd") {
    // spark.range (not a local Seq) so ConvertToLocalRelation can't fold
    // the whole query into a LocalTableScan — the codegen gate below needs
    // a real executed plan
    val df = spark.range(1, 20)
      .select(col("id").as("seed"),
        lit(8000).as("sr"),
        (pmod(col("id") * 97, lit(450)) + 64).cast("int").as("n"),
        (pmod(col("id"), lit(4)) === 0).as("lossy"))
      .withColumn("bytes",
        udf(AudioCodec.encode _).apply(col("seed"), col("sr"), col("n"), col("lossy")))
    val q = df.select(
      size(AudioFunctions.decode_audio(col("bytes"))).as("ns"),
      AudioFunctions.mean_amplitude(col("bytes")).as("ma"),
      AudioFunctions.zero_crossings(col("bytes")).as("zc"),
      AudioFunctions.frame_rms(col("bytes"), lit(256)).as("rms"),
      AudioFunctions.audio_psnr(col("bytes"), col("bytes")).as("p"),
      col("seed"), col("sr"), col("n"), col("lossy"))
    val rows = q.collect()
    rows.foreach { r =>
      val bytes = AudioCodec.encode(r.getAs[Long]("seed"), r.getAs[Int]("sr"),
        r.getAs[Int]("n"), r.getAs[Boolean]("lossy"))
      assert(r.getAs[Int]("ns") === r.getAs[Int]("n"))
      assert(math.abs(r.getAs[Double]("ma") - AudioCodec.meanAmplitude(bytes)) < 1e-12)
      assert(r.getAs[Int]("zc") === AudioCodec.zeroCrossings(bytes))
      val expRms = AudioCodec.frameRms(bytes, 256)
      val gotRms = r.getAs[scala.collection.Seq[Double]]("rms")
      assert(gotRms.size === expRms.length)
      gotRms.zip(expRms).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
      assert(r.getAs[Double]("p") === 99.0)
    }
    // whole-stage codegen: spans show as "*(n)" prefixes in the executed plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"audio expressions fell out of codegen:\n$plan")
  }

  test("rms_fingerprint: bits match a straight-line reference; 32-bit cap") {
    import spark.implicits._
    val clips = (0L until 20L).map { id =>
      val n = 64 + (id * 37 % 449).toInt
      (id, AudioCodec.encode(id * 7 + 3, 8000, n, lossy = id % 3 == 0))
    }
    val got = clips.toDF("id", "samples")
      .select(col("id"), AudioFunctions.rms_fingerprint(col("samples")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    clips.foreach { case (id, bytes) =>
      val rms = AudioCodec.frameRms(bytes, 16)
      val want = (0 until math.min(32, math.max(0, rms.length - 1)))
        .foldLeft(0L) { (acc, i) =>
          if (rms(i + 1) > rms(i)) acc | (1L << i) else acc
        }
      assert(got(id) === want, s"clip $id")
      assert(got(id) < (1L << 32), s"clip $id exceeds 32 bits")
    }
    // fewer than 2 frames -> 0 (the total-on-degenerate contract)
    val tiny = Seq((0L, AudioCodec.encode(1L, 8000, 10, lossy = false)))
      .toDF("id", "samples")
      .select(AudioFunctions.rms_fingerprint(col("samples")))
      .collect()(0).getLong(0)
    assert(tiny === 0L)
  }
}

package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._
import graft.plans.AsOfStrategy

/** The idiomatic deployment entry point: register the engine's Catalyst
  * pieces through SparkSessionExtensions so any session created with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (spark-submit, the
  * north rule's deployment mode) gets
  *  - the as-of sort-merge strategy, and
  *  - the image expression family as SQL functions
  * with no imports needed on the user side.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfStrategy)
    GraftExtensions.sqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
  }
}

object GraftExtensions {

  /** SQL-callable expression builders (shared by the extensions path and
    * [[registerSql]] for already-running sessions). */
  private def intArg(e: Expression, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got: $other")
  }

  val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "decode_image" -> { args => DecodeImage(args.head) },
    "mean_brightness" -> { args => MeanBrightness(args.head) },
    "intensity_histogram" -> { args => IntensityHistogram(args.head) },
    "psnr" -> { args => Psnr(args(0), args(1)) },
    "resize_image" -> { args => ResizeImage(args(0), args(1), args(2)) },
    "ahash64" -> { args => AHash64(args.head) },
    "pixel_std" -> { args => PixelStd(args.head) },
    "crop_image" -> { args => CropImage(args(0), args(1), args(2), args(3)) },
    // text-signature family: minhash(text[, k]), lsh_bands(sig[, bands]),
    // simhash(text), hamming64(a, b)
    "minhash" -> { args =>
      MinHashSig(args.head,
        if (args.length > 1) intArg(args(1), "k") else Text.MinHashK) },
    "lsh_bands" -> { args =>
      LshBands(args.head,
        if (args.length > 1) intArg(args(1), "bands") else Text.MinHashBands) },
    "simhash" -> { args => SimHash(args.head) },
    "hamming64" -> { args => Hamming64(args(0), args(1)) },
    // audio payload family
    "decode_audio" -> { args => DecodeAudio(args.head) },
    "mean_amplitude" -> { args => MeanAmplitude(args.head) },
    "zero_crossings" -> { args => ZeroCrossings(args.head) },
    "frame_rms" -> { args => FrameRms(args(0), args(1)) },
    "audio_psnr" -> { args => AudioPsnr(args(0), args(1)) },
    // video container family
    "frame_count" -> { args => VideoFrameCount(args.head) },
    "sample_frames" -> { args => SampleFrames(args(0), args(1)) },
    "extract_frame" -> { args => ExtractFrame(args(0), args(1)) },
    // corpus sampling: split_fraction(id[, salt]) — the deterministic
    // [0,1) split coordinate. Built as a concrete Catalyst tree (the
    // Column->Expression bridge yields an unresolved ColumnNodeExpression
    // that the function registry can't evaluate); the spec asserts
    // bit-equality with Sampling.splitFraction's Column formulation.
    "split_fraction" -> { args =>
      import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, Conv, Divide, Literal, Md5, Substring}
      import org.apache.spark.sql.types.{BinaryType, DoubleType, LongType, StringType}
      val salt = args.lift(1).map {
        case Literal(s, _) if s != null => s.toString
        case other => throw new IllegalArgumentException(
          s"salt must be a string literal, got: $other")
      }.getOrElse("split")
      val hex = Md5(Cast(Concat(Seq(
        Cast(args.head, StringType), Literal(":" + salt))), BinaryType))
      val hp = Cast(Conv(Substring(hex, Literal(1), Literal(13)),
        Literal(16), Literal(10)), LongType)
      Divide(Cast(hp, DoubleType), Literal((1L << 52).toDouble))
    })

  /** Register the SQL functions into an existing session (tests, REPLs). */
  def registerSql(spark: SparkSession): Unit =
    sqlFunctions.foreach { case (name, builder) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerFunction(spark, name, builder)
    }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Static helpers returning Catalyst-native types so the audio expressions
  * stay inside whole-stage codegen via `defineCodeGen` (one static call per
  * row, no interpreted fallback) — the [[ImageExprHelpers]] pattern applied
  * to the audio payload leg. */
object AudioExprHelpers {
  def decodeArr(bytes: Array[Byte]): ArrayData =
    new GenericArrayData(AudioCodec.decode(bytes))
  def frameRmsArr(bytes: Array[Byte], frameLen: Int): ArrayData =
    new GenericArrayData(AudioCodec.frameRms(bytes, frameLen))
  def meanAmplitude(bytes: Array[Byte]): Double = AudioCodec.meanAmplitude(bytes)
  def zeroCrossings(bytes: Array[Byte]): Int = AudioCodec.zeroCrossings(bytes)
  def psnr(a: Array[Byte], b: Array[Byte]): Double = AudioCodec.psnr(a, b)
}

/** decode(bytes) → array<int> samples. */
case class DecodeAudio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    AudioExprHelpers.decodeArr(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AudioExprHelpers.decodeArr($c)")
  override protected def withNewChildInternal(c: Expression): DecodeAudio = copy(child = c)
}

/** frame_rms(bytes, frameLen) → array<double>, the windowed
  * feature-extraction stage over the audio payload (per-frame RMS of the
  * centered samples; last frame partial). */
case class FrameRms(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any, fl: Any): Any =
    AudioExprHelpers.frameRmsArr(b.asInstanceOf[Array[Byte]], fl.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, fl) => s"graft.functions.AudioExprHelpers.frameRmsArr($b, $fl)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FrameRms =
    copy(left = l, right = r)
}

case class MeanAmplitude(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    AudioExprHelpers.meanAmplitude(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AudioExprHelpers.meanAmplitude($c)")
  override protected def withNewChildInternal(c: Expression): MeanAmplitude = copy(child = c)
}

case class ZeroCrossings(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    AudioExprHelpers.zeroCrossings(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AudioExprHelpers.zeroCrossings($c)")
  override protected def withNewChildInternal(c: Expression): ZeroCrossings = copy(child = c)
}

/** audio_psnr(a, b) → double dB; the payload-fidelity gate for the audio
  * leg (≥40 dB for the lossy fmt). */
case class AudioPsnr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    AudioExprHelpers.psnr(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.AudioExprHelpers.psnr($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AudioPsnr =
    copy(left = l, right = r)
}

/** Column-level API over the audio expressions. */
object AudioFunctions {
  def decode_audio(c: Column): Column =
    ColumnBridge.column(DecodeAudio(ColumnBridge.expression(c)))
  def frame_rms(c: Column, frameLen: Column): Column =
    ColumnBridge.column(FrameRms(ColumnBridge.expression(c), ColumnBridge.expression(frameLen)))
  def mean_amplitude(c: Column): Column =
    ColumnBridge.column(MeanAmplitude(ColumnBridge.expression(c)))
  def zero_crossings(c: Column): Column =
    ColumnBridge.column(ZeroCrossings(ColumnBridge.expression(c)))
  def audio_psnr(a: Column, b: Column): Column =
    ColumnBridge.column(AudioPsnr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** 32-bit loudness-contour fingerprint (the audio analog of the image
    * aHash): bit i set iff the (i+1)-th 16-sample frame's RMS exceeds the
    * i-th's — the sign of the energy delta, robust to re-encoding because
    * lossy quantization preserves coarse loudness shape. EXACTLY 32 bits
    * (deltas past the 32nd are ignored) so 4 x 8-bit LSH bands cover the
    * whole hash — a wider hash under fixed bands would leave a top band
    * identically zero and break the pigeonhole recall guarantee.
    * Composed from the codegen'd FrameRms with built-in HOFs; every
    * arithmetic step (exact-integer frame moments -> IEEE sqrt -> strict
    * compare -> pow-of-two sums below 2^32) is bit-reproducible in a
    * DuckDB replay of the same stored bytes. Clips with < 2 frames
    * fingerprint to 0. */
  def rms_fingerprint(samples: Column): Column = {
    import org.apache.spark.sql.functions._
    val rms = frame_rms(samples, lit(16))
    val bits = transform(
      sequence(lit(0), least(lit(31), size(rms) - 2)),
      i => when(element_at(rms, i + 2) > element_at(rms, i + 1),
        pow(lit(2.0), i.cast("double")).cast("long")).otherwise(lit(0L)))
    when(size(rms) >= 2,
      aggregate(bits, lit(0L), (acc, x) => acc + x)).otherwise(lit(0L))
  }
}

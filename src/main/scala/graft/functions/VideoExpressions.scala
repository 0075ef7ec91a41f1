package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd Catalyst expressions over the video container — the
  * [[ImageExprHelpers]] pattern on the video leg. `sample_frames` emits
  * image payloads, so the existing image expressions compose downstream
  * (brightness/histogram/resize/PSNR per sampled frame). */
object VideoExprHelpers {
  def sampleArr(bytes: Array[Byte], stride: Int): ArrayData =
    new GenericArrayData(VideoCodec.sampleFrames(bytes, stride).asInstanceOf[Array[Any]])
  def frameCount(bytes: Array[Byte]): Int = VideoCodec.frameCount(bytes)
  def extractFrame(bytes: Array[Byte], f: Int): Array[Byte] =
    VideoCodec.extractFrame(bytes, f)
}

case class VideoFrameCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    VideoExprHelpers.frameCount(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VideoExprHelpers.frameCount($c)")
  override protected def withNewChildInternal(c: Expression): VideoFrameCount = copy(child = c)
}

/** sample_frames(video, stride) → array<binary> of image payloads. */
case class SampleFrames(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any, st: Any): Any =
    VideoExprHelpers.sampleArr(b.asInstanceOf[Array[Byte]], st.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, st) => s"graft.functions.VideoExprHelpers.sampleArr($b, $st)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SampleFrames =
    copy(left = l, right = r)
}

/** extract_frame(video, f) → binary image payload (empty when out of
  * range — total, never throws). */
case class ExtractFrame(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any, f: Any): Any =
    VideoExprHelpers.extractFrame(b.asInstanceOf[Array[Byte]], f.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, f) => s"graft.functions.VideoExprHelpers.extractFrame($b, $f)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ExtractFrame =
    copy(left = l, right = r)
}

object VideoFunctions {
  def frame_count(c: Column): Column =
    ColumnBridge.column(VideoFrameCount(ColumnBridge.expression(c)))
  def sample_frames(c: Column, stride: Column): Column =
    ColumnBridge.column(SampleFrames(ColumnBridge.expression(c), ColumnBridge.expression(stride)))
  def extract_frame(c: Column, f: Column): Column =
    ColumnBridge.column(ExtractFrame(ColumnBridge.expression(c), ColumnBridge.expression(f)))
}

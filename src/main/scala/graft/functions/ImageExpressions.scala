package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Static helpers returning Catalyst-native types so the expressions below
  * stay inside whole-stage codegen via `defineCodeGen` (a single static call
  * per row; no interpreted fallback in the hot path). */
object ImageExprHelpers {
  def decodeArr(bytes: Array[Byte]): ArrayData =
    new GenericArrayData(ImageCodec.decode(bytes))
  def histArr(bytes: Array[Byte]): ArrayData =
    new GenericArrayData(ImageCodec.intensityHistogram(bytes))
  def psnr(a: Array[Byte], b: Array[Byte]): Double = ImageCodec.psnr(a, b)
  def brightness(bytes: Array[Byte]): Double = ImageCodec.meanBrightness(bytes)
  def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
    ImageCodec.resize(bytes, w, h)
  def ahash(bytes: Array[Byte]): Long = ImageCodec.aHash64(bytes)
  def pixelStd(bytes: Array[Byte]): Double = ImageCodec.pixelStd(bytes)
  def crop(bytes: Array[Byte], x: Int, y: Int, s: Int): Array[Byte] =
    ImageCodec.crop(bytes, x, y, s)
}

/** decode(bytes) -> array<int> pixels. Graft analog of musif's per-file
  * parse stage (`/root/reference/musif/extract/extract.py:44-98`), lifted to
  * a codegen'd columnar expression over the binary payload column. */
case class DecodeImage(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ImageExprHelpers.decodeArr(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageExprHelpers.decodeArr($c)")
  override protected def withNewChildInternal(c: Expression): DecodeImage = copy(child = c)
}

/** psnr(a, b) -> double dB; the per-row payload-fidelity gate (>=40 dB for
  * lossy fmt per BASELINE.json). */
case class Psnr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ImageExprHelpers.psnr(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ImageExprHelpers.psnr($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Psnr =
    copy(left = l, right = r)
}

case class MeanBrightness(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ImageExprHelpers.brightness(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageExprHelpers.brightness($c)")
  override protected def withNewChildInternal(c: Expression): MeanBrightness = copy(child = c)
}

/** resize(bytes, w, h) -> binary (nearest-neighbor), the multimodal
  * transform stage. */
case class ResizeImage(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any, w: Any, h: Any): Any =
    ImageExprHelpers.resize(b.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, w, h) => s"graft.functions.ImageExprHelpers.resize($b, $w, $h)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): ResizeImage =
    copy(first = f, second = s, third = t)
}

/** ahash64(bytes) -> bigint average-hash perceptual fingerprint — the
  * payload-derived analog of the input table's `phash` column; the key the
  * image near-dup stage (q91) bands and joins on. */
case class AHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ImageExprHelpers.ahash(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageExprHelpers.ahash($c)")
  override protected def withNewChildInternal(c: Expression): AHash64 = copy(child = c)
}

/** crop_image(bytes, x, y, s) -> binary square crop of side s at source
  * offset (x, y), zero-filled outside source bounds — the random-crop
  * transform of a vision training pipeline (deterministic given (x, y)). */
case class CropImage(first: Expression, second: Expression,
                     third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(b: Any, x: Any, y: Any, s: Any): Any =
    ImageExprHelpers.crop(b.asInstanceOf[Array[Byte]],
      x.asInstanceOf[Int], y.asInstanceOf[Int], s.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, x, y, s) => s"graft.functions.ImageExprHelpers.crop($b, $x, $y, $s)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): CropImage =
    copy(first = f, second = s, third = t, fourth = q)
}

/** pixel_std(bytes) -> double population std of pixel values (exact
  * integer moments; the image-quality contrast signal). */
case class PixelStd(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ImageExprHelpers.pixelStd(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageExprHelpers.pixelStd($c)")
  override protected def withNewChildInternal(c: Expression): PixelStd = copy(child = c)
}

case class IntensityHistogram(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ImageExprHelpers.histArr(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ImageExprHelpers.histArr($c)")
  override protected def withNewChildInternal(c: Expression): IntensityHistogram = copy(child = c)
}

/** Column-level API over the expressions above. */
object ImageFunctions {
  def decode_image(c: Column): Column =
    ColumnBridge.column(DecodeImage(ColumnBridge.expression(c)))
  def psnr(a: Column, b: Column): Column =
    ColumnBridge.column(Psnr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def mean_brightness(c: Column): Column =
    ColumnBridge.column(MeanBrightness(ColumnBridge.expression(c)))
  def resize_image(c: Column, w: Column, h: Column): Column =
    ColumnBridge.column(ResizeImage(
      ColumnBridge.expression(c), ColumnBridge.expression(w), ColumnBridge.expression(h)))
  def intensity_histogram(c: Column): Column =
    ColumnBridge.column(IntensityHistogram(ColumnBridge.expression(c)))
  def ahash64(c: Column): Column =
    ColumnBridge.column(AHash64(ColumnBridge.expression(c)))
  def pixel_std(c: Column): Column =
    ColumnBridge.column(PixelStd(ColumnBridge.expression(c)))
  def crop_image(c: Column, x: Column, y: Column, s: Column): Column =
    ColumnBridge.column(CropImage(ColumnBridge.expression(c),
      ColumnBridge.expression(x), ColumnBridge.expression(y),
      ColumnBridge.expression(s)))
}

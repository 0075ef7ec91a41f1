package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-native helpers for the signature family: one static call per
  * row, invoked from generated code via `defineCodeGen` — this replaces the
  * Scala UDF path (and its per-row encoder ser/de) in the q50-q52/q59 hot
  * loops, keeping the whole projection inside whole-stage codegen. */
object TextExprHelpers {
  def minhash(s: UTF8String, k: Int): ArrayData =
    new GenericArrayData(Text.minHashSignature(if (s == null) "" else s.toString, k = k))
  def lshBands(sig: ArrayData, bands: Int): ArrayData =
    new GenericArrayData(Text.lshBuckets(sig.toLongArray(), bands))
  def simhash(s: UTF8String): Long =
    Text.simHash64(if (s == null) "" else s.toString)
}

/** minhash(text, k) -> array<long> signature (k is a plan-time constant). */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= Text.MinHashMaxK, s"k must be in [1, ${Text.MinHashMaxK}]: $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    TextExprHelpers.minhash(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprHelpers.minhash($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** lsh_bands(sig, bands) -> array<long> band bucket ids. */
case class LshBands(child: Expression, bands: Int) extends UnaryExpression {
  require(bands >= 1, s"bands must be positive: $bands")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    TextExprHelpers.lshBands(v.asInstanceOf[ArrayData], bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprHelpers.lshBands($c, $bands)")
  override protected def withNewChildInternal(c: Expression): LshBands = copy(child = c)
}

/** simhash(text) -> 64-bit fingerprint. */
case class SimHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    TextExprHelpers.simhash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprHelpers.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
}

/** hamming(a, b) -> popcount(a XOR b); pure generated arithmetic. */
case class Hamming64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hamming64 =
    copy(left = l, right = r)
}

/** Column-level API over the signature expressions. */
object TextFunctions {
  def minhash(c: Column, k: Int = Text.MinHashK): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), k))
  def lsh_bands(c: Column, bands: Int = Text.MinHashBands): Column =
    ColumnBridge.column(LshBands(ColumnBridge.expression(c), bands))
  def simhash(c: Column): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(c)))
  def hamming(a: Column, b: Column): Column =
    ColumnBridge.column(Hamming64(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

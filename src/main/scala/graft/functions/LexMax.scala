package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Lexicographic arg-max as a native Catalyst DeclarativeAggregate.
  *
  * `lex_max(a, b, c)` returns the struct `(a, b, c)` of the row whose tuple
  * is lexicographically greatest — the same deterministic tie-break as
  * `row_number() OVER (ORDER BY a DESC, b DESC, c DESC) = 1`, but as ONE
  * hash aggregate: the buffer is a flat set of primitive attributes (one per
  * child plus a `seen` flag), so `HashAggregateExec` qualifies (mutable
  * UnsafeRow buffer, whole-stage codegen) and partial aggregation applies —
  * no per-group sort, no straggler task when the group key has few distinct
  * values.
  *
  * Built-in alternatives fall short: `max(struct(...))` carries a struct
  * aggregation buffer, which `UnsafeRow` cannot mutate in place, so Spark
  * silently downgrades the whole aggregate to SortAggregate (per-partition
  * sort of every input row). `max_by(x, y)` hash-aggregates but breaks ties
  * arbitrarily.
  *
  * Null/tie semantics: tuples compare via struct ordering, where a NULL
  * field sorts below any value — so every field behaves as `DESC NULLS
  * LAST`, identical to the ranked-window formulation. The comparison is
  * total (CreateStruct is never NULL), so the result is arrival-order
  * independent.
  *
  * Reference semantics: musif's argmax-with-identity extractors — e.g.
  * lowest/highest note keeping the note name
  * (`/root/reference/musif/extract/features/ambitus/handler.py:65-75`).
  */
case class LexMax(children: Seq[Expression])
    extends DeclarativeAggregate {

  require(children.nonEmpty, "lex_max needs at least one ordering column")

  override def nullable: Boolean = true
  override def dataType: DataType = StructType(children.zipWithIndex.map {
    case (c, i) => StructField(s"c$i", c.dataType, nullable = true)
  })

  private lazy val seen = AttributeReference("lexmax_seen", BooleanType, nullable = false)()
  private lazy val fields = children.zipWithIndex.map { case (c, i) =>
    AttributeReference(s"lexmax_$i", c.dataType, nullable = true)()
  }

  override lazy val aggBufferAttributes: Seq[AttributeReference] = seen +: fields

  override lazy val initialValues: Seq[Expression] =
    Literal(false) +: children.map(c => Literal.create(null, c.dataType))

  /** Struct comparison is orderable for atomic fields and codegen-supported
    * (ctx.genComp handles StructType). */
  private def tupleGt(a: Seq[Expression], b: Seq[Expression]): Expression =
    GreaterThan(CreateStruct(a), CreateStruct(b))

  override lazy val updateExpressions: Seq[Expression] = {
    val takeInput = Or(Not(seen), Coalesce(Seq(tupleGt(children, fields), Literal(false))))
    Literal(true) +: children.zip(fields).map { case (in, buf) =>
      If(takeInput, in, buf)
    }
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val takeRight = Or(
      Not(seen.left),
      And(seen.right,
        Coalesce(Seq(tupleGt(fields.map(_.right), fields.map(_.left)), Literal(false)))))
    Or(seen.left, seen.right) +: fields.map { f =>
      If(takeRight, f.right, f.left)
    }
  }

  override lazy val evaluateExpression: Expression =
    If(seen,
      CreateNamedStruct(fields.zipWithIndex.flatMap { case (f, i) =>
        Seq(Literal(s"c$i"), f)
      }),
      Literal.create(null, dataType))

  override def prettyName: String = "lex_max"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LexMax = copy(children = newChildren)
}

object LexMax {
  /** Column-API entry: `lexMax(price, orderkey, linenumber).getField("c1")`. */
  def lexMax(cols: Column*): Column =
    ColumnBridge.column(
      LexMax(cols.map(ColumnBridge.expression)).toAggregateExpression())
}

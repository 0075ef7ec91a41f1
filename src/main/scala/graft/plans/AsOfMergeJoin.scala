package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** A first-class Catalyst point-in-time join: sort-merge with inequality
  * pruning over co-partitioned, (entity, ts)-sorted children — the physical
  * shape the north rule names ("repartitionAndSortWithinPartitions semantics
  * expressed through Catalyst SortMergeJoin with inequality pruning").
  *
  * Planner contract (EnsureRequirements supplies all of it):
  *  - both children hash-clustered by entity (co-partitioned exchange pair);
  *  - both children sorted within partitions by (entity, ts).
  *
  * Execution is a single forward merge per partition: the build pointer only
  * ever advances (the `<=` inequality prunes re-scans), carrying the latest
  * at-or-before payload per entity. Per-partition cost is O(|probe|+|build|)
  * with O(1) state — no history buffering, no window materialization,
  * hot-entity cost bounded by that entity's row count.
  *
  * Reference semantics reproduced: latest annotation at-or-before the event
  * beat (`/root/reference/musif/extract/features/scale_relative/utils.py:100-135`),
  * zero temporal leakage by the `<=` bound, left-outer nulls when no label
  * precedes the probe.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftEntity: Attribute,
    leftTs: Attribute,
    rightEntity: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override lazy val resolved: Boolean = childrenResolved

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, le, lt, re, rt, payload) =>
      AsOfMergeJoinExec(le, lt, re, rt, payload, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }

  /** Idempotent injection into a session (public extraStrategies hook). */
  def setup(session: SparkSession): Unit =
    if (!session.experimental.extraStrategies.contains(AsOfStrategy))
      session.experimental.extraStrategies =
        AsOfStrategy +: session.experimental.extraStrategies
}

case class AsOfMergeJoinExec(
    leftEntity: Attribute,
    leftTs: Attribute,
    rightEntity: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  // Both sides clustered by entity — EnsureRequirements co-partitions the
  // exchanges exactly as it does for an equi SortMergeJoin.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftEntity)) :: ClusteredDistribution(Seq(rightEntity)) :: Nil

  // Secondary sort: (entity, ts) within partitions on both sides.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftEntity, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightEntity, Ascending), SortOrder(rightTs, Ascending)))

  // Probe-side ordering survives the merge.
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftEntity, Ascending), SortOrder(leftTs, Ascending))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val leftOut = left.output
    val rightOut = right.output
    val payloadAttrs = payload
    val (le, lt, re, rt) = (leftEntity, leftTs, rightEntity, rightTs)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (probeIter, buildIter) =>
      // (entity, ts) key rows for both sides; orderings are bound to the
      // 2-field key shape so one comparator serves probe and build keys
      val probeKeyProj = UnsafeProjection.create(
        Seq(BindReferences.bindReference[Expression](le, leftOut),
          BindReferences.bindReference[Expression](lt, leftOut)))
      val buildKeyProj = UnsafeProjection.create(
        Seq(BindReferences.bindReference[Expression](re, rightOut),
          BindReferences.bindReference[Expression](rt, rightOut)))
      val entityOrd = RowOrdering.createNaturalAscendingOrdering(Seq(le.dataType))
        .asInstanceOf[Ordering[InternalRow]]
      val keyFields = Seq(
        BoundReference(0, le.dataType, nullable = true),
        BoundReference(1, lt.dataType, nullable = true))
      val tsOrd = RowOrdering.create(
        Seq(SortOrder(keyFields(1), Ascending)), Seq.empty).asInstanceOf[Ordering[InternalRow]]

      val payloadProj = UnsafeProjection.create(payloadAttrs, rightOut)
      val nullPayload: InternalRow = new GenericInternalRow(payloadAttrs.length)
      val joined = new JoinedRow
      // bind against nullable payload attrs: the output is left-outer, so an
      // unmatched probe row projects from an all-null GenericInternalRow —
      // binding at the build side's original (possibly non-null) nullability
      // would elide the null check and project garbage instead of NULL
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOut ++ payloadAttrs.map(_.withNullability(true)))

      val build = buildIter.buffered
      var lastKey: UnsafeRow = null      // copy of the matched build key
      var lastPayload: UnsafeRow = null  // copy of the matched payload

      probeIter.map { probeRow =>
        val pk = probeKeyProj(probeRow)
        var advance = true
        while (advance && build.hasNext) {
          val bk = buildKeyProj(build.head)
          val ce = entityOrd.compare(bk, pk)
          if (ce < 0 || (ce == 0 && tsOrd.compare(bk, pk) <= 0)) {
            if (ce == 0) { // candidate: latest-so-far for the probe's entity
              lastKey = bk.copy()
              lastPayload = payloadProj(build.head).copy()
            }
            build.next()
          } else advance = false
        }
        val matched = lastPayload != null && entityOrd.compare(lastKey, pk) == 0
        numOutputRows += 1
        resultProj(joined(probeRow, if (matched) lastPayload else nullPayload))
      }
    }
  }
}

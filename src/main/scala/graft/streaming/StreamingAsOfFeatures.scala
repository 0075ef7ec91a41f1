package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The flagship composition — as-of label enrichment THEN per-entity
  * tumbling-window feature aggregation — as ONE custom stateful operator.
  *
  * Why fused: chaining [[StreamingAsOf.asOfStream]] into a built-in
  * windowed aggregation is unsound in Spark's execution model, not just
  * flagged — the as-of stage can only emit a row once the watermark passed
  * its event time, and the downstream stateful aggregate filters its input
  * against that same global watermark, so every enriched row arrives
  * "late" and is discarded (verified empirically: the chained query
  * returns zero rows with the correctness check disabled; that check —
  * "Detected pattern of possible 'correctness' issue due to global
  * watermark" — exists precisely for this combination). Folding the window
  * aggregation into the same `flatMapGroupsWithState` removes the
  * cross-operator watermark hazard: one state holds the out-of-order
  * buffer, the carried as-of label, AND the open window accumulators.
  *
  * Per microbatch and per entity: rows the watermark has passed drain from
  * the buffer in (ts, labels-first) order (the `<=` as-of bound); each
  * probe takes the latest label at-or-before it and folds into its
  * tumbling window's accumulator; a window emits once the watermark
  * reaches its END (every member row has ts < end ≤ wm, so it has already
  * drained — the window is complete). An event-time timeout re-fires idle
  * groups so buffered rows and open windows flush without further input.
  * State is O(horizon arrival rate) for the buffer + O(open windows) per
  * entity — both watermark-bounded.
  */
object StreamingAsOfFeatures {
  import StreamingAsOf.{In, St}

  /** One closed tumbling window of enriched features per (entity, start):
    * event count, labeled-event count, sum of joined label weights (None if
    * no event in the window had a label yet). */
  case class WinOut(entity: Long, windowStart: Timestamp,
                    nEvents: Long, nLabeled: Long, wSum: Option[Double])

  /** Open-window accumulator. */
  case class Acc(n: Long, nLabeled: Long, wSum: Double)

  /** Fused state: the as-of state plus open window accumulators keyed by
    * window start (epoch ms). */
  case class WSt(asOf: St, windows: Map[Long, Acc])

  def asOfWindowedStream(input: Dataset[In], windowSize: String = "15 minutes",
                         watermark: String = "10 minutes"): Dataset[WinOut] = {
    import input.sparkSession.implicits._
    val winMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(windowSize))
    val windowMs = winMs.days * 86400000L + winMs.microseconds / 1000L
    require(winMs.months == 0 && windowMs > 0, s"bad window size: $windowSize")

    input
      .withWatermark("ts", watermark)
      .groupByKey(_.entity)
      .flatMapGroupsWithState[WSt, WinOut](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (entity: Long, rows: Iterator[In], state: GroupState[WSt]) =>
          val st0 = state.getOption.getOrElse(WSt(St(Nil, None, None, None), Map.empty))
          val buf = st0.asOf.buffer ++ rows
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) = buf.partition(_.ts.getTime <= wm)
          val ordered = ready.sortBy(r => (r.ts.getTime, !r.isLabel))
          var lastTs = st0.asOf.lastTs
          var lastLabel = st0.asOf.lastLabel
          var lastWeight = st0.asOf.lastWeight
          var windows = st0.windows
          ordered.foreach { r =>
            if (r.isLabel) {
              lastTs = Some(r.ts.getTime); lastLabel = Some(r.label)
              lastWeight = Some(r.weight)
            } else {
              val start = Math.floorDiv(r.ts.getTime, windowMs) * windowMs
              val acc = windows.getOrElse(start, Acc(0L, 0L, 0.0))
              windows = windows.updated(start, Acc(
                acc.n + 1,
                acc.nLabeled + (if (lastLabel.isDefined) 1 else 0),
                acc.wSum + lastWeight.getOrElse(0.0)))
            }
          }
          // a window is complete once wm >= its end: every member has
          // ts < end <= wm and has therefore already drained above
          val (closed, open) = windows.partition { case (start, _) =>
            start + windowMs <= wm
          }
          state.update(WSt(St(pending, lastTs, lastLabel, lastWeight), open))
          // re-fire when the next buffered row or the next window end
          // becomes drainable, even if the entity goes quiet
          val nextDue = (pending.map(_.ts.getTime) ++
            open.keys.map(_ + windowMs)).reduceOption(_ min _)
          nextDue.foreach(d => state.setTimeoutTimestamp(math.max(d, wm + 1)))
          closed.toSeq.sortBy(_._1).iterator.map { case (start, a) =>
            WinOut(entity, new Timestamp(start), a.n, a.nLabeled,
              if (a.nLabeled > 0) Some(a.wSum) else None)
          }
      }
  }
}

package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming point-in-time join as CUSTOM STATE — the
  * `flatMapGroupsWithState` operator the north star names for semantics the
  * built-in streaming joins can't express (stream-stream as-of: the latest
  * label at-or-before each probe's event time, zero leakage, out-of-order
  * tolerant).
  *
  * Contract: one merged input stream (probes + labels tagged by `isLabel`,
  * the same union shape as the batch formulation in
  * `ops/AsOfJoin.asOf`), keyed by entity. Per entity the state holds
  *  - a buffer of rows still INSIDE the watermark horizon (unsafe to
  *    process: an earlier row may still arrive), and
  *  - the latest label seen at-or-before everything already processed.
  *
  * When the event-time watermark passes a row's timestamp the row is
  * processed in (ts, labels-first) order — a label at T applies to a probe
  * at the same T, matching the batch `<=` bound (AsOfJoinSpec's tie edge).
  * Outputs therefore trail real time by the watermark delay: that delay is
  * exactly the price of out-of-order correctness. State is
  * O(arrival rate x horizon) for the buffer plus O(1) per entity for the
  * carried label; an EventTimeTimeout re-fires idle groups so buffered rows
  * drain even if the entity receives no further input.
  *
  * Reference semantics: the latest annotation at-or-before the event beat
  * (`/root/reference/musif/extract/features/scale_relative/utils.py:100-135`),
  * streaming-shaped.
  */
object StreamingAsOf {

  /** Merged input row: a probe event (`isLabel=false`) or a label update. */
  case class In(entity: Long, ts: Timestamp, isLabel: Boolean,
                eventId: String, label: String, weight: Double)

  /** Probe joined with the latest at-or-before label (None = no label yet). */
  case class Out(entity: Long, ts: Timestamp, eventId: String,
                 label: Option[String], weight: Option[Double])

  /** Per-entity state: unprocessed buffer + carried latest label. */
  case class St(buffer: List[In], lastTs: Option[Long],
                lastLabel: Option[String], lastWeight: Option[Double])

  def asOfStream(input: Dataset[In], watermark: String = "10 minutes"): Dataset[Out] = {
    import input.sparkSession.implicits._
    input
      .withWatermark("ts", watermark)
      .groupByKey(_.entity)
      .flatMapGroupsWithState[St, Out](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (entity: Long, rows: Iterator[In], state: GroupState[St]) =>
          val st0 = state.getOption.getOrElse(St(Nil, None, None, None))
          val buf = st0.buffer ++ rows
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) = buf.partition(_.ts.getTime <= wm)
          // labels sort before probes at equal ts: the `<=` as-of bound
          val ordered = ready.sortBy(r => (r.ts.getTime, !r.isLabel))
          var lastTs = st0.lastTs
          var lastLabel = st0.lastLabel
          var lastWeight = st0.lastWeight
          val out = List.newBuilder[Out]
          ordered.foreach { r =>
            if (r.isLabel) {
              lastTs = Some(r.ts.getTime); lastLabel = Some(r.label)
              lastWeight = Some(r.weight)
            } else out += Out(entity, r.ts, r.eventId, lastLabel, lastWeight)
          }
          state.update(St(pending, lastTs, lastLabel, lastWeight))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(math.max(pending.map(_.ts.getTime).min, wm + 1))
          out.result().iterator
      }
  }
}

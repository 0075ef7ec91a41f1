package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming lag — the per-entity previous-value operator the north rule
  * names (`lag over Window.partitionBy(entity).orderBy(ts)`), stream-shaped
  * with the same buffer-until-watermark custom state as [[StreamingAsOf]] /
  * [[StreamingBackfill]]: rows buffer until the event-time watermark passes
  * them, then process in (ts, eventId) order carrying the previous row's
  * value, so each output pairs a row with its in-order predecessor (None at
  * the entity head) regardless of arrival order. The delta column this
  * enables is the streaming twin of the batch q20 lag/interval scan.
  */
object StreamingLag {

  case class In(entity: Long, ts: Timestamp, eventId: String, value: Double)
  case class Out(entity: Long, ts: Timestamp, eventId: String, value: Double,
                 prevValue: Option[Double], delta: Option[Double])

  /** Per-entity state: unprocessed buffer + the last processed value. */
  case class St(buffer: List[In], prev: Option[Double])

  def lagStream(input: Dataset[In],
                watermark: String = "10 minutes"): Dataset[Out] = {
    import input.sparkSession.implicits._
    input
      .withWatermark("ts", watermark)
      .groupByKey(_.entity)
      .flatMapGroupsWithState[St, Out](OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout) {
        (entity: Long, rows: Iterator[In], state: GroupState[St]) =>
          val st0 = state.getOption.getOrElse(St(Nil, None))
          val buf = st0.buffer ++ rows
          val wm = state.getCurrentWatermarkMs()
          val (ready, pending) = buf.partition(_.ts.getTime <= wm)
          val ordered = ready.sortBy(r => (r.ts.getTime, r.eventId))
          var prev = st0.prev
          val out = List.newBuilder[Out]
          ordered.foreach { r =>
            out += Out(entity, r.ts, r.eventId, r.value, prev,
              prev.map(p => r.value - p))
            prev = Some(r.value)
          }
          state.update(St(pending, prev))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(pending.map(_.ts.getTime).min, wm + 1))
          out.result().iterator
      }
  }
}

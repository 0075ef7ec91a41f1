package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-value backfill as CUSTOM STATE — the forward-fill
  * operator the north rule names (`last_value` over a bounded preceding
  * window), stream-shaped with the same buffer-until-watermark design as
  * [[StreamingAsOf]]: per entity the state holds the rows still inside the
  * watermark horizon plus the carried latest NON-NULL value. When the
  * event-time watermark passes a row's timestamp it is processed in
  * (ts, eventId) order — exactly the batch window's
  * `last(value, ignoreNulls=true) rowsBetween(unboundedPreceding, current)`
  * frame, so a non-null row fills itself and every later null row until
  * the next non-null. Out-of-order arrivals within the horizon are
  * reordered by the buffer sort; an EventTimeTimeout drains idle groups.
  *
  * Reference semantics: time-signature inheritance
  * (`/root/reference/musif/extract/features/tempo/handler.py:118-136`) and
  * tonality-map gap fill (`scale_relative/utils.py:61-72`), streaming-
  * shaped; batch twin in `ops/WindowOps.backfill`.
  */
object StreamingBackfill {

  case class In(entity: Long, ts: Timestamp, eventId: String,
                value: Option[Double])
  case class Out(entity: Long, ts: Timestamp, eventId: String,
                 value: Option[Double], valueFilled: Option[Double])

  /** Per-entity state: unprocessed buffer + carried latest non-null. */
  case class St(buffer: List[In], lastValue: Option[Double])

  def backfillStream(input: Dataset[In],
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
          var carried = st0.lastValue
          val out = List.newBuilder[Out]
          ordered.foreach { r =>
            if (r.value.isDefined) carried = r.value
            out += Out(entity, r.ts, r.eventId, r.value, carried)
          }
          state.update(St(pending, carried))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(
              math.max(pending.map(_.ts.getTime).min, wm + 1))
          out.result().iterator
      }
  }
}

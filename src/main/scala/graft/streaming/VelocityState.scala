package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `w_rolling_range` operator: every event
  * is emitted exactly once with its user's trailing-1-hour count and
  * spend — the continuously-served form of the velocity feature
  * (fraud/engagement serving reads it per event, not per hour bucket).
  *
  * Same design as [[FunnelState]]: `flatMapGroupsWithState` keyed by
  * user_id, and an event's row is FINAL once the watermark passes its
  * timestamp — at that point every possible frame member has arrived
  * (any event at or before it that hasn't arrived yet would be
  * beyond-watermark late and dropped upstream). Contributors stay
  * buffered until no future event's frame can reach back to them
  * (epoch_s + 3600 behind the watermark), so state per user is bounded
  * by rate × 1 h — the W4 TTL discipline — independent of stream
  * length. Cents are computed in the DataFrame projection (the same
  * `round(value*100)` expression as the batch twin) BEFORE the typed
  * state operator, so the two forms can never round differently.
  */
object VelocityState {

  case class VEvent(event_id: Long, ts: Timestamp, user_id: Long, cents: Long)

  case class VRow(
      event_id: Long, user_id: Long, ts: Timestamp, n_1h: Long, cents_1h: Long)

  /** (event_id, epoch_ms, cents, emitted) per buffered event. */
  case class VBuf(entries: Seq[(Long, Long, Long, Boolean)])

  /** Frame horizon in integer SECONDS — identical to the batch twin's
    * `RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW` over epoch seconds.
    */
  private val HorizonS = 3600L

  private def secOf(ms: Long): Long = Math.floorDiv(ms, 1000L)

  private def step(
      userId: Long,
      events: Iterator[VEvent],
      state: GroupState[VBuf]): Iterator[VRow] = {
    val prev = state.getOption.getOrElse(VBuf(Nil))
    val buf = prev.entries ++
      events.toSeq.map(e => (e.event_id, e.ts.getTime, e.cents, false))
    val wm = state.getCurrentWatermarkMs()

    val out = scala.collection.mutable.ArrayBuffer.empty[VRow]
    val updated = buf.map {
      case (id, ms, cents, false) if ms < wm =>
        val sec = secOf(ms)
        val frame = buf.filter { case (_, ms2, _, _) =>
          val s2 = secOf(ms2); s2 >= sec - HorizonS && s2 <= sec
        }
        out += VRow(id, userId, new Timestamp(ms),
          frame.size.toLong, frame.map(_._3).sum)
        (id, ms, cents, true)
      case e => e
    }
    // keep an emitted entry while a future event (ts >= wm) could still
    // have it in frame; unemitted entries always stay
    val keep = updated.filter { case (_, ms, _, emitted) =>
      !emitted || (secOf(ms) + HorizonS + 1) * 1000L >= wm
    }
    if (keep.isEmpty) state.remove()
    else {
      state.update(VBuf(keep))
      val next = keep.map { case (_, ms, _, emitted) =>
        if (!emitted) ms else (secOf(ms) + HorizonS + 1) * 1000L
      }.min
      state.setTimeoutTimestamp(math.max(next, wm) + 1)
    }
    out.iterator
  }

  /** events: streaming DF with (event_id, ts, user_id, value, …). */
  def velocity(events: DataFrame): Dataset[VRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", EventStreams.WatermarkDelay)
      .select(col("event_id"), col("ts"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[VEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        step)(Encoders.product[VBuf], Encoders.product[VRow])
  }
}

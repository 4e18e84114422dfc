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
  * user_id, state bounded by rate × 1 h (the W4 TTL discipline). Two
  * precision rules make streamed == batch EXACT on real data:
  *
  *  - **Timestamps carry microseconds.** `Timestamp.getTime` is only
  *    milliseconds; the buffer keeps epoch MICROS (rebuilt through
  *    `setNanos` on emit) so the emitted `ts` is bit-identical to the
  *    batch twin's column.
  *  - **Finalization waits for the END of the event's second.** The
  *    frame is second-granular (`RANGE ... 3600 PRECEDING` over epoch
  *    seconds), so a same-second peer arriving in a later micro-batch
  *    is still a frame member; an event is final only once the
  *    watermark passes `(its_second + 1) × 1000` ms — at that point
  *    any unseen peer would be beyond-watermark late and dropped
  *    upstream. Finalizing at `ts < watermark` (the naive rule) emits
  *    rows that silently miss those peers.
  *
  * Contributors stay buffered until no future event's frame can reach
  * back to them. Cents are computed in the DataFrame projection with
  * the batch twin's exact `round(value*100)` expression, so the two
  * forms can never round differently. Frames for a finalization batch
  * are computed from one sorted prefix-sum pass (O((B+F) log B), not
  * O(B·F) rescans).
  */
object VelocityState {

  case class VEvent(event_id: Long, ts: Timestamp, user_id: Long, cents: Long)

  case class VRow(
      event_id: Long, user_id: Long, ts: Timestamp, n_1h: Long, cents_1h: Long)

  /** (event_id, epoch_micros, cents, emitted) per buffered event. */
  case class VBuf(entries: Seq[(Long, Long, Long, Boolean)])

  /** Frame horizon in integer SECONDS — identical to the batch twin's
    * `RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW` over epoch seconds.
    */
  private val HorizonS = 3600L

  private def microsOf(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def toTimestamp(micros: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    t
  }

  private def secOf(micros: Long): Long = Math.floorDiv(micros, 1000000L)

  /** ms timestamp at which an event's frame is provably complete. */
  private def finalAtMs(micros: Long): Long = (secOf(micros) + 1L) * 1000L

  private def step(
      userId: Long,
      events: Iterator[VEvent],
      state: GroupState[VBuf]): Iterator[VRow] = {
    val prev = state.getOption.getOrElse(VBuf(Nil))
    val buf = prev.entries ++
      events.toSeq.map(e => (e.event_id, microsOf(e.ts), e.cents, false))
    val wm = state.getCurrentWatermarkMs()

    // one sorted pass over the buffer: per-second cumulative counts and
    // cents, then each finalized event reads its [sec-3600, sec] frame
    // from two binary searches
    val bySec = buf.map { case (_, us, cents, _) => (secOf(us), cents) }
      .sortBy(_._1).toArray
    val secs = bySec.map(_._1)
    val cumCents = bySec.scanLeft(0L)(_ + _._2) // length secs.length + 1
    def lowerBound(x: Long): Int = { // first idx with secs(idx) >= x
      var lo = 0; var hi = secs.length
      while (lo < hi) { val m = (lo + hi) >>> 1; if (secs(m) < x) lo = m + 1 else hi = m }
      lo
    }
    def frame(sec: Long): (Long, Long) = {
      val lo = lowerBound(sec - HorizonS)
      val hi = lowerBound(sec + 1)
      ((hi - lo).toLong, cumCents(hi) - cumCents(lo))
    }

    val out = scala.collection.mutable.ArrayBuffer.empty[VRow]
    val updated = buf.map {
      case (id, us, cents, false) if finalAtMs(us) <= wm =>
        val (n, c) = frame(secOf(us))
        out += VRow(id, userId, toTimestamp(us), n, c)
        (id, us, cents, true)
      case e => e
    }
    // keep an emitted entry while a future event (ts >= wm) could still
    // have it in frame; unemitted entries always stay
    val keep = updated.filter { case (_, us, _, emitted) =>
      !emitted || (secOf(us) + HorizonS + 1) * 1000L >= wm
    }
    if (keep.isEmpty) state.remove()
    else {
      state.update(VBuf(keep))
      val next = keep.map { case (_, us, _, emitted) =>
        if (!emitted) finalAtMs(us) else (secOf(us) + HorizonS + 1) * 1000L
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

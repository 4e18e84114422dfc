package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming 3-stage funnel (J3: view →≤30 min→ click →≤2 h→ purchase)
  * as ONE custom stateful operator.
  *
  * Why not chained stream-stream joins: after a time-interval join the
  * result carries two event-time columns, and Spark (like Flink — the
  * reference's own comment at aggregation_jobs.sql:20-23 records the
  * same limitation) cannot run a second stateful join on top. The
  * Spark-native alternative is `flatMapGroupsWithState` keyed by
  * user_id: buffer the user's recent events, and emit a view's funnel
  * rows exactly once — when the watermark proves its match set is
  * complete (v_ts + 30 min + 2 h has passed, so every candidate click
  * AND every candidate purchase for those clicks must have arrived).
  *
  * State per user is evicted at the same horizon — the analog of the
  * reference's 24 h state TTL (funnel_jobs.sql:15, W4): state size is
  * bounded by (per-user event rate × horizon), independent of stream
  * length. At 1000 executors the stream is hash-partitioned by user_id,
  * so state and compute shard horizontally; a skewed user bounds only
  * its own buffer (rate × 2.5 h), never a cross-user product.
  *
  * Output rows match the batch chained-LEFT-join twin row for row
  * (every view × matching click × matching purchase combination,
  * NULL-preserving) — StreamingSpec asserts exact equality.
  */
object FunnelState {

  case class FunnelEvent(user_id: Long, event_type: String, event_id: Long, ts: Timestamp)

  case class FunnelRow(
      user_id: Long,
      view_id: Long,
      click_id: Option[Long],
      purchase_id: Option[Long],
      v_ts: Timestamp,
      c_ts: Option[Timestamp],
      p_ts: Option[Timestamp])

  /** Buffered (event_id, epoch-ms) pairs per stage. */
  case class Buf(
      views: Seq[(Long, Long)],
      clicks: Seq[(Long, Long)],
      purchases: Seq[(Long, Long)])

  private val ClickWindowMs = 30L * 60 * 1000
  private val PurchaseWindowMs = 2L * 3600 * 1000

  /** A view's funnel output is final once this horizon passes. */
  private val HorizonMs = ClickWindowMs + PurchaseWindowMs

  private def emitFor(userId: Long, vid: Long, vts: Long, buf: Buf): Seq[FunnelRow] = {
    val mcs = buf.clicks.filter { case (_, cts) => cts >= vts && cts <= vts + ClickWindowMs }
    if (mcs.isEmpty)
      Seq(FunnelRow(userId, vid, None, None, new Timestamp(vts), None, None))
    else mcs.flatMap { case (cid, cts) =>
      val mps = buf.purchases.filter { case (_, pts) => pts >= cts && pts <= cts + PurchaseWindowMs }
      if (mps.isEmpty)
        Seq(FunnelRow(userId, vid, Some(cid), None,
          new Timestamp(vts), Some(new Timestamp(cts)), None))
      else mps.map { case (pid, pts) =>
        FunnelRow(userId, vid, Some(cid), Some(pid),
          new Timestamp(vts), Some(new Timestamp(cts)), Some(new Timestamp(pts)))
      }
    }
  }

  private def step(
      userId: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[Buf]): Iterator[FunnelRow] = {
    val prev = state.getOption.getOrElse(Buf(Nil, Nil, Nil))
    val evs = events.toSeq
    def of(t: String) = evs.filter(_.event_type == t).map(e => (e.event_id, e.ts.getTime))
    val buf = Buf(
      prev.views ++ of("view"),
      prev.clicks ++ of("click"),
      prev.purchases ++ of("purchase"))
    val wm = state.getCurrentWatermarkMs()

    // finalize views whose whole match horizon is behind the watermark
    val (done, pending) = buf.views.partition { case (_, vts) => vts + HorizonMs < wm }
    val out = done.sortBy(_._2).flatMap { case (vid, vts) => emitFor(userId, vid, vts, buf) }

    // evict clicks/purchases no pending or future view can ever match
    val keep = Buf(
      pending,
      buf.clicks.filter { case (_, cts) => cts + PurchaseWindowMs >= wm },
      buf.purchases.filter { case (_, pts) => pts + PurchaseWindowMs >= wm })
    if (keep.views.isEmpty && keep.clicks.isEmpty && keep.purchases.isEmpty) {
      state.remove()
    } else {
      state.update(keep)
      // wake this group when its earliest obligation matures (W4 TTL)
      val next = (keep.views.map(_._2 + HorizonMs) ++
        keep.clicks.map(_._2 + PurchaseWindowMs) ++
        keep.purchases.map(_._2 + PurchaseWindowMs)).min
      state.setTimeoutTimestamp(math.max(next, wm) + 1)
    }
    out.iterator
  }

  /** events: streaming DF with (event_id, ts, user_id, event_type, …). */
  def funnelChain(events: DataFrame): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", EventStreams.WatermarkDelay)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(step)(
        Encoders.product[Buf], Encoders.product[FunnelRow])
  }
}

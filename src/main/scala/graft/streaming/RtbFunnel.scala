package graft.streaming

import java.sql.Timestamp

import graft.rtb.RtbIngest
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's funnel JOB (funnel_jobs.sql:54-63) in streaming form
  * on the REAL OpenRTB data model: requests →(≤5 s) responses →(≤10 s)
  * impressions →(≤60 s) clicks, per-stream duplicates collapsed, counts
  * per request — as ONE `flatMapGroupsWithState` operator keyed by
  * `request_id`.
  *
  * Why this key works: every stage event carries the originating
  * request_id (responses via `ext.request_id`, impressions and clicks
  * directly), so the whole 4-stage match set of a request lives under
  * one key — no chained stream-stream joins (which Spark and Flink both
  * reject after the first interval join, two event-time columns), no
  * cross-key state. At scale the stream hash-partitions by request_id:
  * state per key is a handful of events inside a 75 s horizon, the
  * flattest possible skew profile (a request has ≤ a few bids).
  *
  * A request finalizes when the watermark passes `r_ts + 75 s`
  * (5+10+60 — every candidate response, impression, and click must have
  * arrived); its summary row is final, so downstream sinks are plain
  * appends. Stage events evict at the same 75 s horizon — the
  * FunnelState lesson: the keep horizon is the FULL funnel horizon,
  * because a click at C can serve a request as old as C − 75 s, which
  * finalizes at C + 75 s at the latest.
  */
object RtbFunnel {

  private val ResponseMs = 5000L
  private val ImpressionMs = 10000L
  private val ClickMs = 60000L
  private[streaming] val HorizonMs = ResponseMs + ImpressionMs + ClickMs

  case class StageEvent(
      request_id: String,
      kind: String, // request | response | impression | click
      event_id: String,
      impression_id: String, // clicks: the impression they belong to
      ts: Timestamp)

  case class Buf(
      rTs: Option[Long],
      responses: Seq[(String, Long)],
      impressions: Seq[(String, Long)],
      clicks: Seq[(String, String, Long)]) // (click_id, impression_id, ts)

  case class RequestFunnelSummary(
      request_id: String,
      r_ts: Timestamp,
      n_responses: Long,
      n_impressions: Long,
      n_clicks: Long)

  private[streaming] def summarize(key: String, rts: Long, buf: Buf): RequestFunnelSummary = {
    val bs = buf.responses.distinctBy(_._1)
      .filter { case (_, ts) => ts >= rts && ts <= rts + ResponseMs }
    val is = buf.impressions.distinctBy(_._1)
      .filter { case (_, ts) => bs.exists { case (_, b) => ts >= b && ts <= b + ImpressionMs } }
    val cs = buf.clicks.distinctBy(_._1)
      .filter { case (_, impId, ts) =>
        is.exists { case (id, i) => id == impId && ts >= i && ts <= i + ClickMs } }
    RequestFunnelSummary(key, new Timestamp(rts), bs.size, is.size, cs.size)
  }

  private def step(
      key: String,
      events: Iterator[StageEvent],
      state: GroupState[Buf]): Iterator[RequestFunnelSummary] = {
    val prev = state.getOption.getOrElse(Buf(None, Nil, Nil, Nil))
    val evs = events.toSeq
    def of(kind: String) = evs.filter(_.kind == kind)
    val buf = Buf(
      // duplicates carry identical timestamps; keep the earliest seen
      (prev.rTs.toSeq ++ of("request").map(_.ts.getTime)).minOption,
      prev.responses ++ of("response").map(e => (e.event_id, e.ts.getTime)),
      prev.impressions ++ of("impression").map(e => (e.event_id, e.ts.getTime)),
      prev.clicks ++ of("click").map(e => (e.event_id, e.impression_id, e.ts.getTime)))
    val wm = state.getCurrentWatermarkMs()

    val done = buf.rTs.filter(_ + HorizonMs < wm)
    val out = done.map(rts => summarize(key, rts, buf)).toSeq

    val keep = Buf(
      if (done.isDefined) None else buf.rTs,
      buf.responses.filter { case (_, ts) => ts + HorizonMs >= wm },
      buf.impressions.filter { case (_, ts) => ts + HorizonMs >= wm },
      buf.clicks.filter { case (_, _, ts) => ts + HorizonMs >= wm })
    if (keep.rTs.isEmpty && keep.responses.isEmpty &&
        keep.impressions.isEmpty && keep.clicks.isEmpty) {
      state.remove()
    } else {
      state.update(keep)
      val next = (keep.rTs.toSeq ++ keep.responses.map(_._2) ++
        keep.impressions.map(_._2) ++ keep.clicks.map(_._3)).map(_ + HorizonMs).min
      state.setTimeoutTimestamp(math.max(next, wm) + 1)
    }
    out.iterator
  }

  /** Normalize the four RAW nested streams to the common stage shape.
    * One union, one watermark — the operator sees every stage of a
    * request under its key regardless of which topic it arrived on.
    */
  def stageEvents(
      requests: DataFrame,
      responses: DataFrame,
      impressions: DataFrame,
      clicks: DataFrame): DataFrame = {
    val r = requests.select(col("id").as("request_id"), lit("request").as("kind"),
      col("id").as("event_id"), lit("").as("impression_id"),
      RtbIngest.parseTs(col("event_timestamp")).as("ts"))
    val b = responses.select(col("ext.request_id").as("request_id"), lit("response").as("kind"),
      col("id").as("event_id"), lit("").as("impression_id"),
      RtbIngest.parseTs(col("event_timestamp")).as("ts"))
    val i = impressions.select(col("request_id"), lit("impression").as("kind"),
      col("impression_id").as("event_id"), col("impression_id"),
      RtbIngest.parseTs(col("event_timestamp")).as("ts"))
    val c = clicks.select(col("request_id"), lit("click").as("kind"),
      col("click_id").as("event_id"), col("impression_id"),
      RtbIngest.parseTs(col("event_timestamp")).as("ts"))
    r.unionByName(b).unionByName(i).unionByName(c)
  }

  /** The streaming funnel: one final summary row per request. */
  def funnelSummaries(stageEvents: DataFrame): Dataset[RequestFunnelSummary] = {
    val spark = stageEvents.sparkSession
    import spark.implicits._
    stageEvents
      .withWatermark("ts", EventStreams.WatermarkDelay)
      .as[StageEvent]
      .groupByKey(_.request_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        step)(Encoders.product[Buf], Encoders.product[RequestFunnelSummary])
  }
}

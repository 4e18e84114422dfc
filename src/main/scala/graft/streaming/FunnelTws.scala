package graft.streaming

import graft.streaming.FunnelState.{Buf, FunnelEvent, ViewSummary}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** The funnel re-expressed on `transformWithState` — Spark 4's
  * arbitrary-state v2 operator — emitting the same per-view summaries
  * as [[FunnelState.funnelViewSummary]] with a structural win over
  * flatMapGroupsWithState: typed per-key state the RocksDB store
  * (required by the operator) spills off-heap — at 100 TB this is the
  * difference between bounded-memory executors and OOM on hot keys.
  *
  * State layout: each stage is a MapState of CHUNKS — one entry per
  * trigger's batch (keyed by the batch's min event id; a re-delivered
  * duplicate that collides merges into the existing entry) — rather
  * than one ListState element per event. The r12 form paid ~3× wall
  * on a hot key (sfun probe, 71 s vs 22 s benign) because ListState
  * has no partial delete: pruning the horizon re-put the whole kept
  * list through RocksDB every evicting trigger. Chunked MapState
  * turns eviction into `removeKey` of whole expired entries — zero
  * rewrite of kept data; the only rewritten entries are view chunks
  * STRADDLING the finalization boundary (a chunk is rewritten at most
  * a few times in its life, so lifetime write volume is O(events),
  * not O(events × triggers)). Appends stay O(batch): one new entry
  * per stage per trigger. Click/purchase chunks are dropped only when
  * their NEWEST event leaves the horizon; the stragglers kept up to a
  * chunk-width longer are provably unmatchable by any view that
  * finalizes later (such a view has vts ≥ wm − horizon > cts), so
  * summaries are bit-identical — FunnelPropertySpec pins it.
  *
  * Per-entry overhead is the trade: entries per key per stage =
  * triggers in the horizon (a 1 s cadence × 2.5 h horizon ≈ 9 000
  * small entries/key worst case — RocksDB prefix-scans them
  * sequentially at read; the alternative was rewriting the full
  * buffer per evicting trigger, which loses at every cadence).
  *
  * What does NOT work — measured, not assumed: the operator's
  * `eventTimeColumnName` chaining overload re-tags the output event
  * time for downstream stateful operators, but it VALIDATES that every
  * emitted row's event time is >= the current watermark
  * (EMITTING_ROWS_OLDER_THAN_WATERMARK_NOT_ALLOWED). A funnel summary
  * is only final once the watermark passes v_ts + horizon, so its
  * event time is always ~2.5 h BEHIND the watermark at emission —
  * horizon-delayed emission cannot chain into a same-query event-time
  * aggregation on any operator. The hourly rollup therefore chains
  * through storage ([[Sinks.funnelSummaryAppend]] →
  * [[Sinks.funnelRollupFromTable]]), the same job-per-stage shape the
  * reference uses.
  *
  * Funnel semantics (windows, finalization, eviction horizon) are
  * shared with [[FunnelState]] — both operators call the same
  * `summarize`, so StreamingSpec pins them to each other and to the
  * batch twin.
  */
object FunnelTws {

  /** One trigger's events for one stage, column-packed. */
  case class Chunk(ids: Array[Long], tss: Array[Long])

  class FunnelProcessor extends StatefulProcessor[Long, FunnelEvent, ViewSummary] {
    @transient private var views: MapState[Long, Chunk] = _
    @transient private var clicks: MapState[Long, Chunk] = _
    @transient private var purchases: MapState[Long, Chunk] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val kEnc = Encoders.scalaLong
      val vEnc = Encoders.product[Chunk]
      views = getHandle.getMapState("views", kEnc, vEnc, TTLConfig.NONE)
      clicks = getHandle.getMapState("clicks", kEnc, vEnc, TTLConfig.NONE)
      purchases = getHandle.getMapState("purchases", kEnc, vEnc, TTLConfig.NONE)
    }

    /** Append this trigger's events as ONE new entry (keyed by their min
      * event id — unique across committed triggers except when a
      * duplicate re-delivery repeats an id, in which case the colliding
      * entries merge so no buffered event can be overwritten away).
      */
    private def stash(s: MapState[Long, Chunk], evs: Seq[(Long, Long)]): Unit =
      if (evs.nonEmpty) {
        val k = evs.iterator.map(_._1).min
        val all =
          if (s.containsKey(k)) {
            val prior = s.getValue(k)
            prior.ids.zip(prior.tss).toSeq ++ evs
          } else evs
        s.updateValue(k, Chunk(all.map(_._1).toArray, all.map(_._2).toArray))
      }

    override def handleInputRows(
        key: Long,
        rows: Iterator[FunnelEvent],
        tv: TimerValues): Iterator[ViewSummary] = {
      val evs = rows.toSeq
      def of(t: String) =
        evs.filter(_.event_type == t).map(e => (e.event_id, e.ts.getTime))
      stash(views, of("view"))
      stash(clicks, of("click"))
      stash(purchases, of("purchase"))
      emitMature(key, tv)
    }

    override def handleExpiredTimer(
        key: Long,
        tv: TimerValues,
        expired: ExpiredTimerInfo): Iterator[ViewSummary] =
      emitMature(key, tv)

    /** Drop entries whose NEWEST event has left the horizon; return
      * (ALL events including the just-dropped ones — a watermark jump
      * can finalize a view and expire its matches in the same trigger,
      * and the unchunked form too summarized before evicting — plus the
      * earliest next entry-expiry obligation, MaxValue when none live).
      */
    private def drainStage(s: MapState[Long, Chunk], wm: Long): (Seq[(Long, Long)], Long) = {
      val all = Seq.newBuilder[(Long, Long)]
      val dead = Seq.newBuilder[Long]
      var next = Long.MaxValue
      s.iterator().foreach { case (k, c) =>
        var mx = Long.MinValue
        var i = 0
        while (i < c.tss.length) {
          if (c.tss(i) > mx) mx = c.tss(i)
          all += ((c.ids(i), c.tss(i)))
          i += 1
        }
        if (mx + FunnelState.HorizonMs < wm) dead += k
        else next = math.min(next, mx + FunnelState.HorizonMs)
      }
      dead.result().foreach(s.removeKey)
      (all.result(), next)
    }

    /** Same finalize/evict protocol as FunnelState.stepWith: emit views
      * whose horizon is behind the watermark, keep younger state, wake
      * at the earliest next obligation.
      */
    private def emitMature(key: Long, tv: TimerValues): Iterator[ViewSummary] = {
      val wm = tv.getCurrentWatermarkInMs()
      val (cs, nextC) = drainStage(clicks, wm)
      val (ps, nextP) = drainStage(purchases, wm)
      // views need PER-EVENT finalization, so their entries are walked
      // explicitly: an entry straddling the maturity boundary is
      // rewritten to its pending remainder, a fully-matured one is
      // removed — kept data in every other entry is never rewritten
      val done = Seq.newBuilder[(Long, Long)]
      val vsAll = Seq.newBuilder[(Long, Long)]
      var nextV = Long.MaxValue
      val rewrite = Seq.newBuilder[(Long, Option[Chunk])]
      views.iterator().foreach { case (k, c) =>
        val evs = c.ids.zip(c.tss)
        vsAll ++= evs
        val (d, pending) = evs.partition { case (_, vts) => vts + FunnelState.HorizonMs < wm }
        done ++= d
        if (pending.nonEmpty)
          nextV = math.min(nextV, pending.iterator.map(_._2).min + FunnelState.HorizonMs)
        if (d.nonEmpty)
          rewrite += (k -> (if (pending.isEmpty) None
            else Some(Chunk(pending.map(_._1), pending.map(_._2)))))
      }
      rewrite.result().foreach {
        case (k, None) => views.removeKey(k)
        case (k, Some(ch)) => views.updateValue(k, ch)
      }
      // one match-ready sort per trigger (see FunnelState.MatchBuf — the
      // hot-key guard shared by both stateful funnel operators)
      lazy val buf = FunnelState.matchReady(Buf(vsAll.result(), cs, ps))
      val out = done.result().sortBy(_._2).map { case (vid, vts) =>
        FunnelState.summarize(key, vid, vts, buf)
      }
      val next = math.min(nextV, math.min(nextC, nextP))
      if (next != Long.MaxValue)
        getHandle.registerTimer(math.max(next, wm) + 1)
      out.iterator
    }
  }

  /** Per-view summaries on the state-v2 operator (event-time timers,
    * append mode). Interchangeable with
    * [[FunnelState.funnelViewSummary]]; feed [[Sinks.funnelSummaryAppend]]
    * with either.
    */
  def funnelViewSummary(events: DataFrame): Dataset[ViewSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", EventStreams.WatermarkDelay)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor, TimeMode.EventTime(), OutputMode.Append)
  }

  /** transformWithState requires the RocksDB state store; scope the
    * provider to starting the query (the conf is captured at analysis)
    * so the HDFS-backed default keeps serving everything else.
    */
  def withRocksDb[A](spark: org.apache.spark.sql.SparkSession)(start: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try start
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

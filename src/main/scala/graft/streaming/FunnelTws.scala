package graft.streaming

import graft.streaming.FunnelState.{Buf, FunnelEvent, ViewSummary}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** The funnel re-expressed on `transformWithState` — Spark 4's
  * arbitrary-state v2 operator — emitting the same per-view summaries
  * as [[FunnelState.funnelViewSummary]] with a structural win over
  * flatMapGroupsWithState: **typed column-family state** (three
  * ListStates instead of one serialized blob), so appends don't rewrite
  * the whole buffer, and the RocksDB store (required by the operator)
  * spills state off-heap — at 100 TB this is the difference between
  * bounded-memory executors and OOM on hot keys.
  *
  * Measured trade on a HOT key (sfun probe, one user on 10% of 1M
  * events, coarse 8-batch cadence): the off-heap store's per-trigger
  * eviction rewrites (ListState has no partial delete — pruning a
  * horizon means re-putting the kept list through RocksDB) cost ~3×
  * wall vs the benign drain (71 s vs 22 s), while the on-heap
  * flatMapGroupsWithState form stays flat (19–25 s both legs) because
  * its whole-blob update is one serialize. Both are BOUNDED — per
  * trigger O(live state), no growth over time — so the operator choice
  * is throughput (fmgws) vs memory ceiling (tws spills; fmgws OOMs if
  * a key's horizon buffer outgrows the heap). Idle-trigger rewrites
  * are skipped (same-size kept list == unchanged — see emitMature),
  * which keeps timer-only wakeups cheap; the residual cost is the
  * genuine eviction path.
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

  class FunnelProcessor extends StatefulProcessor[Long, FunnelEvent, ViewSummary] {
    @transient private var views: ListState[(Long, Long)] = _
    @transient private var clicks: ListState[(Long, Long)] = _
    @transient private var purchases: ListState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val enc = Encoders.product[(Long, Long)]
      views = getHandle.getListState("views", enc, TTLConfig.NONE)
      clicks = getHandle.getListState("clicks", enc, TTLConfig.NONE)
      purchases = getHandle.getListState("purchases", enc, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[FunnelEvent],
        tv: TimerValues): Iterator[ViewSummary] = {
      rows.foreach { e =>
        val rec = (e.event_id, e.ts.getTime)
        e.event_type match {
          case "view" => views.appendValue(rec)
          case "click" => clicks.appendValue(rec)
          case "purchase" => purchases.appendValue(rec)
          case _ => ()
        }
      }
      emitMature(key, tv)
    }

    override def handleExpiredTimer(
        key: Long,
        tv: TimerValues,
        expired: ExpiredTimerInfo): Iterator[ViewSummary] =
      emitMature(key, tv)

    /** Same finalize/evict protocol as FunnelState.stepWith: emit views
      * whose horizon is behind the watermark, keep younger state, wake
      * at the earliest next obligation.
      */
    private def emitMature(key: Long, tv: TimerValues): Iterator[ViewSummary] = {
      val wm = tv.getCurrentWatermarkInMs()
      val vs = views.get().toSeq
      val cs = clicks.get().toSeq
      val ps = purchases.get().toSeq
      val (done, pending) = vs.partition { case (_, vts) => vts + FunnelState.HorizonMs < wm }
      // one match-ready sort per trigger (see FunnelState.MatchBuf — the
      // hot-key guard shared by both stateful funnel operators)
      lazy val buf = FunnelState.matchReady(Buf(vs, cs, ps))
      val out = done.sortBy(_._2).map { case (vid, vts) =>
        FunnelState.summarize(key, vid, vts, buf)
      }
      val keepC = cs.filter { case (_, cts) => cts + FunnelState.HorizonMs >= wm }
      val keepP = ps.filter { case (_, pts) => pts + FunnelState.HorizonMs >= wm }
      // the store rejects empty list writes — clear() is the empty form.
      // Rewrite a list ONLY when eviction/finalization changed it (the
      // horizon filters preserve elements, so same size == same list):
      // a ListState.put is a full O(state) rewrite through the store,
      // and each trigger runs emitMature TWICE for an active key (input
      // rows, then the wm+1 timer) — unconditionally rewriting made the
      // hot-key drain 3.1x the benign one (sfun probe, 73.5 s vs
      // 23.6 s); skip-if-unchanged restores the append-cheap contract
      // this operator exists for.
      def replace(s: ListState[(Long, Long)],
          kept: Seq[(Long, Long)], prevSize: Int): Unit =
        if (kept.size != prevSize) {
          if (kept.isEmpty) s.clear() else s.put(kept.toArray)
        }
      replace(views, pending, vs.size)
      replace(clicks, keepC, cs.size)
      replace(purchases, keepP, ps.size)
      if (pending.nonEmpty || keepC.nonEmpty || keepP.nonEmpty) {
        val next = (pending.map(_._2) ++ keepC.map(_._2) ++ keepP.map(_._2))
          .map(_ + FunnelState.HorizonMs).min
        getHandle.registerTimer(math.max(next, wm) + 1)
      }
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

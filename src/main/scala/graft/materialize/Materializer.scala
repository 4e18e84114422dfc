package graft.materialize

import java.sql.Timestamp

import graft.tables.{GraftTable, RangePrune}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.util.{DateTimeUtils, IntervalUtils}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Locality bound linking a view row's event time to the source facts
  * it derives from: every view row with `view.tsCol = T` is a function
  * ONLY of source facts whose `sourceTsCol` lies in [T − slack, T + slack].
  * An hourly tumbling aggregation has slack = 1 hour; a sessionized view
  * has slack = max session span. The bound is the CALLER'S assertion —
  * the materializer uses it to prune the source scan per pass, never to
  * change results (passes compute over a superset of the bound and
  * re-filter the view rows, so an over-wide slack only costs I/O).
  */
final case class FactBound(sourceTsCol: String, slack: String)

/** A materializable view: a deterministic transform of the source facts
  * with an event-time column (drives the watermark) and an identifier
  * key (drives the repair passes). With `factBound` set, the window-
  * bounded passes (lookback repair, append, stale repair) recompute the
  * view from a RANGE-PRUNED source read — footer-level file skipping
  * plus a pushed-down row filter — instead of aggregating the whole
  * table; that is the difference between O(affected window) and
  * O(table) per incremental run, and it is what makes the protocol
  * viable against a 100 TB fact table. Without it, passes share one
  * cached full-view computation per run (correct for any view, O(table)).
  */
final case class MatView(
    name: String,
    tsCol: String,
    keyCols: Seq[String],
    compute: DataFrame => DataFrame,
    factBound: Option[FactBound] = None,
    /** Fact columns that `compute` passes through UNCHANGED into
      * same-named view columns (typical grouping keys like user_id).
      * The dimension-repair pass may then push its changed-key
      * semi-join BELOW the aggregation — re-aggregating only the
      * changed keys' facts instead of the whole table, which is what
      * keeps M5 O(changed keys' history) at 100 TB. Opt-in because it
      * is the CALLER'S assertion: a view that derives or renames a key
      * (e.g. groups by UPPER(region)) must not list it here.
      */
    passthroughKeys: Seq[String] = Nil)

/** Incremental materializer — the engine's port of the reference's
  * 4-pass watermark protocol (scripts/materialize.sh:66-330):
  *
  *   pass 0  M1  first run: full CTAS materialization          (:84)
  *   pass 1  M4  lookback repair  — recompute [wm−N, wm] and
  *               replace it iff the counts drifted (late rows) (:123-173)
  *   pass 2  M5  dimension repair — rows whose dim key gained a
  *               new SCD2 version since wm: delete+re-insert   (:175-224)
  *   pass 3  M3  append           — view rows with ts > wm     (:226-241)
  *   pass 4  M6  stale-row repair — keys whose freshly computed
  *               row differs from the materialized one (late
  *               downstream funnel events): delete+re-insert   (:243-321)
  *   then    M2  advance the watermark to max(ts)              (:323-330)
  *
  * Scale shape: every pass is a bounded slice — lookback repair touches a
  * fixed window, dim repair only changed keys (anti-join MERGE, no
  * collect), append only ts > wm, stale repair only a detection window —
  * so per-run cost is O(new + repaired), never O(table). The watermark
  * table is the tiny keyed upsert table the reference uses
  * (materialization_watermarks.yml).
  */
final class Materializer(
    spark: SparkSession,
    source: GraftTable,
    view: MatView,
    mat: GraftTable,
    watermarks: GraftTable) {

  private def ts: Column = col(view.tsCol)

  private def timed[A](label: String)(body: => A): A =
    graft.Timing.timed(view.name, label)(body)

  /** The freshly computed view over ALL source facts. Cached for the
    * duration of one `run()` — the repair passes each slice it, and
    * recomputing the aggregation per pass would multiply the source
    * scans (the dominant cost at scale).
    */
  private var cachedView: Option[DataFrame] = None

  private def computeView(): DataFrame = {
    viewComputeCounter += 1
    view.compute(source.readLogical())
  }

  private def viewDf: DataFrame =
    cachedView.getOrElse(computeView())

  private def withCachedView[A](body: => A): A =
    if (view.factBound.isDefined) body // passes prune their own source reads
    else {
      val v = computeView().cache()
      cachedView = Some(v)
      try body
      finally {
        cachedView = None
        v.unpersist()
      }
    }

  /** The view restricted to rows with `tsCol ≥ loMicros`-ish: with a
    * [[FactBound]], computed from a source read pruned to
    * `sourceTs ≥ loMicros − slack` (footer file-skip + pushed-down row
    * filter — the aggregation shuffles only the window's facts); the
    * result is a SUPERSET of the ≥ loMicros view rows, so callers keep
    * their exact view-time filter on top. Without a bound, the shared
    * (cached) full view.
    */
  private def viewFrom(loMicros: Long, hiMicros: Long = Long.MaxValue): DataFrame =
    view.factBound match {
      case Some(fb) =>
        boundedComputeCounter += 1
        val slack = intervalCeilMicros(fb.slack)
        val lo = loMicros - slack
        val hi = if (hiMicros > Long.MaxValue - slack) Long.MaxValue else hiMicros + slack
        val loTs = to_timestamp(lit(DateTimeUtils.toJavaTimestamp(lo)))
        val rowBound = {
          val atLeast = col(fb.sourceTsCol) >= loTs
          if (hi == Long.MaxValue) atLeast
          else atLeast &&
            col(fb.sourceTsCol) <= to_timestamp(lit(DateTimeUtils.toJavaTimestamp(hi)))
        }
        // merge-on-read sources need every file of a key for latest-wins
        // resolution, which file pruning cannot guarantee — keep the
        // resolved logical read and bound ROWS only (the filter still
        // pushes below the aggregation, so the shuffle stays O(window);
        // only the scan is O(table) until the source is compacted)
        val pruned =
          if (source.defn.mergeOnRead)
            source.readLogical().filter(rowBound)
          else
            source.readRangeLogical(fb.sourceTsCol, lo, hi).filter(rowBound)
        view.compute(pruned)
      case None => viewDf
    }

  // ---- per-run instrumentation (read by MaterializeSpec/GRAFT_TIMING) ----

  private var viewComputeCounter = 0
  private var boundedComputeCounter = 0

  /** How many times the last [[run]] built the view plan over the full
    * source. The cached-view contract is EXACTLY ONE per run — a repair
    * pass quietly recomputing the aggregation multiplies source scans,
    * which is how a per-pass regression hides inside a two-pass bench
    * query. Pinned by MaterializeSpec.
    */
  @volatile var lastRunViewComputes: Int = -1

  /** Window-bounded view computations in the last [[run]] (FactBound
    * views only): each bounded pass computes its own pruned slice, so
    * lookback+append+stale = 3. Pinned with [[lastRunViewComputes]] by
    * MaterializeSpec — a bounded view doing FULL computes in a repair
    * run means source pruning silently stopped applying.
    */
  @volatile var lastRunBoundedComputes: Int = -1

  /** Spark jobs the last [[run]] launched (listener-counted; the bus is
    * async, so treat as a floor — in practice all jobs complete inside
    * run(), so their start events have long since posted). Job-count
    * inflation per pass is the scale killer for M4–M6 — every job is a
    * scheduler round-trip plus a plan/codegen pass — so MaterializeSpec
    * pins an upper bound.
    */
  @volatile var lastRunJobs: Int = -1

  // ---- M2: watermark bookkeeping ----

  def readWatermark(): Option[Timestamp] =
    readWatermarkRow().map(_._1)

  /** (watermark, source snapshot version at the last run) — the version
    * is what turns repair detection into an incremental FILE scan; None
    * (pre-upgrade rows) falls back to signature detection for one run.
    */
  private def readWatermarkRow(): Option[(Timestamp, Option[Long])] =
    watermarks.readLogical()
      .filter(col("view_name") === view.name)
      .collect().headOption.map { r =>
        val v = r.fieldIndex("source_version")
        (r.getAs[Timestamp]("watermark_ts"),
          if (r.isNullAt(v)) None else Some(r.getLong(v)))
      }

  private def advanceWatermark(srcVersion: Long): Unit = {
    // metadata-only when possible: max(ts) from the mat table's parquet
    // footer stats, never a table scan (falls back to one if stats are
    // unusable, e.g. ts is a partition column absent from data files)
    val mx: Option[Timestamp] = mat.columnMaxMicros(view.tsCol)
      .map(DateTimeUtils.toJavaTimestamp)
      .orElse {
        val r = mat.readLogical().agg(max(ts)).collect().head
        if (r.isNullAt(0)) None else Some(r.getAs[Timestamp](0))
      }
    mx.foreach { m =>
      import scala.jdk.CollectionConverters._
      val row = org.apache.spark.sql.Row(view.name, m, srcVersion)
      watermarks.upsert(spark.createDataFrame(Seq(row).asJava, watermarks.defn.schema))
    }
  }

  /** Upper bound on an interval string's length in µs (months counted
    * as 31 days) — used only to widen the file-pruning range, so an
    * over-estimate is safe and an under-estimate impossible.
    */
  private def intervalCeilMicros(interval: String): Long = {
    val iv = IntervalUtils.stringToInterval(UTF8String.fromString(interval))
    (iv.months.toLong * 31 + iv.days) * 86400000000L + iv.microseconds
  }

  /** `micros − interval` with CALENDAR month arithmetic — the exact
    * value `ts > wm - INTERVAL x` compares against in UTC. Candidate-day
    * classification must use THIS (an over-estimated ceil would assign a
    * day to the lookback pass whose row condition then excludes it, and
    * the stale pass would skip it too — unrepaired forever); the ceil
    * stays correct for file pruning only.
    */
  private def minusIntervalMicros(micros: Long, interval: String): Long = {
    val iv = IntervalUtils.stringToInterval(UTF8String.fromString(interval))
    DateTimeUtils.timestampAddInterval(
      micros, -iv.months, -iv.days, -iv.microseconds, java.time.ZoneOffset.UTC)
  }

  // ---- the passes ----

  /** M1 — full materialization (first run). */
  def fullMaterialize(): Unit = {
    val v = source.currentVersion.toLong
    mat.overwrite(viewDf)
    advanceWatermark(v)
  }

  // ---- incremental file-delta detection (Iceberg incremental-scan
  // analog): which source files arrived since the last run, and which
  // view DAYS can they have touched? ----

  /** Files the source gained since snapshot `sinceVersion`, IFF the
    * delta is purely appends. None ⇒ unknowable — the base snapshot was
    * expired (a changelog gap), a blind rewrite has no derivable change
    * set, an upsert shadows an OLD row whose day the new files do not
    * reveal (merge-on-read or change-tracked copy-on-write alike), or
    * the source is merge-on-read — and callers fall back to signature
    * detection, which is correct for any history. Some(Nil) ⇒ provably
    * no new facts (layout-only rewrites land here: compact/zorder
    * change no logical rows, so they no longer force the signature
    * path). Delta enumeration and gap semantics live in ONE place —
    * [[graft.tables.GraftTable.fileDeltasSince]], shared with
    * readChanges — so the two changelog consumers can never drift.
    */
  private def sourceAppendsSince(sinceVersion: Long): Option[Seq[String]] = {
    if (source.defn.mergeOnRead) return None
    if (sinceVersion > Int.MaxValue) return None
    source.fileDeltasSince(sinceVersion.toInt, source.currentVersion) match {
      case Left(_) => None
      // only pure appends are day-candidate-safe: an upsert or
      // change-tracked replace delta is key/row-shaped — the change can
      // move a key off a day while the stale day stays quiet, exactly
      // what the day-candidate logic cannot see. Layout-only commits
      // (compact/zorder) contribute empty deltas and are fine.
      case Right(deltas) if deltas.exists(d =>
          !Set("append", "compact", "zorder").contains(d._1.op)) => None
      case Right(deltas) => Some(deltas.flatMap(_._2).sorted)
    }
  }

  /** UTC days of view rows (tsCol ≤ the watermark day) that the newly
    * appended source files can have changed, via the FactBound: a fact
    * at ts touches view rows in [ts − slack, ts + slack], so its
    * candidate days are every day that range overlaps. One small job
    * over ONLY the new files — O(new data), independent of table size.
    * The result is a provable superset of the drifted days for an
    * append-only source, so rewriting exactly these days (and no
    * signature comparison at all) converges the table.
    */
  private def candidateDays(added: Seq[String], fb: FactBound,
      wm: Timestamp): Seq[java.sql.Date] = {
    if (added.isEmpty) return Nil
    val slackIv = expr(s"INTERVAL ${fb.slack}")
    val srcTs = col(fb.sourceTsCol)
    source.readFilesLogical(added)
      .filter(srcTs <= lit(wm) + slackIv)
      .select(explode(sequence(to_date(srcTs - slackIv), to_date(srcTs + slackIv)))
        .as("__day"))
      .filter(col("__day") <= to_date(lit(wm)))
      .distinct().collect().map(_.getDate(0)).toSeq
  }

  /** Side-tagged per-row hash stream: the building block of the multiset
    * comparisons below. Hashing over the SORTED column list keeps the
    * two sides' hashes comparable regardless of projection order.
    */
  private def sideHashed(df: DataFrame, side: Long,
      extra: Seq[(String, Column)] = Nil): DataFrame = {
    val h = xxhash64(df.columns.sorted.map(col): _*)
    df.select(extra.map { case (n, c) => c.as(n) } ++
      Seq(h.as("__h"), lit(side).as("__side")): _*)
  }

  /** Multiset equality of two same-schema frames in ONE job: union the
    * side-tagged per-row hashes (+1 / −1) and aggregate a signature —
    * count difference, XOR over BOTH sides (equal multisets XOR to the
    * same value, so the combined XOR is zero), and wraparound-free
    * decimal sum of side×hash. All three zero ⇔ equal up to 64-bit hash
    * collision (negligible for non-adversarial data). Partial
    * aggregation, single-row result — no shuffle of data rows, and one
    * scheduler round-trip where two per-side fingerprints would cost two.
    */
  private def multisetEqual(a: DataFrame, b: DataFrame): Boolean = {
    val r = sideHashed(a, 1L).unionByName(sideHashed(b, -1L))
      .agg(sum(col("__side")).as("n"), expr("bit_xor(__h)").as("x"),
        sum(col("__h").cast("decimal(38,0)") * col("__side")).as("s"))
      .collect().head
    // null signature ⇔ zero rows on both sides ⇔ equal
    r.isNullAt(0) ||
      (r.getLong(0) == 0L && r.getLong(1) == 0L && r.getDecimal(2).signum == 0)
  }

  /** UTC days of `view.tsCol` whose fresh vs materialized row multisets
    * differ — the same one-job signature as [[multisetEqual]], grouped
    * by day. Bounded output (one row per day in the compared window), so
    * the collect is driver-safe at any table size.
    */
  private def driftedDays(fresh: DataFrame, current: DataFrame): Seq[java.sql.Date] = {
    def sig(df: DataFrame, side: Long) =
      sideHashed(df, side, Seq("__day" -> to_date(ts)))
    sig(fresh, 1L).unionByName(sig(current, -1L))
      .groupBy(col("__day"))
      .agg(sum(col("__side")).as("n"), expr("bit_xor(__h)").as("x"),
        sum(col("__h").cast("decimal(38,0)") * col("__side")).as("s"))
      .filter(col("n") =!= 0 || col("x") =!= 0 || col("s") =!= 0)
      .select(col("__day"))
      .collect().map(_.getDate(0)).toSeq
  }

  /** M4 — recompute the trailing window and replace the DRIFTED DAYS.
    * Drift = ANY full-row difference between the fresh recompute and the
    * materialized slice, in either direction — a late event that changes
    * an aggregate value for an existing key counts, not just new/removed
    * keys. Mirrors the reference's skip logic (materialize.sh:131-135)
    * but at day granularity: detection is one side-tagged signature job
    * over the whole window, and only days whose signature differs are
    * rewritten — O(drifted days), not O(lookback window). Day is the
    * right grain because the mat tables partition by day, so a finer
    * row-level condition could not skip any more file IO.
    */
  def lookbackRepair(wm: Timestamp, lookback: String,
      candidates: Option[Seq[java.sql.Date]] = None): Unit = {
    val windowCond = ts > to_timestamp(lit(wm)) - expr(s"INTERVAL $lookback") && ts <= lit(wm)
    val wmMicros = DateTimeUtils.fromJavaTimestamp(wm)
    val loMicros = wmMicros - intervalCeilMicros(lookback)
    candidates match {
      case Some(days) =>
        // file-delta path: the days are a provable superset of the
        // drifted days, so rewrite exactly them — no window recompute,
        // no signature scan. An empty set means the window provably has
        // no late data and the pass costs zero jobs.
        if (days.nonEmpty)
          timed("lookback/candidateRewrite")(rewriteDays(days, windowCond, wmMicros))
      case None =>
        // signature path (no usable file history): recompute the whole
        // window, compare per-day signatures, rewrite the drifted days.
        // Persisted because the signature AND a drift rewrite both
        // consume the slice, and each lazy re-evaluation would re-run
        // the bounded source aggregation
        val fresh = viewFrom(loMicros).filter(windowCond).persist()
        try {
          // file-pruned read: the signature and any rewrite only ever
          // touch files overlapping the lookback window
          val current = mat.readRangeLogical(view.tsCol, loMicros, wmMicros).filter(windowCond)
          val days = timed("lookback/driftCheck")(driftedDays(fresh, current))
          if (days.nonEmpty)
            timed("lookback/replaceWhere")(
              rewriteDays(days, windowCond, wmMicros, freshSlice = Some(fresh)))
        } finally fresh.unpersist()
    }
  }

  /** Replace exactly `days` of the view with fresh rows matching
    * `rowCond` — from `freshSlice` when the caller already holds the
    * window's recompute (the signature path persists it), else from a
    * bounded source read clipped to the days ± slack. The prune range
    * is the tightest single range enclosing the days: a clean day file
    * BETWEEN two candidate days is rewritten unchanged (extra IO, never
    * wrong) — late data clusters, so the range is tight in practice.
    */
  private def rewriteDays(days: Seq[java.sql.Date], rowCond: Column,
      hiClipMicros: Long, freshSlice: Option[DataFrame] = None): Unit = {
    val dayNums = days.map(DateTimeUtils.fromJavaDate)
    val loD = dayNums.min.toLong * 86400000000L
    val hiD = math.min(hiClipMicros, (dayNums.max.toLong + 1L) * 86400000000L - 1L)
    val dayCond = rowCond && to_date(ts).isin(days: _*)
    val fresh = freshSlice.getOrElse(viewFrom(loD, hiD)).filter(dayCond)
    mat.replaceWhere(dayCond, fresh, Some(RangePrune(view.tsCol, loD, hiD)))
  }

  /** M5 — re-enrich rows whose dimension key gained a new version after
    * the watermark. `changedKeys` = dim rows with valid_from > wm,
    * projected to the fact FK; deletion is a distributed anti-join.
    * Restricted to `ts <= wm`: rows past the watermark belong to the
    * append pass, which runs after this one (re-inserting them here
    * would double-count them).
    */
  def dimensionRepair(wm: Timestamp, changedKeys: DataFrame): Unit = {
    val fkCols = changedKeys.columns.toSeq
    val keys = changedKeys.distinct().persist()
    try {
      // one count on the persisted key set decides broadcast vs shuffle
      // for BOTH joins (the re-enrich semi-join here and replaceKeys'
      // delete anti-join) — bounded key sets never shuffle fact rows
      val nKeys = keys.count()
      if (nKeys > 0) {
        val hinted =
          if (nKeys <= GraftTable.BroadcastKeyLimit) broadcast(keys) else keys
        // when the repair keys pass through `compute` unchanged, filter
        // the FACTS to the changed keys before aggregating — the repair
        // then recomputes O(changed keys' history), not the whole view.
        // Otherwise the exact view-level semi-join below does all the
        // work against the full (cached or recomputed) view.
        val base =
          if (fkCols.nonEmpty && fkCols.forall(view.passthroughKeys.contains)) {
            boundedComputeCounter += 1
            view.compute(source.readLogical().join(hinted, fkCols, "left_semi"))
          } else viewDf
        val fresh = base.filter(ts <= lit(wm)).join(hinted, fkCols, "left_semi")
        mat.replaceKeys(keys, fkCols, fresh, knownKeyCount = Some(nKeys))
      }
    } finally keys.unpersist()
  }

  /** M3 — land view rows strictly after the watermark, as a REPLACE of
    * the `(wm, ∞)` range rather than a bare append: idempotent under a
    * crash between this commit and the watermark advance (the re-run
    * deletes the previously landed > wm rows before re-inserting them —
    * a bare append would double-count them, and the file-delta stale
    * pass, unlike the signature one, never compares above-watermark
    * rows, so nothing downstream would heal the duplicates). On a clean
    * run no live file overlaps the range and this degrades to a pure
    * append of the fresh slice.
    */
  def appendNew(wm: Timestamp): Unit = {
    val wmMicros = DateTimeUtils.fromJavaTimestamp(wm)
    mat.replaceWhere(ts > lit(wm), viewFrom(wmMicros).filter(ts > lit(wm)),
      Some(RangePrune(view.tsCol, wmMicros + 1L, Long.MaxValue)))
  }

  /** M6 — stale-row repair: inside the detection window, any key whose
    * freshly computed row differs from the materialized row (a late
    * downstream event flipped a funnel flag) is deleted and re-inserted.
    * The diff is symmetric: keys that changed or appeared come from
    * `fresh \ current`, keys whose materialized row is no longer
    * derivable at all (a phantom — e.g. its source facts were repaired
    * away) come from `current \ fresh`. A phantom key has no replacement
    * row, so the delete side of [[GraftTable.replaceKeys]] removes it —
    * one-directional detection would leave it in place forever, every
    * later run re-flagging the same fingerprint drift without converging.
    */
  def staleRepair(wm: Timestamp, detectionWindow: String,
      candidates: Option[Seq[java.sql.Date]] = None): Unit = {
    val cond = ts > to_timestamp(lit(wm)) - expr(s"INTERVAL $detectionWindow")
    val loMicros = DateTimeUtils.fromJavaTimestamp(wm) - intervalCeilMicros(detectionWindow)
    candidates match {
      case Some(days) =>
        // file-delta path: rewrite exactly the candidate days (already
        // clipped to beyond-lookback ∩ detection window by run()). Rows
        // past the watermark belong to the append pass that just ran.
        if (days.nonEmpty)
          timed("stale/candidateRewrite")(rewriteDays(days,
            cond && ts <= lit(wm), DateTimeUtils.fromJavaTimestamp(wm)))
      case None =>
        // signature path: persisted because the signature, the
        // symmetric diff, and the replacement semi-join all consume
        // `fresh` — three bounded source aggregations without the
        // persist, one with it
        val fresh = viewFrom(loMicros).filter(cond).persist()
        try staleRepairOn(wm, loMicros, cond, fresh)
        finally fresh.unpersist()
    }
  }

  private def staleRepairOn(wm: Timestamp, loMicros: Long,
      cond: Column, fresh: DataFrame): Unit = {
    val current = mat.readRangeLogical(view.tsCol, loMicros, Long.MaxValue).filter(cond)
    // signature fast path: a clean detection window (the common case for
    // steady-state runs) costs one both-sides scan, never a row shuffle
    if (timed("stale/signature")(multisetEqual(fresh, current))) return
    // symmetric multiset diff in ONE shuffle: tag each side ±1, group by
    // the full row — any row whose per-side counts differ marks its key
    // stale. Two exceptAll calls would shuffle both sides twice for the
    // same answer. Fingerprints differ ⇒ the diff is non-empty, so no
    // emptiness pre-check; persisted because both the replacement
    // semi-join and replaceKeys' anti-join consume it.
    val rowCols = fresh.columns.map(col)
    val staleKeys = fresh.withColumn("__side", lit(1L))
      .unionByName(current.withColumn("__side", lit(-1L)))
      .groupBy(rowCols: _*)
      .agg(sum(col("__side")).as("__d"))
      .filter(col("__d") =!= 0)
      .select(view.keyCols.map(col): _*).distinct()
      .persist()
    try {
      val nStale = staleKeys.count()
      val hinted =
        if (nStale <= GraftTable.BroadcastKeyLimit) broadcast(staleKeys)
        else staleKeys
      val replacement = fresh.join(hinted, view.keyCols, "left_semi")
      // file pruning is sound only when the key tuple pins the row's
      // timestamp — then a stale key can only match rows inside the
      // detection window the key itself came from
      val prune =
        if (view.keyCols.contains(view.tsCol))
          Some(RangePrune(view.tsCol, loMicros, Long.MaxValue))
        else None
      timed("stale/replaceKeys")(
        mat.replaceKeys(staleKeys, view.keyCols, replacement, prune,
          knownKeyCount = Some(nStale)))
    } finally staleKeys.unpersist()
  }

  /** The full protocol: CTAS on first run, else repair+append passes,
    * then advance the watermark.
    */
  def run(
      lookback: String = "48 hours",
      changedDimKeys: Option[DataFrame] = None,
      staleDetectionWindow: Option[String] = None): Unit = {
    viewComputeCounter = 0
    boundedComputeCounter = 0
    val jobCounter = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          job: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCounter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try readWatermarkRow() match {
      case None => timed("fullMaterialize")(fullMaterialize())
      case Some((wm, lastVersion)) => withCachedView {
        val srcVersion = source.currentVersion.toLong
        val wmMicros = DateTimeUtils.fromJavaTimestamp(wm)
        // file-delta candidates: Some(days) = exactly the view days the
        // newly appended source files can have touched (repair passes
        // rewrite those and skip all detection scans); None = no usable
        // file history → signature detection; Some(Nil) = provably no
        // new facts anywhere.
        val addedFiles: Option[Seq[String]] =
          for {
            _ <- view.factBound
            v0 <- lastVersion
            added <- sourceAppendsSince(v0)
          } yield added
        // "no new facts" must come from the FILE delta, not the candidate
        // days: appends entirely past the watermark yield zero candidate
        // repair days but absolutely require the append pass
        val noNewFacts = addedFiles.exists(_.isEmpty)
        val candidates: Option[Seq[java.sql.Date]] =
          addedFiles.map(a =>
            timed("candidateScan")(candidateDays(a, view.factBound.get, wm)))
        if (noNewFacts && changedDimKeys.isEmpty) {
          // true no-op: no new source facts, no dim change — zero jobs,
          // zero commits (the watermark and version are unchanged too)
        } else {
          def dayLo(d: java.sql.Date) = DateTimeUtils.fromJavaDate(d).toLong * 86400000000L
          def dayHi(d: java.sql.Date) = dayLo(d) + 86400000000L - 1L
          // CALENDAR boundaries — must match the passes' row conditions
          // exactly, or boundary days fall between the two passes
          val lbLo = minusIntervalMicros(wmMicros, lookback)
          // a day straddling the lookback boundary goes to ONE pass:
          // stale when it runs (its row condition reaches through wm, so
          // one rewrite covers both sides of the boundary), else lookback
          // (in-window rows only — beyond-lookback drift without a stale
          // window is out of remit, matching the signature-path contract)
          val straddleToStale = staleDetectionWindow.isDefined
          val lbDays = candidates.map(_.filter(d =>
            dayHi(d) > lbLo && dayLo(d) <= wmMicros &&
              !(straddleToStale && dayLo(d) < lbLo)))
          timed("lookbackRepair")(lookbackRepair(wm, lookback, lbDays))
          changedDimKeys.foreach(k => timed("dimensionRepair")(dimensionRepair(wm, k)))
          if (!noNewFacts) timed("appendNew")(appendNew(wm))
          staleDetectionWindow.foreach { w =>
            // beyond-lookback days (including the boundary straddler),
            // clipped to the detection window — the caller's bound on
            // how far back stale repair may reach
            val detLo = minusIntervalMicros(wmMicros, w)
            val stDays = candidates.map(_.filter(d => dayHi(d) > detLo && dayLo(d) < lbLo))
            timed("staleRepair")(staleRepair(wm, w, stDays))
          }
          timed("advanceWatermark")(advanceWatermark(srcVersion))
        }
      }
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      lastRunJobs = jobCounter.get()
      lastRunViewComputes = viewComputeCounter
      lastRunBoundedComputes = boundedComputeCounter
      if (sys.env.contains("GRAFT_TIMING"))
        println(s"TIMING ${view.name}/run jobs=$lastRunJobs " +
          s"viewComputes=$lastRunViewComputes boundedComputes=$lastRunBoundedComputes")
    }
  }
}

object Materializer {
  import org.apache.spark.sql.types._

  /** Schema of the watermark bookkeeping table (M2). `source_version`
    * is the source table's snapshot version at the last run — the
    * anchor for the file-delta (incremental-scan) repair detection.
    */
  val watermarkSchema: StructType = StructType(Seq(
    StructField("view_name", StringType),
    StructField("watermark_ts", TimestampType),
    StructField("source_version", LongType)))

  /** Merge-on-read: advancing a watermark writes ONE row and a commit —
    * no read, anti-join, or rewrite of the bookkeeping table inside the
    * materializer's hot loop. Reads merge a handful of one-row files
    * until compaction.
    */
  def watermarkTableDef: graft.tables.TableDef =
    graft.tables.TableDef("materialization_watermarks", watermarkSchema,
      keys = Seq("view_name"), mergeOnRead = true)
}

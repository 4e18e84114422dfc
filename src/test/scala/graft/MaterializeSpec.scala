package graft

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp
import java.util.Comparator

import graft.materialize.{FactBound, MatView, Materializer}
import graft.tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The materializer's convergence property: after any sequence of
  * batches — in-order, late-within-lookback, late-beyond-lookback, and
  * dimension changes — the incremental mat table must equal a full
  * recompute of the view over all facts (materialize.sh's contract).
  */
class MaterializeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def wh(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_mat_wh", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def ev(id: Long, day: Int, hour: Int, user: Long, typ: String, v: Double) =
    (id, Timestamp.valueOf(f"2024-02-$day%02d $hour%02d:00:00"), user, typ, v)

  private def toDf(rows: Seq[(Long, Timestamp, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  private def assertConverged(mat: GraftTable, full: DataFrame, hint: String): Unit = {
    val got = mat.readLogical()
    val a = got.exceptAll(full).count(); val b = full.exceptAll(got).count()
    assert(a == 0 && b == 0, s"$hint: $a rows only in mat, $b only in full recompute")
  }

  test("incremental == full after in-order, late-within-lookback, and stale batches") {
    val root = wh("conv")
    val matSchema = StructType(Seq(
      StructField("window_start", TimestampType),
      StructField("event_type", StringType),
      StructField("n", LongType),
      StructField("total_value", DoubleType)))
    val view = MatView("hourly", "window_start", Seq("window_start", "event_type"),
      facts => facts
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("total_value")))
    val cat = new TableCatalog(spark, root, Seq(
      TableDef("src", eventsSchema),
      TableDef("mat", matSchema, keys = Seq("window_start", "event_type")),
      Materializer.watermarkTableDef))
    val src = cat.table("src")
    val mat = cat.table("mat")
    val mzr = new Materializer(spark, src, view, mat, cat.table("materialization_watermarks"))
    def full = view.compute(src.readLogical())

    // batch 1: days 1–2 in order → full CTAS
    src.append(toDf((1L to 40L).map(i =>
      ev(i, 1 + (i % 2).toInt, (i % 24).toInt, i % 5, if (i % 3 == 0) "click" else "view", i.toDouble))))
    mzr.run()
    assertConverged(mat, full, "after full materialization")

    // batch 2: day 3 tail + stragglers inside day 2 (within 48 h lookback)
    src.append(toDf(
      (41L to 60L).map(i => ev(i, 3, (i % 24).toInt, i % 5, "view", i.toDouble)) ++
      Seq(ev(61, 2, 5, 1, "click", 7.5), ev(62, 2, 23, 2, "view", 1.0))))
    mzr.run(lookback = "48 hours")
    assertConverged(mat, full, "after late-within-lookback batch")

    // batch 3: day 4 tail + a straggler in day 1 — BEYOND the 48 h
    // lookback from the new watermark, so only the stale-repair pass
    // (M6) with a wide detection window can converge it
    src.append(toDf(
      (70L to 80L).map(i => ev(i, 4, (i % 24).toInt, i % 5, "view", i.toDouble)) ++
      Seq(ev(81, 1, 2, 3, "click", 9.0))))
    mzr.run(lookback = "48 hours")
    val gotBefore = mat.readLogical()
    assert(gotBefore.exceptAll(full).count() + full.exceptAll(gotBefore).count() > 0,
      "the beyond-lookback straggler must NOT yet be absorbed (else the test is vacuous)")
    mzr.run(lookback = "48 hours", staleDetectionWindow = Some("30 days"))
    assertConverged(mat, full, "after stale-repair pass")
  }

  test("lookback repair detects value-only drift (same keys, changed aggregate)") {
    val root = wh("valdrift")
    val matSchema = StructType(Seq(
      StructField("window_start", TimestampType),
      StructField("event_type", StringType),
      StructField("n", LongType),
      StructField("total_value", DoubleType)))
    val view = MatView("hourly", "window_start", Seq("window_start", "event_type"),
      facts => facts
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("total_value")))
    val cat = new TableCatalog(spark, root, Seq(
      TableDef("src", eventsSchema),
      TableDef("mat", matSchema, keys = Seq("window_start", "event_type")),
      Materializer.watermarkTableDef))
    val src = cat.table("src")
    val mat = cat.table("mat")
    val mzr = new Materializer(spark, src, view, mat, cat.table("materialization_watermarks"))

    // one event per (hour, type) key on day 1
    src.append(toDf(Seq(ev(1, 1, 10, 1, "view", 1.0), ev(2, 1, 11, 2, "click", 2.0))))
    mzr.run()

    // the straggler lands in an EXISTING (hour, type) key — no new key
    // appears, only n/total_value change; a key-presence drift check
    // would skip the repair and leave n=1 materialized
    src.append(toDf(Seq(ev(3, 1, 10, 3, "view", 5.0))))
    mzr.run(lookback = "48 hours")
    assertConverged(mat, view.compute(src.readLogical()), "after value-only drift")
    val row = mat.readLogical()
      .filter(col("event_type") === "view").select("n", "total_value").collect().head
    assert(row.getLong(0) == 2 && row.getDouble(1) == 6.0)
  }

  // both detection regimes: fb=None → cached-view + signature detection;
  // fb=Some → bounded computes + file-delta candidate-day repairs
  for (seed <- Seq(7L, 99L);
       fb <- Seq(None, Some(FactBound("ts", "1 hour")))) {
    test(s"randomized arrival order converges to the full recompute " +
        s"(seed $seed, factBound=${fb.isDefined})") {
      val rnd = new scala.util.Random(seed)
      val root = wh(s"rand$seed${if (fb.isDefined) "fb" else ""}")
      val matSchema = StructType(Seq(
        StructField("window_start", TimestampType),
        StructField("event_type", StringType),
        StructField("n", LongType),
        StructField("total_value", DoubleType)))
      val view = MatView("hourly", "window_start", Seq("window_start", "event_type"),
        facts => facts
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
          .select(col("window.start").as("window_start"),
            col("event_type"), col("n"), col("total_value")),
        factBound = fb)
      val cat = new TableCatalog(spark, root, Seq(
        TableDef("src", eventsSchema),
        TableDef("mat", matSchema, keys = Seq("window_start", "event_type")),
        Materializer.watermarkTableDef))
      val src = cat.table("src")
      val mat = cat.table("mat")
      val mzr = new Materializer(spark, src, view, mat, cat.table("materialization_watermarks"))

      // random facts over 8 days; arrival batch = rough time order with
      // random stragglers landing 1–2 batches late
      val facts = (1L to 150L).map { i =>
        ev(i, 1 + rnd.nextInt(8), rnd.nextInt(24), rnd.nextInt(5).toLong,
          if (rnd.nextBoolean()) "view" else "click", rnd.nextInt(100) / 10.0)
      }
      val nBatches = 4
      val byTime = facts.sortBy(_._2.getTime).zipWithIndex.map { case (f, idx) =>
        val natural = idx * nBatches / facts.size
        val batch = math.min(nBatches - 1, natural + (if (rnd.nextInt(10) == 0) 1 + rnd.nextInt(2) else 0))
        (f, batch)
      }
      for (b <- 0 until nBatches) {
        val rows = byTime.filter(_._2 == b).map(_._1)
        if (rows.nonEmpty) src.append(toDf(rows))
        // wide lookback + stale window guarantee convergence no matter
        // how late a straggler lands
        mzr.run(lookback = "72 hours", staleDetectionWindow = Some("30 days"))
      }
      assertConverged(mat, view.compute(src.readLogical()), s"seed $seed final")
    }
  }

  test("repair on a day-partitioned mat table carries old-day files by name") {
    val root = wh("prune")
    val matSchema = StructType(Seq(
      StructField("window_start", TimestampType),
      StructField("event_type", StringType),
      StructField("n", LongType),
      StructField("total_value", DoubleType)))
    val view = MatView("hourly", "window_start", Seq("window_start", "event_type"),
      facts => facts
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("total_value")))
    val cat = new TableCatalog(spark, root, Seq(
      TableDef("src", eventsSchema),
      TableDef("mat", matSchema, partitions = Seq(DayTransform("window_start")),
        keys = Seq("window_start", "event_type")),
      Materializer.watermarkTableDef))
    val src = cat.table("src")
    val mat = cat.table("mat")
    val mzr = new Materializer(spark, src, view, mat, cat.table("materialization_watermarks"))

    // days 1 and 20 → first run materializes both as separate day files
    src.append(toDf(Seq(
      ev(1, 1, 10, 1, "view", 1.0), ev(2, 1, 11, 2, "click", 2.0),
      ev(3, 20, 9, 3, "view", 3.0))))
    mzr.run()
    val day1Files = mat.commits.last.files.filter(_.contains("2024-02-01")).toSet
    assert(day1Files.nonEmpty, "expected day-partitioned files for 2024-02-01")

    // straggler inside day 20 (within lookback) + day 21 tail: the
    // lookback repair must rewrite only day-20 files; day-1 files are
    // provably outside [wm−48h, wm] by footer stats and survive by name
    src.append(toDf(Seq(ev(4, 20, 9, 4, "view", 4.0), ev(5, 21, 8, 5, "view", 5.0))))
    mzr.run(lookback = "48 hours")
    val live = mat.commits.last.files.toSet
    assert(day1Files.subsetOf(live),
      "day-1 files must survive the day-20 repair commit untouched")
    assertConverged(mat, view.compute(src.readLogical()), "after pruned repair")
  }

  test("lookback repair rewrites only the DRIFTED days inside the window") {
    val root = wh("daygrain")
    val matSchema = StructType(Seq(
      StructField("window_start", TimestampType),
      StructField("event_type", StringType),
      StructField("n", LongType),
      StructField("total_value", DoubleType)))
    val view = MatView("hourly", "window_start", Seq("window_start", "event_type"),
      facts => facts
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("total_value")))
    val cat = new TableCatalog(spark, root, Seq(
      TableDef("src", eventsSchema),
      TableDef("mat", matSchema, partitions = Seq(DayTransform("window_start")),
        keys = Seq("window_start", "event_type")),
      Materializer.watermarkTableDef))
    val src = cat.table("src")
    val mat = cat.table("mat")
    val mzr = new Materializer(spark, src, view, mat, cat.table("materialization_watermarks"))

    // three days, all INSIDE the coming 10-day lookback window
    src.append(toDf(Seq(
      ev(1, 10, 10, 1, "view", 1.0), ev(2, 12, 11, 2, "click", 2.0),
      ev(3, 14, 9, 3, "view", 3.0))))
    mzr.run()
    val cleanDayFiles = mat.commits.last.files
      .filter(f => f.contains("2024-02-10") || f.contains("2024-02-14")).toSet
    assert(cleanDayFiles.nonEmpty, "expected day files for 2024-02-10/14")

    // straggler lands in day 12 ONLY; days 10 and 14 stay clean but are
    // within the lookback window — the whole-window rewrite would churn
    // them, the day-granular repair must carry them by name
    src.append(toDf(Seq(ev(4, 12, 11, 4, "click", 4.0), ev(5, 15, 8, 5, "view", 5.0))))
    mzr.run(lookback = "10 days")
    val live = mat.commits.last.files.toSet
    assert(cleanDayFiles.subsetOf(live),
      "clean in-window day files must survive a one-day drift repair untouched")
    assertConverged(mat, view.compute(src.readLogical()), "after day-granular repair")
  }

  test("stale repair deletes phantom rows no longer derivable from the source") {
    val root = wh("phantom")
    val matSchema = StructType(Seq(
      StructField("window_start", TimestampType),
      StructField("event_type", StringType),
      StructField("n", LongType),
      StructField("total_value", DoubleType)))
    val view = MatView("hourly", "window_start", Seq("window_start", "event_type"),
      facts => facts
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("total_value")))
    val cat = new TableCatalog(spark, root, Seq(
      TableDef("src", eventsSchema),
      TableDef("mat", matSchema, keys = Seq("window_start", "event_type")),
      Materializer.watermarkTableDef))
    val src = cat.table("src")
    val mat = cat.table("mat")
    val mzr = new Materializer(spark, src, view, mat, cat.table("materialization_watermarks"))
    def full = view.compute(src.readLogical())

    src.append(toDf((1L to 20L).map(i =>
      ev(i, 1, (i % 24).toInt, i % 5, if (i % 3 == 0) "click" else "view", i.toDouble))))
    mzr.run()

    // inject a phantom: a materialized key with NO source facts behind it
    // (the analog of source rows repaired away after materialization) —
    // `fresh \ current` is empty for it, only `current \ fresh` sees it.
    // Placed BEYOND the 48 h lookback so only the stale pass can see it
    // (the lookback pass's replaceWhere would absorb a nearer one).
    import spark.implicits._
    mat.append(Seq((Timestamp.valueOf("2024-01-20 12:00:00"), "purchase", 99L, 9.9))
      .toDF(matSchema.fieldNames: _*))
    val before = mat.readLogical()
    assert(before.exceptAll(full).count() == 1, "phantom must be visible pre-repair")

    mzr.run(staleDetectionWindow = Some("30 days"))
    assertConverged(mat, full, "after phantom stale-repair")
    // and the fix must CONVERGE: a second run finds no drift (no commit)
    val v = mat.currentVersion
    mzr.run(staleDetectionWindow = Some("30 days"))
    assert(mat.currentVersion == v, "second stale-repair run must be a no-op")
  }

  test("dimension repair re-enriches rows whose dim key changed (M5)") {
    val root = wh("dim")
    // mutable dim the view closure reads — simulates an SCD2 dim getting
    // a new current version between materializer runs
    var dim: DataFrame = null
    def setDim(tiers: Map[Long, String]): Unit = {
      import spark.implicits._
      dim = tiers.toSeq.toDF("user_id", "tier")
    }
    setDim((0L to 4L).map(u => u -> "basic").toMap)

    val matSchema = StructType(Seq(
      StructField("day", TimestampType),
      StructField("user_id", LongType),
      StructField("tier", StringType),
      StructField("n", LongType)))
    val view = MatView("daily_user", "day", Seq("day", "user_id"),
      facts => facts
        .join(broadcast(dim), Seq("user_id"))
        .groupBy(date_trunc("day", col("ts")).as("day"), col("user_id"), col("tier"))
        .agg(count(lit(1)).as("n")),
      // user_id passes through → the repair aggregates only changed users
      passthroughKeys = Seq("user_id"))
    val cat = new TableCatalog(spark, root, Seq(
      TableDef("src", eventsSchema),
      TableDef("mat", matSchema, keys = Seq("day", "user_id")),
      Materializer.watermarkTableDef))
    val src = cat.table("src")
    val mat = cat.table("mat")
    val mzr = new Materializer(spark, src, view, mat, cat.table("materialization_watermarks"))

    src.append(toDf((1L to 30L).map(i =>
      ev(i, 1 + (i % 3).toInt, (i % 24).toInt, i % 5, "view", 1.0))))
    mzr.run()

    // dim change: users 0 and 2 become premium; later events arrive too
    setDim(Map(0L -> "premium", 2L -> "premium", 1L -> "basic", 3L -> "basic", 4L -> "basic"))
    src.append(toDf((31L to 40L).map(i => ev(i, 5, (i % 24).toInt, i % 5, "view", 1.0))))
    import spark.implicits._
    val changedKeys = Seq(0L, 2L).toDF("user_id")
    mzr.run(changedDimKeys = Some(changedKeys))
    assertConverged(mat, view.compute(src.readLogical()), "after dimension repair")
    assert(mat.readLogical()
      .filter(col("user_id").isin(0L, 2L) && col("tier") =!= "premium").count() == 0)
    // the passthrough-key pushdown: the dim repair itself must have
    // aggregated only the changed keys' facts (one BOUNDED compute);
    // the single full compute is the run's shared cached view for the
    // lookback/append passes (this view has no FactBound)
    assert(mzr.lastRunBoundedComputes == 1,
      s"dim repair did ${mzr.lastRunBoundedComputes} bounded computes — passthrough pushdown lost")
    assert(mzr.lastRunViewComputes == 1,
      s"expected exactly the shared cached view compute, got ${mzr.lastRunViewComputes}")
  }

  test("a FactBound view repairs from pruned source reads, never a full recompute") {
    val root = wh("bound")
    val matSchema = StructType(Seq(
      StructField("window_start", TimestampType),
      StructField("event_type", StringType),
      StructField("n", LongType),
      StructField("total_value", DoubleType)))
    val view = MatView("hourly", "window_start", Seq("window_start", "event_type"),
      facts => facts
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("total_value")),
      factBound = Some(FactBound("ts", "1 hour")))
    val cat = new TableCatalog(spark, root, Seq(
      TableDef("src", eventsSchema),
      TableDef("mat", matSchema, keys = Seq("window_start", "event_type")),
      Materializer.watermarkTableDef))
    val src = cat.table("src")
    val mzr = new Materializer(spark, src, view, cat.table("mat"),
      cat.table("materialization_watermarks"))

    src.append(toDf((1L to 60L).map(i =>
      ev(i, 1 + (i % 4).toInt, (i % 24).toInt, i % 5,
        if (i % 3 == 0) "click" else "view", i.toDouble))))
    mzr.run()
    // tail + a straggler beyond the lookback: exercises lookback, append
    // AND stale repair, all three as bounded computes
    src.append(toDf(
      (61L to 70L).map(i => ev(i, 6, (i % 24).toInt, i % 5, "view", i.toDouble)) ++
        Seq(ev(71, 1, 3, 2, "click", 4.0))))
    mzr.run(lookback = "24 hours", staleDetectionWindow = Some("30 days"))
    assert(mzr.lastRunViewComputes == 0,
      s"bounded repair run did ${mzr.lastRunViewComputes} FULL view computes — source pruning lost")
    // file-delta candidates: the appended files touch no in-lookback day,
    // so the lookback pass computes NOTHING; append (1) and the stale
    // candidate-day rewrite (1) are the only bounded computes
    assert(mzr.lastRunBoundedComputes == 2,
      s"expected 2 bounded computes (append + stale candidate rewrite), got ${mzr.lastRunBoundedComputes}")
    assertConverged(cat.table("mat"), view.compute(src.readLogical()), "bounded convergence")

    // a run with NO new source data and no dim change is a true no-op:
    // zero view computes, zero commits on the mat table
    val matCommitsBefore = cat.table("mat").commits.size
    mzr.run(lookback = "24 hours", staleDetectionWindow = Some("30 days"))
    assert(mzr.lastRunViewComputes == 0 && mzr.lastRunBoundedComputes == 0,
      s"no-op run computed: full=${mzr.lastRunViewComputes} bounded=${mzr.lastRunBoundedComputes}")
    assert(cat.table("mat").commits.size == matCommitsBefore,
      "no-op run must not commit to the mat table")
  }

  test("an append entirely past the watermark still lands via the append pass") {
    // regression pin: zero candidate REPAIR days (nothing late) must not
    // be read as "no new facts" — that skipped the append pass
    val root = wh("tailonly")
    val matSchema = StructType(Seq(
      StructField("window_start", TimestampType),
      StructField("event_type", StringType),
      StructField("n", LongType),
      StructField("total_value", DoubleType)))
    val view = MatView("hourly", "window_start", Seq("window_start", "event_type"),
      facts => facts
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("total_value")),
      factBound = Some(FactBound("ts", "1 hour")))
    val cat = new TableCatalog(spark, root, Seq(
      TableDef("src", eventsSchema),
      TableDef("mat", matSchema, keys = Seq("window_start", "event_type")),
      Materializer.watermarkTableDef))
    val src = cat.table("src")
    val mzr = new Materializer(spark, src, view, cat.table("mat"),
      cat.table("materialization_watermarks"))

    src.append(toDf(Seq(ev(1, 1, 10, 1, "view", 1.0), ev(2, 2, 11, 2, "click", 2.0))))
    mzr.run()
    // tail-only batch: strictly after the watermark, hours past the slack
    src.append(toDf(Seq(ev(3, 5, 9, 3, "view", 3.0), ev(4, 6, 14, 4, "click", 4.0))))
    mzr.run(lookback = "48 hours", staleDetectionWindow = Some("30 days"))
    assertConverged(cat.table("mat"), view.compute(src.readLogical()), "tail-only append")
  }

  test("a crash between the append pass and the watermark advance cannot double-count") {
    // regression pin: appendNew is a REPLACE of (wm, inf), so re-running
    // the protocol after a partial run that already landed the tail
    // converges instead of appending the tail twice
    val root = wh("crashappend")
    val matSchema = StructType(Seq(
      StructField("window_start", TimestampType),
      StructField("event_type", StringType),
      StructField("n", LongType),
      StructField("total_value", DoubleType)))
    val view = MatView("hourly", "window_start", Seq("window_start", "event_type"),
      facts => facts
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("total_value")),
      factBound = Some(FactBound("ts", "1 hour")))
    val cat = new TableCatalog(spark, root, Seq(
      TableDef("src", eventsSchema),
      TableDef("mat", matSchema, keys = Seq("window_start", "event_type")),
      Materializer.watermarkTableDef))
    val src = cat.table("src")
    val mzr = new Materializer(spark, src, view, cat.table("mat"),
      cat.table("materialization_watermarks"))

    src.append(toDf(Seq(ev(1, 1, 10, 1, "view", 1.0), ev(2, 2, 11, 2, "click", 2.0))))
    mzr.run()
    src.append(toDf(Seq(ev(3, 4, 9, 3, "view", 3.0))))
    // the "crashed" partial run: append committed, watermark NOT advanced
    mzr.appendNew(mzr.readWatermark().get)
    // the retry replays the whole protocol from the stale watermark
    mzr.run(lookback = "48 hours", staleDetectionWindow = Some("30 days"))
    assertConverged(cat.table("mat"), view.compute(src.readLogical()),
      "retry after crash between append and watermark advance")
  }

  test("a straggler inside the calendar-vs-ceil month gap is still repaired") {
    // regression pin: candidate-day classification must use the same
    // CALENDAR interval arithmetic as the row conditions — with the
    // 31-day ceil, a late day between wm-31d and wm-1month was assigned
    // to the lookback pass whose condition excluded all its rows
    val root = wh("monthgap")
    val matSchema = StructType(Seq(
      StructField("window_start", TimestampType),
      StructField("event_type", StringType),
      StructField("n", LongType),
      StructField("total_value", DoubleType)))
    val view = MatView("hourly", "window_start", Seq("window_start", "event_type"),
      facts => facts
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("total_value")),
      factBound = Some(FactBound("ts", "1 hour")))
    val cat = new TableCatalog(spark, root, Seq(
      TableDef("src", eventsSchema),
      TableDef("mat", matSchema, keys = Seq("window_start", "event_type")),
      Materializer.watermarkTableDef))
    val src = cat.table("src")
    val mzr = new Materializer(spark, src, view, cat.table("mat"),
      cat.table("materialization_watermarks"))

    def at(s: String, id: Long, typ: String) =
      (id, Timestamp.valueOf(s), id % 5, typ, 1.0)
    // February facts → wm = 2024-03-28 12:00; Feb has 29 days in 2024,
    // so wm - 1 month (2024-02-28 12:00) != wm - 31 days (2024-02-26 12:00)
    src.append(toDf(Seq(
      at("2024-02-01 08:00:00", 1, "view"),
      at("2024-03-28 12:00:00", 2, "view"))))
    mzr.run()
    // straggler lands 2024-02-27 — inside [wm-31d, wm-1month): beyond the
    // calendar lookback window, so ONLY the stale pass may repair it
    src.append(toDf(Seq(at("2024-02-27 06:00:00", 3, "click"))))
    mzr.run(lookback = "1 month", staleDetectionWindow = Some("60 days"))
    assertConverged(cat.table("mat"), view.compute(src.readLogical()),
      "straggler in the month-arithmetic gap")
  }

  test("a full-protocol repair run computes the view once and stays under the job budget") {
    val root = wh("budget")
    val matSchema = StructType(Seq(
      StructField("window_start", TimestampType),
      StructField("event_type", StringType),
      StructField("n", LongType),
      StructField("total_value", DoubleType)))
    val view = MatView("hourly", "window_start", Seq("window_start", "event_type"),
      facts => facts
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("total_value")))
    val cat = new TableCatalog(spark, root, Seq(
      TableDef("src", eventsSchema),
      TableDef("mat", matSchema, keys = Seq("window_start", "event_type")),
      Materializer.watermarkTableDef))
    val src = cat.table("src")
    val mzr = new Materializer(spark, src, view, cat.table("mat"),
      cat.table("materialization_watermarks"))
    import spark.implicits._

    src.append(toDf((1L to 40L).map(i =>
      ev(i, 1 + (i % 2).toInt, (i % 24).toInt, i % 5,
        if (i % 3 == 0) "click" else "view", i.toDouble))))
    mzr.run()
    assert(mzr.lastRunViewComputes == 1, s"first run: ${mzr.lastRunViewComputes} view computes")

    // full protocol: lookback + dimension repair + append + stale repair
    src.append(toDf(
      (41L to 50L).map(i => ev(i, 3, (i % 24).toInt, i % 5, "view", i.toDouble)) ++
        Seq(ev(51, 1, 2, 3, "click", 9.0))))
    mzr.run(lookback = "24 hours",
      changedDimKeys = Some(Seq(0L).toDF("user_id").selectExpr("CAST(NULL AS TIMESTAMP) AS window_start", "'view' AS event_type").limit(0)),
      staleDetectionWindow = Some("30 days"))
    // the cached-view contract: every repair pass slices ONE computed
    // view; a second compute means a pass regressed to re-aggregating
    // the source
    assert(mzr.lastRunViewComputes == 1, s"repair run: ${mzr.lastRunViewComputes} view computes")
    // loose job ceiling (AQE makes each shuffle-stage its own job): the
    // r7 driver bench saw m5/m6 drift to 2-3x wall with no spec tripping;
    // a pass that starts launching O(passes^2) work lands far above this
    assert(mzr.lastRunJobs > 0 && mzr.lastRunJobs <= 45,
      s"repair run launched ${mzr.lastRunJobs} Spark jobs (budget 45)")
    assertConverged(cat.table("mat"), view.compute(src.readLogical()), "after budget run")
  }
}

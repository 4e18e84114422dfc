package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The verbatim-SQL surface (X3): every reference table/view name must
  * resolve in the registered session catalog, and literal
  * query-examples.sh text run through spark.sql must agree with the
  * oracle-checked rows the views are registered from.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Scoped ANSI double-quoted-identifier parsing (Trino's quoting
    * style, needed only by #8's metadata-table identifier).
    */
  private def withAnsiQuotes[T](body: => T): T = {
    val key = "spark.sql.ansi.doubleQuotedIdentifiers"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "true")
    try body finally spark.conf.set(key, prev)
  }

  test("the registered surface resolves every reference table and view name") {
    SqlSurfaceOps.registerSurface(spark, sf)
    val names = SqlSurfaceOps.extraSurfaceNames ++
      SparkEntry.registry.map(_.name)
        .filter(n => n.startsWith("v_") || n.startsWith("dq_"))
    for (n <- names)
      assert(spark.catalog.tableExists(n), s"reference name $n not registered")
    // 4 streams + 3 materialized analytics tables + 17 view rows (the
    // 15 reference views, two of which are pinned by a realtime/batch
    // row PAIR) + 2 dq tables
    assert(names.size == 4 + 3 + 17 + 2, s"surface drifted: ${names.sorted}")
  }

  test("all 19 query-examples texts run verbatim against the surface") {
    SqlSurfaceOps.registerSurface(spark, sf)
    SqlSurfaceOps.ensureLakehouse(spark)
    assert(SqlSurfaceOps.exampleTexts.keySet == (1 to 19).toSet,
      "example inventory drifted")
    val limitRe = """LIMIT (\d+)\s*$""".r
    for ((n, text) <- SqlSurfaceOps.exampleTexts.toSeq.sortBy(_._1)) {
      val rows =
        if (SqlSurfaceOps.needsAnsiQuotes(n)) withAnsiQuotes(spark.sql(text).collect())
        else spark.sql(text).collect()
      assert(rows.nonEmpty, s"example #$n returned no rows")
      limitRe.findFirstMatchIn(text).foreach { m =>
        assert(rows.length <= m.group(1).toInt, s"example #$n overflowed its LIMIT")
      }
    }
  }

  test("example #8's snapshot history reflects the materialized commit log") {
    SqlSurfaceOps.registerSurface(spark, sf)
    SqlSurfaceOps.ensureLakehouse(spark)
    val rows = withAnsiQuotes(spark.sql(SqlSurfaceOps.exampleTexts(8)).collect())
    // two append commits, newest first; parentage chains 2 -> 1 -> null
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L), rows.mkString(";"))
    val byId = rows.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(byId(1L).isEmpty && byId(2L).contains(1L), byId.toString)
    assert(rows.forall(_.getString(3) == "append"), rows.mkString(";"))
    // summary semantics: added-records is the PER-SNAPSHOT delta (the
    // two appends partition the table), total-records the running sum
    val summaries = rows.map(r => r.getLong(0) ->
      r.getMap[String, String](4)).toMap
    val added = summaries.view.mapValues(_("added-records").toLong).toMap
    val total = summaries.view.mapValues(_("total-records").toLong).toMap
    assert(added(1L) > 0 && added(2L) > 0, s"empty append delta: $added")
    assert(added(1L) + added(2L) == total(2L),
      s"added-records must partition the table: $added vs $total")
    assert(total(1L) == added(1L), s"first snapshot total == its delta: $total")
  }

  test("$history and $files metadata tables serve the commit log and live file set") {
    SqlSurfaceOps.registerSurface(spark, sf)
    SqlSurfaceOps.ensureLakehouse(spark)
    val hist = withAnsiQuotes(spark.sql(
      """SELECT snapshot_id, parent_id, is_current_ancestor
        |FROM iceberg.db."bid_requests$history" ORDER BY snapshot_id""".stripMargin)
      .collect())
    assert(hist.map(_.getLong(0)).toSeq == Seq(1L, 2L), hist.mkString(";"))
    assert(hist.forall(_.getBoolean(2)), "linear log: all snapshots are ancestors")
    assert(hist(0).isNullAt(1) && hist(1).getLong(1) == 1L, hist.mkString(";"))
    val files = withAnsiQuotes(spark.sql(
      """SELECT file_path, file_format, record_count, file_size_in_bytes
        |FROM iceberg.db."bid_requests$files" WHERE content = 0""".stripMargin).collect())
    assert(files.nonEmpty, "current snapshot must have data files")
    assert(files.forall(_.getString(1) == "PARQUET"))
    assert(files.forall(_.getLong(3) > 0L), "file sizes must be stat'ed, not zero")
    // record_count over the live files == total-records of the latest
    // snapshot (the manifest/summary consistency Iceberg guarantees)
    val snap = withAnsiQuotes(spark.sql(
      """SELECT summary['total-records'] FROM iceberg.db."bid_requests$snapshots"
        |ORDER BY snapshot_id DESC LIMIT 1""".stripMargin).collect())
    assert(files.map(_.getLong(2)).sum == snap(0).getString(0).toLong,
      "sum(record_count) must equal the latest snapshot's total-records")
  }

  test("$refs metadata table lists main plus live tags and audit branches") {
    SqlSurfaceOps.registerSurface(spark, sf)
    SqlSurfaceOps.ensureLakehouse(spark)
    // schema-less handle is enough for ref ops (commit-log metadata only),
    // the same way MetaCatalog itself opens the table
    val tbl = new graft.tables.GraftTable(spark,
      graft.tables.TableDef("bid_requests",
        org.apache.spark.sql.types.StructType(Nil)),
      graft.tables.MetaCatalog.DefaultWarehouse)
    // idempotent across suite re-runs over the shared warehouse
    try tbl.dropTag("audited") catch { case _: IllegalArgumentException => () }
    try tbl.dropBranch("staging") catch { case _: IllegalArgumentException => () }
    def refs() = withAnsiQuotes(spark.sql(
      """SELECT name, type, snapshot_id FROM iceberg.db."bid_requests$refs"
        |ORDER BY name""".stripMargin).collect())
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(refs().toSeq == Seq(("main", "BRANCH", tbl.currentVersion.toLong)))
    tbl.createTag("audited")
    tbl.createBranch("staging")
    assert(refs().toSeq == Seq(
      ("audited", "TAG", tbl.currentVersion.toLong),
      ("main", "BRANCH", tbl.currentVersion.toLong),
      ("staging", "BRANCH", tbl.currentVersion.toLong)))
    tbl.dropTag("audited")
    tbl.dropBranch("staging")
    assert(refs().length == 1)
  }

  test("$partitions metadata table serves per-partition counts from commit metadata alone") {
    SqlSurfaceOps.registerSurface(spark, sf)
    import graft.tables.{GraftTable, MetaCatalog, TableDef, DayTransform}
    import org.apache.spark.sql.types._
    val wh = MetaCatalog.DefaultWarehouse
    graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(s"$wh/part_probe"))
    val t = new GraftTable(spark, TableDef("part_probe",
      StructType(Seq(StructField("id", LongType), StructField("ts", TimestampType))),
      partitions = Seq(DayTransform("ts"))), wh)
    import spark.implicits._
    val rows = Seq(
      (1L, "2024-01-01 01:00:00"), (2L, "2024-01-01 05:00:00"),
      (3L, "2024-01-02 09:00:00"))
      .map { case (i, s) => (i, java.sql.Timestamp.valueOf(s)) }
    t.append(rows.toDF("id", "ts"))
    val got = withAnsiQuotes(spark.sql(
      """SELECT partition, record_count, file_count
        |FROM iceberg.db."part_probe$partitions" ORDER BY partition""".stripMargin)
      .collect())
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.map(_._1).toSeq ==
      Seq("p_ts_day=2024-01-01", "p_ts_day=2024-01-02"))
    assert(got.map(_._2).sum == 3L, s"record counts must partition the table: $got")
    assert(got.forall(_._3 >= 1))
  }

  test("$manifests metadata table serves per-chunk stats that tile the live snapshot") {
    SqlSurfaceOps.registerSurface(spark, sf)
    import graft.tables.{GraftTable, MetaCatalog, TableDef}
    import org.apache.spark.sql.types._
    val wh = MetaCatalog.DefaultWarehouse
    graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(s"$wh/mf_probe"))
    val t = new GraftTable(spark, TableDef("mf_probe",
      StructType(Seq(StructField("id", LongType)))), wh)
    import spark.implicits._
    t.append((0L until 7L).toDF("id")) // v1 -> chunk 1
    t.append((7L until 10L).toDF("id")) // v2 -> carries chunk 1, adds chunk 2
    val got = withAnsiQuotes(spark.sql(
      """SELECT path, length, added_snapshot_id, added_data_files_count, record_count
        |FROM iceberg.db."mf_probe$manifests" ORDER BY added_snapshot_id""".stripMargin)
      .collect())
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    assert(got.length == 2)
    assert(got.map(_._3).toSeq == Seq(1L, 2L), s"added snapshots: $got")
    assert(got.map(_._5).sum == 10L, "chunk record counts must tile the snapshot")
    assert(got.forall(_._2 > 0L))
    assert(got.map(_._4).sum == t.commits.last.files.size)
  }

  test("$entries metadata table exposes per-file record counts and pruning bounds") {
    SqlSurfaceOps.registerSurface(spark, sf)
    import graft.tables.{GraftTable, MetaCatalog, TableDef}
    import org.apache.spark.sql.types._
    val wh = MetaCatalog.DefaultWarehouse
    graft.FsUtil.deleteRecursively(java.nio.file.Paths.get(s"$wh/en_probe"))
    val t = new GraftTable(spark, TableDef("en_probe",
      StructType(Seq(StructField("id", LongType)))), wh)
    import spark.implicits._
    t.append((0L until 9L).toDF("id"))
    val got = withAnsiQuotes(spark.sql(
      """SELECT file_path, record_count,
        |       bounds['id'][0] AS id_lo, bounds['id'][1] AS id_hi
        |FROM iceberg.db."en_probe$entries"""".stripMargin).collect())
    assert(got.nonEmpty)
    assert(got.map(_.getLong(1)).sum == 9L, "entry record counts must tile the snapshot")
    // the recorded bounds must cover exactly the written id range
    assert(got.map(_.getLong(2)).min == 0L && got.map(_.getLong(3)).max == 8L)
  }

  test("single-table example texts agree with an independent recomputation") {
    SqlSurfaceOps.registerSurface(spark, sf)
    val br = spark.table("bid_requests")
    // #1: every returned (country, count) must equal the full aggregate
    val full1 = br.groupBy(col("device_geo_country")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    for (r <- spark.sql(SqlSurfaceOps.exampleTexts(1)).collect())
      assert(full1(r.get(0)) == r.getLong(1), s"#1 drift on ${r.get(0)}")
    // #4: no LIMIT — the complete result set must match exactly
    val got4 = spark.sql(SqlSurfaceOps.exampleTexts(4)).collect()
      .map(r => (r.get(0), r.get(1)) -> r.getLong(2)).toMap
    val full4 = br.groupBy(col("device_os"), col("device_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.get(0), r.get(1)) -> r.getLong(2)).toMap
    assert(got4 == full4, "#4 diverged from the direct aggregation")
    // #7: complete boolean-flag breakdown
    val got7 = spark.sql(SqlSurfaceOps.exampleTexts(7)).collect()
      .map(r => (r.get(0), r.get(1)) -> r.getLong(2)).toMap
    val full7 = br.groupBy(col("is_gdpr"), col("is_coppa"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.get(0), r.get(1)) -> r.getLong(2)).toMap
    assert(got7 == full7, "#7 diverged from the direct aggregation")
    // #5: per returned hour, the count must equal the full hourly rollup
    val full5 = br.groupBy(date_trunc("hour", col("event_timestamp")).as("h"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    for (r <- spark.sql(SqlSurfaceOps.exampleTexts(5)).collect())
      assert(full5(r.get(0)) == r.getLong(1), s"#5 drift at hour ${r.get(0)}")
  }

  test("analytics-table texts return well-formed funnel metrics") {
    SqlSurfaceOps.registerSurface(spark, sf)
    // #19: leakage rates are ratios of distinct-count differences
    for (r <- spark.sql(SqlSurfaceOps.exampleTexts(19)).collect(); i <- 5 to 7)
      assert(r.getDouble(i) >= 0.0 && r.getDouble(i) <= 1.0,
        s"#19 leakage rate out of range: $r")
    // #18: revenue and ctr from the serving-metrics table
    for (r <- spark.sql(SqlSurfaceOps.exampleTexts(18)).collect()) {
      assert(r.getDouble(4) >= 0.0, s"#18 negative revenue: $r")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0, s"#18 ctr: $r")
    }
    // #9: COUNT(resp)/COUNT(br) over the joined stream can never exceed
    // 100% (the numerator counts matched rows only)
    for (r <- spark.sql(SqlSurfaceOps.exampleTexts(9)).collect())
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 100.0, s"#9 fill: $r")
  }

  test("example #15's literal text agrees with the dq row it reads through") {
    SqlSurfaceOps.registerSurface(spark, sf)
    val viaText = SqlSurfaceOps.example15(spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = SparkEntry.queries("dq_rejected_events")(spark, sf)
      .groupBy(col("reject_reason")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaText == direct,
      s"literal SQL over the registered view diverged: $viaText vs $direct")
  }

  test("example #13's literal funnel is internally consistent") {
    val r = SparkEntry.queries("x3_sql_surface")(spark, sf).head()
    val (req, resp, imp, clk) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(req > 0)
    // funnel monotonicity on distinct event ids: every response answers
    // a request, every click follows an impression
    assert(resp <= req, s"responses $resp > requests $req")
    assert(clk <= imp, s"clicks $clk > impressions $imp")
    assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 100.0) // fill_rate_pct
  }
}

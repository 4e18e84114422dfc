package graft.operators

import java.nio.file.{Files, Paths}

import graft.{DmlRunner, QueryDef, SqlRunner, Tables}
import graft.rtb.RtbIngest
import graft.tables.{TableCatalog, TableDef}
import org.apache.spark.sql.types._

/** X2 driven through the oracle gate: a multi-statement SQL script (SET
  * conf + temp-view staging + final SELECT) executed by [[SqlRunner]]
  * must produce exactly what DuckDB computes from the equivalent
  * single-statement SQL.
  */
object RunnerOps {

  private val script =
    """-- statement-set style: stage a view, then consume it
      |SET spark.sql.adaptive.enabled = true;
      |
      |CREATE OR REPLACE TEMPORARY VIEW order_months AS
      |SELECT date_trunc('month', o_orderdate) AS month,
      |       o_orderstatus,
      |       o_totalprice
      |FROM orders; -- comment after a statement
      |
      |SELECT CAST(month AS DATE) AS month, o_orderstatus,
      |       count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS revenue
      |FROM order_months
      |GROUP BY month, o_orderstatus
      |""".stripMargin

  val x2SqlRunner: QueryDef = QueryDef(
    "x2_sql_runner",
    (s, dir) => SqlRunner.run(s, dir, script),
    Some("""SELECT CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS DATE) AS month,
           |       o_orderstatus, count(*) AS n_orders,
           |       round(sum(o_totalprice), 2) AS revenue
           |FROM orders
           |GROUP BY 1, 2""".stripMargin))

  private def scratch(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_warehouse", name)
    graft.FsUtil.deleteRecursively(p)
    Files.createDirectories(p)
    p.toString
  }

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** X4 — the reference's DML repair text replayed VERBATIM against the
    * snapshot-log tables (scripts/materialize.sh:197-216 issues its
    * repairs as `DELETE FROM iceberg.db.<t> WHERE <fk> IN (SELECT ...)`
    * then `INSERT INTO iceberg.db.<t> SELECT ...` — text that until now
    * only replayed through the Scala table API). The script loads the
    * events through two qualified INSERT SELECTs, zeroes the error
    * money with an UPDATE (an unkeyed table → delete+re-insert of the
    * affected rows), and runs the materializer's signature
    * DELETE-with-IN-subquery, which lands as POSITION DELETES —
    * O(matches) tombstones, zero rewrite. The final SELECT reads the
    * post-DML table; DuckDB restates the end state in one query, so a
    * verb that mis-translated (wrong rows deleted, UPDATE leak, INSERT
    * drift) fails the hash.
    */
  val x4SqlDml: QueryDef = QueryDef(
    "x4_sql_dml",
    (s, dir) => {
      val wh = scratch("x4")
      val cat = new TableCatalog(s, wh, Seq(TableDef("dml_events", eventsSchema)))
      DmlRunner.run(s, cat,
        """INSERT INTO iceberg.db.dml_events
          |SELECT event_id, ts, user_id, event_type, round(value, 2)
          |FROM events WHERE ts < TIMESTAMP '2024-01-16';
          |
          |INSERT INTO iceberg.db.dml_events
          |SELECT event_id, ts, user_id, event_type, round(value, 2)
          |FROM events WHERE ts >= TIMESTAMP '2024-01-16';
          |
          |UPDATE iceberg.db.dml_events SET value = 0.0 WHERE event_type = 'error';
          |
          |DELETE FROM iceberg.db.dml_events
          |WHERE user_id IN (
          |  SELECT user_id FROM iceberg.db.dml_events
          |  GROUP BY user_id HAVING max(value) > 300
          |);
          |
          |SELECT event_id, ts, user_id, event_type, value
          |FROM iceberg.db.dml_events
          |""".stripMargin,
        registerExtras = scoped =>
          Tables(scoped, dir).events.createOrReplaceTempView("events"))
    },
    Some("""WITH loaded AS (
           |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           |         CASE WHEN event_type = 'error' THEN 0.0
           |              ELSE round(value, 2) END AS value
           |  FROM events)
           |SELECT event_id, ts, user_id, event_type, value
           |FROM loaded
           |WHERE user_id NOT IN (
           |  SELECT user_id FROM loaded GROUP BY user_id HAVING max(value) > 300
           |)""".stripMargin))

  /** X5 — MERGE INTO as SQL text: the upsert-shaped MERGE (ON = the
    * identifier keys, `UPDATE SET *` / `INSERT *`) lands as
    * [[graft.tables.GraftTable.upsert]] — latest-wins per key, the
    * same semantics the s5 oracle pins for the Scala API, now reachable
    * from the SQL surface. Two half-month aggregates merge; the oracle
    * is s5's FULL JOIN + COALESCE restatement.
    */
  val x5SqlMerge: QueryDef = QueryDef(
    "x5_sql_merge",
    (s, dir) => {
      val wh = scratch("x5")
      val aggSchema = StructType(Seq(
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("n", LongType),
        StructField("total_value", DoubleType)))
      val cat = new TableCatalog(s, wh, Seq(
        TableDef("user_metrics", aggSchema, keys = Seq("user_id", "event_type"))))
      DmlRunner.run(s, cat,
        """INSERT INTO user_metrics
          |SELECT user_id, event_type, count(*), round(sum(value), 2)
          |FROM events WHERE ts < TIMESTAMP '2024-01-16'
          |GROUP BY user_id, event_type;
          |
          |MERGE INTO user_metrics USING (
          |  SELECT user_id, event_type, count(*) AS n,
          |         round(sum(value), 2) AS total_value
          |  FROM events WHERE ts >= TIMESTAMP '2024-01-16'
          |  GROUP BY user_id, event_type
          |) s
          |ON user_metrics.user_id = s.user_id
          |   AND user_metrics.event_type = s.event_type
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *;
          |
          |SELECT user_id, event_type, n, total_value FROM user_metrics
          |""".stripMargin,
        registerExtras = scoped =>
          Tables(scoped, dir).events.createOrReplaceTempView("events"))
    },
    Some("""WITH a AS (SELECT user_id, event_type, count(*) AS n,
           |                  round(sum(value), 2) AS total_value
           |           FROM events WHERE ts < TIMESTAMP '2024-01-16'
           |           GROUP BY user_id, event_type),
           |     b AS (SELECT user_id, event_type, count(*) AS n,
           |                  round(sum(value), 2) AS total_value
           |           FROM events WHERE ts >= TIMESTAMP '2024-01-16'
           |           GROUP BY user_id, event_type)
           |SELECT user_id, event_type,
           |       coalesce(b.n, a.n) AS n,
           |       coalesce(b.total_value, a.total_value) AS total_value
           |FROM a FULL JOIN b USING (user_id, event_type)""".stripMargin))

  /** X6 — the reference materializer's FULL-PASS protocol replayed
    * verbatim as text (scripts/materialize.sh:84-95 creates each mat
    * table with `CREATE TABLE iceberg.db.<t> AS SELECT * FROM
    * iceberg.db.<view>`, then rewrites the watermark row; :106-108 is
    * the watermark-missing full reload, `DELETE FROM` + `INSERT INTO
    * ... SELECT`). Two SEPARATE runner invocations: run 1 executes the
    * create branch, run 2 the reload branch — which only works if a
    * later run re-opens the CTAS table run 1 created (the cron shape).
    * The oracle restates the view; a Scala require pins the watermark
    * bookkeeping at the source max.
    */
  val x6SqlMaterialize: QueryDef = QueryDef(
    "x6_sql_materialize",
    (s, dir) => {
      val wh = scratch("x6")
      val wmSchema = StructType(Seq(
        StructField("table_name", StringType),
        StructField("last_materialized_at", TimestampType)))
      val cat = new TableCatalog(s, wh, Seq(
        TableDef("materialization_watermarks", wmSchema)))
      val extras: org.apache.spark.sql.SparkSession => Unit = scoped => {
        Tables(scoped, dir).events.createOrReplaceTempView("events")
        scoped.sql(
          """CREATE OR REPLACE TEMPORARY VIEW v_hourly_metrics AS
            |SELECT date_trunc('hour', ts) AS hour, event_type,
            |       count(*) AS n_events, round(sum(value), 2) AS total_value
            |FROM events GROUP BY 1, 2""".stripMargin)
      }
      DmlRunner.run(s, cat,
        """CREATE TABLE iceberg.db.mat_hourly_metrics AS
          |SELECT * FROM iceberg.db.v_hourly_metrics;
          |DELETE FROM iceberg.db.materialization_watermarks
          |WHERE table_name = 'mat_hourly_metrics';
          |INSERT INTO iceberg.db.materialization_watermarks
          |SELECT 'mat_hourly_metrics', MAX(ts) FROM iceberg.db.events;
          |SELECT count(*) AS n FROM iceberg.db.mat_hourly_metrics
          |""".stripMargin, extras)
      // the cron's NEXT pass, a fresh runner: watermark-missing full
      // reload (materialize.sh:106-108) against the re-opened table
      val out = DmlRunner.run(s, cat,
        """DELETE FROM iceberg.db.mat_hourly_metrics;
          |INSERT INTO iceberg.db.mat_hourly_metrics
          |SELECT * FROM iceberg.db.v_hourly_metrics;
          |DELETE FROM iceberg.db.materialization_watermarks
          |WHERE table_name = 'mat_hourly_metrics';
          |INSERT INTO iceberg.db.materialization_watermarks
          |SELECT 'mat_hourly_metrics', MAX(ts) FROM iceberg.db.events;
          |SELECT hour, event_type, n_events, total_value
          |FROM iceberg.db.mat_hourly_metrics
          |""".stripMargin, extras)
      // watermark bookkeeping pins at the source max, exactly one row
      val wm = cat.table("materialization_watermarks").readLogical().collect()
      require(wm.length == 1 && wm.head.getString(0) == "mat_hourly_metrics",
        s"watermark bookkeeping drifted: ${wm.mkString(", ")}")
      out
    },
    Some("""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour,
           |       event_type, count(*) AS n_events,
           |       round(sum(value), 2) AS total_value
           |FROM events
           |GROUP BY 1, 2""".stripMargin))

  /** X7 — general MERGE shapes as text: explicit `SET col = expr`
    * assignment lists (RHS reading BOTH aliases' OLD values),
    * `WHEN MATCHED AND <cond> THEN DELETE` ahead of a catch-all UPDATE
    * (first-match-wins, SQL clause order), and a conditional
    * `WHEN NOT MATCHED AND ... THEN INSERT *` — landing as ONE keyed
    * replace commit over exactly the touched keys. The DuckDB oracle
    * restates the end state with a FULL JOIN + CASE (DuckDB 1.0 has no
    * MERGE), so a mis-routed clause, a NEW-row RHS leak, or a lost
    * untouched key all hash-mismatch.
    */
  val x7SqlMergeAssign: QueryDef = QueryDef(
    "x7_sql_merge_assign",
    (s, dir) => {
      val wh = scratch("x7")
      val aggSchema = StructType(Seq(
        StructField("user_id", LongType),
        StructField("n", LongType),
        StructField("total_value", DoubleType)))
      val cat = new TableCatalog(s, wh, Seq(
        TableDef("user_totals", aggSchema, keys = Seq("user_id"))))
      DmlRunner.run(s, cat,
        """INSERT INTO user_totals
          |SELECT user_id, count(*), round(sum(value), 2)
          |FROM events WHERE ts < TIMESTAMP '2024-01-16'
          |GROUP BY user_id;
          |
          |MERGE INTO user_totals t USING (
          |  SELECT user_id, count(*) AS n, round(sum(value), 2) AS total_value
          |  FROM events WHERE ts >= TIMESTAMP '2024-01-16'
          |  GROUP BY user_id
          |) s
          |ON t.user_id = s.user_id
          |WHEN MATCHED AND t.user_id % 7 = 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET n = t.n + s.n,
          |  total_value = round(t.total_value + s.total_value, 2)
          |WHEN NOT MATCHED AND s.user_id % 2 = 0 THEN INSERT *;
          |
          |SELECT user_id, n, total_value FROM user_totals
          |""".stripMargin,
        registerExtras = scoped =>
          Tables(scoped, dir).events.createOrReplaceTempView("events"))
    },
    Some("""WITH a AS (SELECT user_id, count(*) AS n, round(sum(value), 2) AS total_value
           |           FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
           |           GROUP BY user_id),
           |     b AS (SELECT user_id, count(*) AS n, round(sum(value), 2) AS total_value
           |           FROM events WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'
           |           GROUP BY user_id)
           |SELECT user_id,
           |       CASE WHEN b.n IS NULL THEN a.n
           |            WHEN a.n IS NULL THEN b.n
           |            ELSE a.n + b.n END AS n,
           |       CASE WHEN b.n IS NULL THEN a.total_value
           |            WHEN a.n IS NULL THEN b.total_value
           |            ELSE round(a.total_value + b.total_value, 2) END AS total_value
           |FROM a FULL JOIN b USING (user_id)
           |WHERE NOT (a.n IS NOT NULL AND b.n IS NOT NULL AND user_id % 7 = 0)
           |  AND (a.n IS NOT NULL OR user_id % 2 = 0)""".stripMargin))

  /** X8 — time-travel SQL text (`FOR VERSION AS OF` / `FOR TIMESTAMP
    * AS OF`, the Trino/Iceberg forms the reference's design showcases):
    * two loads, then one statement reading the v1 snapshot, the
    * same snapshot by its commit timestamp, and the current table —
    * all three legs in verbatim text. The oracle restates the three
    * counts from the raw source; a mis-pinned snapshot (off-by-one
    * version, wrong timestamp resolution) shifts a leg's count and
    * fails the hash. The programmatic twin is `s13_time_travel`.
    */
  val x8SqlTimetravel: QueryDef = QueryDef(
    "x8_sql_timetravel",
    (s, dir) => {
      val wh = scratch("x8")
      val cat = new TableCatalog(s, wh, Seq(TableDef("tt_events", eventsSchema)))
      DmlRunner.run(s, cat,
        """INSERT INTO iceberg.db.tt_events
          |SELECT event_id, ts, user_id, event_type, round(value, 2)
          |FROM events WHERE event_type <> 'error';
          |INSERT INTO iceberg.db.tt_events
          |SELECT event_id, ts, user_id, event_type, round(value, 2)
          |FROM events WHERE event_type = 'error'""".stripMargin,
        registerExtras = scoped =>
          Tables(scoped, dir).events.createOrReplaceTempView("events"))
      val ts1 = new java.sql.Timestamp(
        cat.table("tt_events").commits.head.tsMs).toString
      DmlRunner.run(s, cat,
        s"""SELECT 1 AS leg, count(*) AS n
           |FROM iceberg.db.tt_events FOR VERSION AS OF 1
           |UNION ALL
           |SELECT 2, count(*)
           |FROM iceberg.db.tt_events FOR TIMESTAMP AS OF TIMESTAMP '$ts1'
           |UNION ALL
           |SELECT 3, count(*) FROM iceberg.db.tt_events
           |""".stripMargin,
        registerExtras = scoped =>
          Tables(scoped, dir).events.createOrReplaceTempView("events"))
    },
    Some("""SELECT 1 AS leg, count(*) AS n FROM events WHERE event_type <> 'error'
           |UNION ALL
           |SELECT 2, count(*) FROM events WHERE event_type <> 'error'
           |UNION ALL
           |SELECT 3, count(*) FROM events""".stripMargin))

  /** X9 — CATALOG VIEW DDL as verbatim text: run 1 replays
    * trino/apply_views.sh's exact statement shape with the LITERAL file
    * texts of v_agg_funnel_by_publisher.sql:1-38 and
    * v_event_enriched_clicks.sql:1-19 (byte-for-byte, including the
    * `iceberg.db.*` qualifications); run 2 — a SEPARATE runner
    * invocation, proving the views PERSIST like Trino's — replays
    * materialize.sh:84's consumer (`CREATE TABLE iceberg.db.mat_… AS
    * SELECT * FROM iceberg.db.<view>`) and reads the mat table back,
    * with the second view pinned by a scalar-subquery count. Both
    * pasted views are money-free (distinct counts, exact ratios,
    * row-level enrichment), so the verbatim text hash-matches DuckDB
    * without the suite's cents rewrite. Fixtures are the landed-shape
    * RTB tables (the flattening the `rtb_ingest_enrich` row pins) plus
    * the standing SCD2 range dims with their derived attributes.
    */
  val x9SqlViews: QueryDef = QueryDef(
    "x9_sql_views",
    (s, dir) => {
      val wh = scratch("x9")
      val cat = new TableCatalog(s, wh, Seq.empty)
      import org.apache.spark.sql.functions._
      import RtbOracleOps.{ensureData, rangeDim, creativeFormatCol}
      val rtb = RtbOracleOps.root
      val extras: org.apache.spark.sql.SparkSession => Unit = scoped => {
        ensureData(scoped)
        scoped.read.parquet(s"$rtb/requests")
          .select(col("id").as("request_id"),
            coalesce(col("site.publisher.id"), col("app.publisher.id"))
              .as("publisher_id"),
            RtbIngest.parseTs(col("event_timestamp")).as("event_timestamp"))
          .createOrReplaceTempView("bid_requests")
        scoped.read.parquet(s"$rtb/responses")
          .select(col("id").as("response_id"), col("ext.request_id").as("request_id"))
          .createOrReplaceTempView("bid_responses")
        scoped.read.parquet(s"$rtb/impressions")
          .select(col("impression_id"), col("response_id"))
          .createOrReplaceTempView("impressions")
        scoped.read.parquet(s"$rtb/clicks")
          .select(col("click_id"), col("request_id"), col("impression_id"),
            col("imp_id"), col("bidder_id"), col("creative_id"), col("click_url"),
            RtbIngest.parseTs(col("event_timestamp")).as("event_timestamp"))
          .createOrReplaceTempView("clicks")
        rangeDim(scoped, 30, "publisher_id", "publisher_name", "publisher")
          .withColumn("vertical",
            concat(lit("v"), (col("publisher_id") % 4).cast("string")))
          .withColumn("tier", lit(1) + col("publisher_id") % 3)
          .createOrReplaceTempView("dim_publisher")
        rangeDim(scoped, 25, "bidder_id", "bidder_name", "bidder")
          .createOrReplaceTempView("dim_bidder")
        rangeDim(scoped, 200, "creative_id", "creative_name", "creative")
          .withColumn("format", creativeFormatCol("creative_id"))
          .createOrReplaceTempView("dim_creative")
      }
      // run 1 — apply_views.sh: the two literal trino/sql file texts
      DmlRunner.run(s, cat,
        """CREATE OR REPLACE VIEW iceberg.db.v_agg_funnel_by_publisher AS
          |SELECT
          |    date_trunc('hour', br.event_timestamp) AS hour_start,
          |    br.publisher_id,
          |    dp.publisher_name,
          |    dp.vertical AS publisher_vertical,
          |    dp.tier AS publisher_tier,
          |    COUNT(DISTINCT br.request_id) AS bid_requests,
          |    COUNT(DISTINCT resp.response_id) AS bid_responses,
          |    COUNT(DISTINCT imp.impression_id) AS impressions,
          |    COUNT(DISTINCT cl.click_id) AS clicks,
          |    CASE
          |        WHEN COUNT(DISTINCT br.request_id) > 0
          |        THEN CAST(COUNT(DISTINCT resp.response_id) AS DOUBLE)
          |            / CAST(COUNT(DISTINCT br.request_id) AS DOUBLE)
          |        ELSE 0.0
          |    END AS fill_rate,
          |    CASE
          |        WHEN COUNT(DISTINCT resp.response_id) > 0
          |        THEN CAST(COUNT(DISTINCT imp.impression_id) AS DOUBLE)
          |            / CAST(COUNT(DISTINCT resp.response_id) AS DOUBLE)
          |        ELSE 0.0
          |    END AS win_rate,
          |    CASE
          |        WHEN COUNT(DISTINCT imp.impression_id) > 0
          |        THEN CAST(COUNT(DISTINCT cl.click_id) AS DOUBLE)
          |            / CAST(COUNT(DISTINCT imp.impression_id) AS DOUBLE)
          |        ELSE 0.0
          |    END AS ctr
          |FROM iceberg.db.bid_requests br
          |LEFT JOIN iceberg.db.bid_responses resp ON br.request_id = resp.request_id
          |LEFT JOIN iceberg.db.impressions imp ON resp.response_id = imp.response_id
          |LEFT JOIN iceberg.db.clicks cl ON imp.impression_id = cl.impression_id
          |LEFT JOIN iceberg.db.dim_publisher dp
          |    ON br.publisher_id = dp.publisher_id AND dp.is_current = true
          |GROUP BY
          |    date_trunc('hour', br.event_timestamp),
          |    br.publisher_id, dp.publisher_name, dp.vertical, dp.tier;
          |CREATE OR REPLACE VIEW iceberg.db.v_event_enriched_clicks AS
          |SELECT
          |    cl.click_id,
          |    cl.request_id,
          |    cl.impression_id,
          |    cl.imp_id,
          |    cl.bidder_id,
          |    db.bidder_name,
          |    cl.creative_id,
          |    dc.creative_name,
          |    dc.format AS creative_format,
          |    cl.click_url,
          |    cl.event_timestamp
          |FROM iceberg.db.clicks cl
          |LEFT JOIN iceberg.db.dim_bidder db
          |    ON cl.bidder_id = db.bidder_id AND db.is_current = true
          |LEFT JOIN iceberg.db.dim_creative dc
          |    ON cl.creative_id = dc.creative_id AND dc.is_current = true;
          |""".stripMargin, extras)
      // run 2 — materialize.sh:84's consumer, in a FRESH runner: the
      // persisted views must re-register and serve the CTAS
      DmlRunner.run(s, cat,
        """CREATE TABLE iceberg.db.mat_agg_funnel_by_publisher AS
          |SELECT * FROM iceberg.db.v_agg_funnel_by_publisher;
          |SELECT f.hour_start, f.publisher_id, f.publisher_name,
          |       f.publisher_vertical, f.publisher_tier,
          |       f.bid_requests, f.bid_responses, f.impressions, f.clicks,
          |       f.fill_rate, f.win_rate, f.ctr,
          |       (SELECT count(*) FROM iceberg.db.v_event_enriched_clicks)
          |         AS enriched_clicks
          |FROM iceberg.db.mat_agg_funnel_by_publisher f
          |""".stripMargin, extras)
    },
    Some {
      val rtb = RtbOracleOps.root
      s"""WITH dim_publisher AS (
         |  SELECT publisher_id, publisher_name,
         |         'v' || CAST(publisher_id % 4 AS VARCHAR) AS vertical,
         |         1 + publisher_id % 3 AS tier, is_current
         |  FROM (${RtbOracleOps.rangeDimSql(30, "publisher_id", "publisher_name", "publisher")})
         |),
         |br AS (SELECT id AS request_id,
         |              coalesce(site['publisher']['id'], app['publisher']['id']) AS publisher_id,
         |              ${RtbOracleOps.tsSql} AS event_ts
         |       FROM read_parquet('$rtb/requests/*.parquet')),
         |resp AS (SELECT id AS response_id, ext['request_id'] AS request_id
         |         FROM read_parquet('$rtb/responses/*.parquet')),
         |imp AS (SELECT impression_id, response_id
         |        FROM read_parquet('$rtb/impressions/*.parquet')),
         |cl AS (SELECT click_id, impression_id
         |       FROM read_parquet('$rtb/clicks/*.parquet')),
         |j AS (SELECT br.event_ts, br.publisher_id, br.request_id,
         |             resp.response_id, imp.impression_id, cl.click_id,
         |             dp.publisher_name, dp.vertical AS pv, dp.tier AS pt
         |      FROM br
         |      LEFT JOIN resp ON br.request_id = resp.request_id
         |      LEFT JOIN imp ON resp.response_id = imp.response_id
         |      LEFT JOIN cl ON imp.impression_id = cl.impression_id
         |      LEFT JOIN dim_publisher dp
         |        ON br.publisher_id = dp.publisher_id AND dp.is_current),
         |f AS (SELECT date_trunc('hour', event_ts) AS hour_start,
         |             publisher_id, publisher_name,
         |             pv AS publisher_vertical, pt AS publisher_tier,
         |             count(DISTINCT request_id) AS bid_requests,
         |             count(DISTINCT response_id) AS bid_responses,
         |             count(DISTINCT impression_id) AS impressions,
         |             count(DISTINCT click_id) AS clicks,
         |             CASE WHEN count(DISTINCT request_id) > 0
         |                  THEN CAST(count(DISTINCT response_id) AS DOUBLE)
         |                       / CAST(count(DISTINCT request_id) AS DOUBLE)
         |                  ELSE 0.0 END AS fill_rate,
         |             CASE WHEN count(DISTINCT response_id) > 0
         |                  THEN CAST(count(DISTINCT impression_id) AS DOUBLE)
         |                       / CAST(count(DISTINCT response_id) AS DOUBLE)
         |                  ELSE 0.0 END AS win_rate,
         |             CASE WHEN count(DISTINCT impression_id) > 0
         |                  THEN CAST(count(DISTINCT click_id) AS DOUBLE)
         |                       / CAST(count(DISTINCT impression_id) AS DOUBLE)
         |                  ELSE 0.0 END AS ctr
         |      FROM j GROUP BY 1, 2, 3, 4, 5)
         |SELECT f.*, ec.enriched_clicks
         |FROM f CROSS JOIN (SELECT count(*) AS enriched_clicks
         |                   FROM read_parquet('$rtb/clicks/*.parquet')) ec""".stripMargin
    })

  /** X10 — the reference's SHELL-layer metadata statements:
    * `DESCRIBE ${table}` (scripts/maintenance.sh:57 — every maintenance
    * pass gates on it; failure = the table-does-not-exist signal that
    * skips mat_* tables before the first materialization run) and
    * `SHOW TABLES` (scripts/setup.sh:135 — the catalog-verification
    * poll). The row replays the full gate shape: DESCRIBE of the
    * not-yet-created mat table must FAIL; after the materializer's CTAS
    * it must succeed; SHOW TABLES lists declared and runner-created
    * tables alike. Output = the Trino-shaped DESCRIBE of the CTAS
    * table, cross-joined with the SHOW TABLES inventory (names
    * concatenated, name-ordered).
    */
  val x10SqlShow: QueryDef = QueryDef(
    "x10_sql_show",
    (s, dir) => {
      val wh = scratch("x10")
      val wmSchema = StructType(Seq(
        StructField("table_name", StringType),
        StructField("watermark_ts", TimestampType)))
      val cat = new TableCatalog(s, wh,
        Seq(TableDef("materialization_watermarks", wmSchema)))
      // the maintenance gate BEFORE first materialization: must fail
      val gateFailed =
        try { DmlRunner.run(s, cat, "DESCRIBE iceberg.db.mat_probe"); false }
        catch { case _: Exception => true }
      require(gateFailed,
        "DESCRIBE of a missing table must fail — maintenance.sh's skip " +
          "signal would otherwise run maintenance on nothing")
      DmlRunner.run(s, cat,
        """CREATE TABLE iceberg.db.mat_probe AS
          |SELECT CAST(7 AS BIGINT) AS event_id, CAST('click' AS STRING) AS event_type,
          |       CAST(1.5 AS DOUBLE) AS value""".stripMargin)
      val desc = DmlRunner.run(s, cat, "DESCRIBE iceberg.db.mat_probe")
      val shown = DmlRunner.run(s, cat, "SHOW TABLES")
      import org.apache.spark.sql.functions._
      desc.crossJoin(broadcast(shown.agg(
        count(col("Table")).as("n_tables"),
        concat_ws(",", sort_array(collect_list(col("Table")))).as("tables_list"))))
    },
    Some("""SELECT "Column", "Type", "Extra", "Comment",
           |       CAST(n AS BIGINT) AS n_tables, tables_list
           |FROM (VALUES
           |  ('event_id',   'bigint', '', '', 2, 'mat_probe,materialization_watermarks'),
           |  ('event_type', 'string', '', '', 2, 'mat_probe,materialization_watermarks'),
           |  ('value',      'double', '', '', 2, 'mat_probe,materialization_watermarks'))
           |AS t("Column", "Type", "Extra", "Comment", n, tables_list)""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(x2SqlRunner, x4SqlDml, x5SqlMerge, x6SqlMaterialize, x7SqlMergeAssign,
      x8SqlTimetravel, x9SqlViews, x10SqlShow)
}

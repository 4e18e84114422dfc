package graft.operators

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Relational operators from SURVEY.md §2 (projections/filters P*, hash
  * aggregations A*, joins J*, explodes U*, sort/limit O1, set op O2,
  * incremental pass M3), instantiated on the driver testdata per
  * FIXTURES.md §B.
  *
  * Scale notes (100 TB discipline):
  *  - every filter/projection is declarative → Catalyst pushes it into the
  *    parquet scan (verified via `.explain` — PushedFilters/ReadSchema);
  *  - tiny dims (region 5 rows, nation 25) are `broadcast()` to avoid a
  *    fact-side shuffle; `customer` is NOT broadcast (it scales with SF)
  *    — AQE picks shuffled hash/sort-merge and can still convert at
  *    runtime if a filtered side turns out small;
  *  - aggregations rely on Catalyst's partial (map-side) aggregation;
  *  - all money sums are rounded at the *end* so the partial-agg tree is
  *    untouched.
  */
object RelationalOps {

  /** A1/P12 + A8 — multi-metric hash aggregate (pricing summary, mirrors
    * reference hourly re-aggregations, e.g. aggregation_jobs.sql:24-55).
    */
  val q1PricingSummary: QueryDef = QueryDef(
    "a1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
      |       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc_price,
      |       CAST((sum(CAST(round(l_quantity * 100) AS BIGINT)) * 200 + count(*))
      |            // (2 * count(*)) AS DOUBLE) / 10000 AS avg_qty,
      |       CAST((sum(CAST(round(l_discount * 100) AS BIGINT)) * 200 + count(*))
      |            // (2 * count(*)) AS DOUBLE) / 10000 AS avg_disc,
      |       count(*)                        AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin) { t =>
    t.lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(round(col("l_quantity") * 100).cast("long")).cast("double") / 100.0)
          .as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100).cast("long")).cast("double") / 100.0)
          .as("sum_base_price"),
        (sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).cast("double") / 100.0).as("sum_disc_price"),
        expr("CAST((sum(CAST(round(l_quantity * 100) AS BIGINT)) * 200 + count(*)) DIV (2 * count(*)) AS DOUBLE) / 10000").as("avg_qty"),
        expr("CAST((sum(CAST(round(l_discount * 100) AS BIGINT)) * 200 + count(*)) DIV (2 * count(*)) AS DOUBLE) / 10000").as("avg_disc"),
        count(lit(1)).as("n_rows"))
  }

  /** P5/P6/P9 — predicate filter incl. SQL LIKE `_` wildcard + CASE
    * reject-reason derivation (reference insert_jobs.sql:48-62,141-155).
    */
  val p5RejectFilter: QueryDef = QueryDef(
    "p5_reject_filter",
    """SELECT CASE WHEN o_totalprice <= 1000.0            THEN 'LOW_VALUE'
      |            WHEN o_orderpriority LIKE '_-URGENT'   THEN 'URGENT'
      |            WHEN o_orderstatus = 'F'               THEN 'FINISHED'
      |            ELSE 'OTHER' END            AS reject_reason,
      |       count(*)                         AS n,
      |       round(sum(o_totalprice), 2)      AS total_price
      |FROM orders
      |WHERE o_totalprice > 0 AND o_orderpriority NOT LIKE '5%'
      |GROUP BY 1""".stripMargin) { t =>
    t.orders
      .filter(col("o_totalprice") > 0 && !col("o_orderpriority").like("5%"))
      .withColumn("reject_reason",
        when(col("o_totalprice") <= 1000.0, "LOW_VALUE")
          .when(col("o_orderpriority").like("_-URGENT"), "URGENT")
          .when(col("o_orderstatus") === "F", "FINISHED")
          .otherwise("OTHER"))
      .groupBy(col("reject_reason"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total_price"))
  }

  /** P8 — static currency-normalization CASE (insert_jobs.sql:74-79),
    * instantiated as an FX multiplier keyed on nation name.
    */
  val p8CurrencyCase: QueryDef = QueryDef(
    "p8_currency_case",
    """SELECT n_name,
      |       count(*) AS n_orders,
      |       round(sum(o_totalprice *
      |         CASE WHEN n_name IN ('FRANCE','GERMANY') THEN 1.08
      |              WHEN n_name = 'UNITED KINGDOM'      THEN 1.25
      |              WHEN n_name = 'JAPAN'               THEN 0.0067
      |              ELSE 1.0 END), 2) AS revenue_usd
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin) { t =>
    val rate = when(col("n_name").isin("FRANCE", "GERMANY"), 1.08)
      .when(col("n_name") === "UNITED KINGDOM", 1.25)
      .when(col("n_name") === "JAPAN", 0.0067)
      .otherwise(1.0)
    t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice") * rate), 2).as("revenue_usd"))
  }

  /** J5/J7 — fact→dim star enrichment with left joins (the reference's
    * enriched views, v_event_enriched_*.sql). region/nation broadcast;
    * customer join is a shuffle (it scales with the fact table).
    */
  val j5DimEnrich: QueryDef = QueryDef(
    "j5_dim_enrich",
    """SELECT r_name, n_name,
      |       count(*)                    AS n_orders,
      |       round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |LEFT JOIN customer ON o_custkey   = c_custkey
      |LEFT JOIN nation   ON c_nationkey = n_nationkey
      |LEFT JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin) { t =>
    t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"), "left")
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"), "left")
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
  }

  /** J6 — multi-key equi join (reference geo dim joins on
    * country_code+region_code, v_event_enriched_bid_requests.sql:40-43):
    * per-(user, day) view-side and click-side aggregates joined on BOTH keys.
    */
  val j6MultikeyJoin: QueryDef = QueryDef(
    "j6_multikey_join",
    """WITH v AS (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_views
      |           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |     c AS (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_clicks
      |           FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT v.user_id, v.day, n_views, n_clicks
      |FROM v JOIN c ON v.user_id = c.user_id AND v.day = c.day""".stripMargin) { t =>
    val ev = t.events
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_views"))
    val c = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_clicks"))
    v.join(c, Seq("user_id", "day"))
      .select(col("user_id"), col("day"), col("n_views"), col("n_clicks"))
  }

  /** J9 — EXISTS correlated semi-join (materialize.sh:248-272 stale-row
    * detection): orders having a lineitem shipped >90 days after order date.
    */
  val j9ExistsSemi: QueryDef = QueryDef(
    "j9_exists_semi",
    """SELECT o_orderstatus, count(*) AS n_late_orders,
      |       round(sum(o_totalprice), 2) AS late_revenue
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderstatus""".stripMargin) { t =>
    // the EXISTS predicate is monotone in l_shipdate, so the semi-join
    // right side reduces to max(l_shipdate) per orderkey FIRST: the
    // partial max combines map-side (~4 lineitems/order never shuffle),
    // the build side shrinks to one row per orderkey, and the residual
    // range check runs against that single max instead of every line.
    // Joining raw lineitem made Spark build/broadcast the 4x-larger
    // fact side here.
    val lastShip = t.lineitem.groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("last_ship"))
    t.orders
      .join(lastShip,
        col("o_orderkey") === col("l_orderkey") &&
          col("last_ship") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_late_orders"),
        round(sum(col("o_totalprice")), 2).as("late_revenue"))
  }

  /** J10 — IN-subquery semi-join (materialize.sh:197-216 dimension-change
    * row selection): orders of customers with negative balance.
    */
  val j10InSemi: QueryDef = QueryDef(
    "j10_in_semi",
    """SELECT count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)""".stripMargin) { t =>
    t.orders
      .join(t.customer.filter(col("c_acctbal") < 0).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
  }

  /** A2 — multiple exact COUNT(DISTINCT) in one aggregate (funnel counts,
    * funnel_jobs.sql:32-35): distinct users per funnel stage per day.
    */
  val a2FunnelCounts: QueryDef = QueryDef(
    "a2_funnel_counts",
    """SELECT CAST(ts AS DATE) AS day,
      |       count(DISTINCT CASE WHEN event_type = 'view'     THEN user_id END) AS d_view_users,
      |       count(DISTINCT CASE WHEN event_type = 'click'    THEN user_id END) AS d_click_users,
      |       count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS d_purchase_users,
      |       count(DISTINCT user_id) AS d_users
      |FROM events GROUP BY 1""".stripMargin) { t =>
    t.events
      .groupBy(col("ts").cast("date").as("day"))
      .agg(
        countDistinct(when(col("event_type") === "view", col("user_id"))).as("d_view_users"),
        countDistinct(when(col("event_type") === "click", col("user_id"))).as("d_click_users"),
        countDistinct(when(col("event_type") === "purchase", col("user_id"))).as("d_purchase_users"),
        countDistinct(col("user_id")).as("d_users"))
  }

  /** A2 rewritten without Expand: the multi-COUNT(DISTINCT) plan
    * replicates every input row once per distinct aggregate (4× here)
    * before the shuffle; this form pre-aggregates per (day, user) —
    * one shuffle carrying each pair ONCE with three boolean flags —
    * then folds the flags per day. Same oracle, same output; at 100 TB
    * the expanded stream is the difference between shuffling the table
    * and shuffling 4× the table. PlanSpec pins the no-Expand plan.
    */
  val a2FunnelOnepass: QueryDef = QueryDef(
    "a2_funnel_onepass",
    """SELECT CAST(ts AS DATE) AS day,
      |       count(DISTINCT CASE WHEN event_type = 'view'     THEN user_id END) AS d_view_users,
      |       count(DISTINCT CASE WHEN event_type = 'click'    THEN user_id END) AS d_click_users,
      |       count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS d_purchase_users,
      |       count(DISTINCT user_id) AS d_users
      |FROM events GROUP BY 1""".stripMargin) { t =>
    // NULL users count toward no distinct aggregate (COUNT DISTINCT
    // skips NULL) but their rows must still surface their day group
    val liveUser = col("user_id").isNotNull
    t.events
      .groupBy(col("ts").cast("date").as("day"), col("user_id"))
      .agg(
        max(when(col("event_type") === "view" && liveUser, 1L).otherwise(0L)).as("v"),
        max(when(col("event_type") === "click" && liveUser, 1L).otherwise(0L)).as("c"),
        max(when(col("event_type") === "purchase" && liveUser, 1L).otherwise(0L)).as("p"))
      .groupBy(col("day"))
      .agg(sum(col("v")).as("d_view_users"),
        sum(col("c")).as("d_click_users"),
        sum(col("p")).as("d_purchase_users"),
        sum(when(liveUser, 1L).otherwise(0L)).as("d_users"))
  }

  /** A3 — dedup-by-key via GROUP BY key + MAX(payload)
    * (aggregation_jobs.sql:31-50 pre-join dedup).
    */
  val a3DedupGroupby: QueryDef = QueryDef(
    "a3_dedup_groupby",
    """SELECT user_id, event_type,
      |       CAST(max(ts) AS TIMESTAMP) AS last_ts,
      |       round(max(value), 2)       AS max_value,
      |       count(*)                   AS n_rows
      |FROM events GROUP BY 1, 2""".stripMargin) { t =>
    t.events
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(col("ts")).as("last_ts"),
        round(max(col("value")), 2).as("max_value"),
        count(lit(1)).as("n_rows"))
  }

  /** A4 — conditional distinct count (aggregation_jobs.sql:177-199
    * invalid-event counting): COUNT(DISTINCT CASE WHEN cond THEN id END).
    */
  val a4ConditionalDistinct: QueryDef = QueryDef(
    "a4_conditional_distinct",
    """SELECT event_type,
      |       count(DISTINCT CASE WHEN value < 50.0 THEN user_id END) AS low_value_users,
      |       count(DISTINCT user_id) AS all_users,
      |       count(*) AS n
      |FROM events GROUP BY event_type""".stripMargin) { t =>
    t.events
      .groupBy(col("event_type"))
      .agg(
        countDistinct(when(col("value") < 50.0, col("user_id"))).as("low_value_users"),
        countDistinct(col("user_id")).as("all_users"),
        count(lit(1)).as("n"))
  }

  /** A5/O2/A6 — multi-source window spine: UNION(distinct) of per-stream
    * hour buckets drives LEFT joins of per-stream aggregates, plus derived
    * rate metrics (aggregation_jobs.sql:152-228, 87-151).
    */
  val a5UnionSpine: QueryDef = QueryDef(
    "a5_union_spine",
    """WITH v AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, count(*) AS n_views
      |           FROM events WHERE event_type = 'view' GROUP BY 1),
      |     c AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, count(*) AS n_clicks
      |           FROM events WHERE event_type = 'click' GROUP BY 1),
      |     p AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, count(*) AS n_purchases
      |           FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |     spine AS (SELECT hour FROM v UNION SELECT hour FROM c UNION SELECT hour FROM p)
      |SELECT s.hour,
      |       coalesce(n_views, 0)     AS n_views,
      |       coalesce(n_clicks, 0)    AS n_clicks,
      |       coalesce(n_purchases, 0) AS n_purchases,
      |       CASE WHEN coalesce(n_views, 0) > 0
      |            THEN round(CAST(coalesce(n_clicks, 0) AS DOUBLE) / n_views, 4)
      |            ELSE 0.0 END AS ctr
      |FROM spine s
      |LEFT JOIN v ON s.hour = v.hour
      |LEFT JOIN c ON s.hour = c.hour
      |LEFT JOIN p ON s.hour = p.hour""".stripMargin) { t =>
    val ev = t.events
    def hourly(tpe: String, alias: String) =
      ev.filter(col("event_type") === tpe)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as(alias))
    val v = hourly("view", "n_views")
    val c = hourly("click", "n_clicks")
    val p = hourly("purchase", "n_purchases")
    val spine = v.select("hour").union(c.select("hour")).union(p.select("hour")).distinct()
    spine
      .join(v, Seq("hour"), "left")
      .join(c, Seq("hour"), "left")
      .join(p, Seq("hour"), "left")
      .select(
        col("hour"),
        coalesce(col("n_views"), lit(0L)).as("n_views"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        when(coalesce(col("n_views"), lit(0L)) > 0,
          round(coalesce(col("n_clicks"), lit(0L)).cast("double") / col("n_views"), 4))
          .otherwise(0.0).as("ctr"))
  }

  /** A5 (one-pass rewrite) — same result as [[a5UnionSpine]] from ONE
    * scan and ONE shuffle: the spine of hours with any of the three
    * event types IS the set of group keys of a conditional aggregation,
    * so the union-of-three-aggregates + three left joins collapses to
    * `groupBy(hour).agg(count(when(...)))`. Kept alongside the faithful
    * spine replica: at 100 TB this is 1× the fact scan instead of 3×
    * and one exchange instead of four.
    *
    * Perf note (round 6): the round-4/5 bench drift (0.68→0.94 s) was
    * shared-JVM ambient, not a plan change — isolated warm runs measure
    * 0.36–0.53 s at sf0.1 with PlanSpec still pinning 1 scan / no join.
    */
  val a5SpineOnepass: QueryDef = QueryDef(
    "a5_spine_onepass",
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
      |       count(CASE WHEN event_type = 'view' THEN 1 END)     AS n_views,
      |       count(CASE WHEN event_type = 'click' THEN 1 END)    AS n_clicks,
      |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
      |       CASE WHEN count(CASE WHEN event_type = 'view' THEN 1 END) > 0
      |            THEN round(CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS DOUBLE)
      |                       / count(CASE WHEN event_type = 'view' THEN 1 END), 4)
      |            ELSE 0.0 END AS ctr
      |FROM events
      |WHERE event_type IN ('view', 'click', 'purchase')
      |GROUP BY 1""".stripMargin) { t =>
    t.events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(
        count(when(col("event_type") === "view", 1)).as("n_views"),
        count(when(col("event_type") === "click", 1)).as("n_clicks"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"))
      .withColumn("ctr",
        when(col("n_views") > 0,
          round(col("n_clicks").cast("double") / col("n_views"), 4))
          .otherwise(0.0))
  }

  /** U1 — explode/UNNEST flatten (insert_jobs.sql:47 CROSS JOIN UNNEST):
    * one row per word of part name, re-aggregated to word counts.
    */
  val u1Explode: QueryDef = QueryDef(
    "u1_explode",
    """SELECT word, count(*) AS n
      |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
      |GROUP BY word""".stripMargin) { t =>
    t.part
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
  }

  /** U2 — nested ARRAY<STRUCT> build + double-flatten (insert_jobs.sql:198-199
    * UNNEST(seatbid)→UNNEST(bid)): collect lineitems per order into an
    * array of structs, explode back, project nested fields. The oracle is
    * the identity projection — proving the round-trip is lossless.
    */
  val u2NestedExplode: QueryDef = QueryDef(
    "u2_nested_explode",
    """SELECT l_orderkey, l_linenumber, l_partkey,
      |       round(l_quantity, 2) AS quantity
      |FROM lineitem""".stripMargin) { t =>
    t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(collect_list(struct(col("l_linenumber"), col("l_partkey"), col("l_quantity")))
        .as("items"))
      .select(col("l_orderkey"), explode(col("items")).as("it"))
      .select(col("l_orderkey"), col("it.l_linenumber").as("l_linenumber"),
        col("it.l_partkey").as("l_partkey"),
        round(col("it.l_quantity"), 2).as("quantity"))
  }

  /** O1 — ORDER BY … LIMIT top-k (13 of the reference's 19 example
    * queries, query-examples.sh): top-10 customers by revenue.
    * Deterministic tie-break on the key. Spark plans this as TakeOrderedAndProject
    * (per-partition top-k + merge — no global sort at scale).
    */
  val o1TopK: QueryDef = QueryDef(
    "o1_topk",
    """SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
      |FROM orders GROUP BY o_custkey
      |ORDER BY revenue DESC, o_custkey ASC LIMIT 10""".stripMargin) { t =>
    t.orders
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("o_custkey").asc)
      .limit(10)
  }

  /** M3 — incremental materialization append pass (materialize.sh:226-241):
    * rows strictly above the stored watermark, bucketed by month.
    */
  val m3IncrementalAppend: QueryDef = QueryDef(
    "m3_incremental_append",
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |       count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |WHERE o_orderdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1""".stripMargin) { t =>
    t.orders
      .filter(col("o_orderdate") > lit("1998-01-01 00:00:00").cast("timestamp"))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
  }

  /** A9 — ROLLUP / grouping-sets aggregation: the subtotal+grand-total
    * lattice over (returnflag, linestatus) in ONE pass (Spark expands the
    * grouping sets inside the hash aggregate — no per-level rescan, no
    * union of three aggs). `gid` disambiguates a NULL group key from a
    * rolled-up level. Quantity AND price sums go through exact BIGINT
    * (integral quantities; prices as integer cents) so both engines add
    * exact integers at every rollup level — the grand-total row sums the
    * whole table and raw-double accumulation order diverges across
    * engines (round-5 hash mismatch).
    */
  val a9Rollup: QueryDef = QueryDef(
    "a9_rollup",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(grouping(l_returnflag) + 2 * grouping(l_linestatus) AS INT) AS gid,
      |       count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_price
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin) { t =>
    t.lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) + lit(2) * grouping(col("l_linestatus")))
          .cast("int").as("gid"),
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100).cast("long")).cast("double") / 100.0)
          .as("sum_price"))
  }

  /** A9c — GROUPING SETS with a lattice neither ROLLUP nor CUBE can
    * express: the two single-column marginals and NOTHING else (no
    * pair level, no grand total). Same one-scan Expand execution as
    * the rollup/cube rows — grouping sets is the general form those
    * two specialize; `gid` disambiguates which marginal a row belongs
    * to (and keeps the NULL-valued key columns hashable).
    */
  val a9GroupingSets: QueryDef = QueryDef(
    "a9_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(grouping(l_returnflag) + 2 * grouping(l_linestatus) AS INT) AS gid,
      |       count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin) { t =>
    t.lineitem
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) + lit(2) * grouping(col("l_linestatus")))
          .cast("int").as("gid"),
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
  }

  /** A10 — exact interpolated percentiles per group. Both engines use
    * the same linear-interpolation formula (pos = p·(n−1); lo +
    * (hi−lo)·frac) over integral quantity values, so the doubles agree
    * bit-for-bit. NB exact percentile sorts each group — the 100 TB
    * form is the mergeable histogram sketch instantiated as
    * `approx_percentile_hist` ([[graft.functions.SketchOps]]); this is
    * the oracle-checkable exact semantics.
    */
  val a10Quantiles: QueryDef = QueryDef(
    "a10_quantiles",
    """SELECT l_returnflag,
      |       quantile_cont(l_quantity, 0.25) AS p25,
      |       quantile_cont(l_quantity, 0.5)  AS p50,
      |       quantile_cont(l_quantity, 0.9)  AS p90,
      |       count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { t =>
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        count(lit(1)).as("n"))
  }

  /** A11 — pivoted day × event-type matrix (the dashboard "wide" form
    * of the hourly/daily rollups): one hash aggregate with the pivot
    * values expanded as conditional sums — Spark's `pivot` with an
    * explicit value list plans exactly that, no per-column rescan and
    * no second shuffle. The value list is PINNED (the reference's
    * five funnel event types): an unpinned pivot first runs a
    * distinct-scan to discover columns — a schema decided by the data
    * is both a second pass over 100 TB and a drifting contract.
    * Money through exact cents.
    */
  val a11Pivot: QueryDef = QueryDef(
    "a11_pivot",
    """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
      |       CAST(sum(CASE WHEN event_type = 'view'     THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS view,
      |       CAST(sum(CASE WHEN event_type = 'click'    THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS click,
      |       CAST(sum(CASE WHEN event_type = 'signup'   THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS signup,
      |       CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS purchase,
      |       CAST(sum(CASE WHEN event_type = 'error'    THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS error
      |FROM events GROUP BY 1""".stripMargin) { t =>
    t.events
      .select(date_trunc("day", col("ts")).as("day"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("day"))
      .pivot("event_type", Seq("view", "click", "signup", "purchase", "error"))
      .agg(sum(col("cents")))
  }

  /** P14 — semi-structured (JSON) extraction: the `props` payload
    * column parsed per event and aggregated by type. At 100 TB the
    * discipline is parse-ONCE-per-row into typed columns at the
    * earliest stage (here: one `get_json_object` in the projection
    * feeding the aggregate, so the string never crosses a shuffle) —
    * never re-parse per downstream expression; an ingest pipeline
    * would materialize the typed column at write time and drop the
    * raw string from hot paths. The oracle uses TRY_CAST so a
    * malformed payload degrades to NULL like Spark's cast instead of
    * aborting the whole oracle query; a NON-INTEGRAL numeric `k` is
    * out of contract (the fixture emits integers) — there DuckDB
    * rounds where Spark truncates, so an ingest handling decimal
    * payloads must pin one rule explicitly.
    */
  val p14JsonExtract: QueryDef = QueryDef(
    "p14_json_extract",
    """SELECT event_type,
      |       count(*) AS n,
      |       count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
      |       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       CAST(max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY event_type""".stripMargin) { t =>
    t.events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(col("k_val")).as("n_with_k"),
        sum(col("k_val")).as("sum_k"),
        max(col("k_val")).as("max_k"))
  }

  /** A9b — CUBE grouping sets: the full (returnflag × linestatus)
    * lattice including BOTH one-dimension margins, where ROLLUP
    * ([[a9Rollup]]) drills only along its declared hierarchy. Same
    * single-pass shape — Spark expands the four grouping sets inside
    * one hash aggregate (no per-level rescan, no union of aggs) — and
    * the same exact-integer money discipline, because the margin rows
    * sum large slices of the table where double accumulation order
    * diverges across engines.
    */
  val a9Cube: QueryDef = QueryDef(
    "a9_cube",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(grouping(l_returnflag) + 2 * grouping(l_linestatus) AS INT) AS gid,
      |       count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin) { t =>
    t.lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) + lit(2) * grouping(col("l_linestatus")))
          .cast("int").as("gid"),
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
  }

  /** O3 — INTERSECT / EXCEPT set semantics (the §2.7 members O2's
    * UNION left out): user-days with a purchase AND an error, minus
    * user-days with a signup. Spark plans both as aggregated semi/anti joins on
    * the full row — distinct-by-key with map-side partial dedup, the
    * same scale shape as the UNION spine, never a sort.
    */
  val o3IntersectExcept: QueryDef = QueryDef(
    "o3_intersect_except",
    """(SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day
      | FROM events WHERE event_type = 'purchase'
      | INTERSECT
      | SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day
      | FROM events WHERE event_type = 'error')
      |EXCEPT
      |SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day
      |FROM events WHERE event_type = 'signup'""".stripMargin) { t =>
    def of(et: String) =
      t.events.filter(col("event_type") === et)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    of("purchase").intersect(of("error")).except(of("signup"))
  }

  /** J12 — band (range) join: each order priced against a static value
    * band (non-equi lower <= x < upper). The band table is definitionally
    * tiny (a pricing/tier sheet), so the right plan at ANY corpus scale
    * is a broadcast non-equi join — the fact side never shuffles and
    * the probe is a codegen'd comparison, not a cartesian expansion.
    * (A fact-to-fact range join would instead bucket both sides by
    * band-aligned keys — the interval-join operators J1/J11 carry that
    * shape; this row pins the broadcast-dim form.)
    */
  val j12BandJoin: QueryDef = QueryDef(
    "j12_band_join",
    """WITH bands(tier, lo, hi) AS (VALUES
      |  ('small',  0.0,      50000.0),
      |  ('mid',    50000.0,  150000.0),
      |  ('large',  150000.0, 1e18))
      |SELECT b.tier, count(*) AS n_orders,
      |       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
      |GROUP BY b.tier""".stripMargin) { t =>
    val spark = t.spark
    import spark.implicits._
    val bands = Seq(
      ("small", 0.0, 50000.0),
      ("mid", 50000.0, 150000.0),
      ("large", 150000.0, 1e18)).toDF("tier", "lo", "hi")
    t.orders
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
  }

  /** J13 — the fact-to-fact RANGE join, bucketed (the shape the
    * `j12_band_join` Scaladoc delegates to J1/J11 — pinned directly
    * here): for each purchase event, the platform-wide count of error
    * events in the preceding 30 minutes. No equality key exists, so
    * Spark's naive plan for the pure range predicate is a
    * BroadcastNestedLoopJoin — O(|P|·|E|) comparisons, the classic
    * 100 TB scale-killer. The bucketed rewrite derives one: both sides
    * key on `ts div W` (W = the band width), the bounded side explodes
    * into its own and the NEXT bucket (any interval of width W spans at
    * most two W-buckets, and each error matches a purchase bucket
    * through exactly ONE of the two copies — no dedup needed), and the
    * range check remains as a residual filter on a plain shuffled
    * equi-join. Cost: 2× the error rows shuffled, joins hash-local,
    * work ∝ matches — the standard interval-bucketing rewrite every
    * range-join engine (and J1's stream-stream interval join) uses
    * under the hood. The oracle states the UNREWRITTEN range join, so
    * the bucketing must be invisible row-for-row.
    */
  /** The bucketing-rewrite body of `j13_range_join_facts`, reusable so
    * the property spec can drive it with adversarial boundary-heavy
    * inputs: per probe row (event_id, p_us), count right rows whose
    * e_us ∈ (p_us − w, p_us] — via the band-keyed equi-join, never a
    * nested loop.
    */
  private[graft] def bucketedRangeCount(
      probes: org.apache.spark.sql.DataFrame,
      events: org.apache.spark.sql.DataFrame,
      w: Long): org.apache.spark.sql.DataFrame = {
    val p = probes.withColumn("bkt", expr(s"p_us div $w"))
    val e = events
      .select(explode(expr(s"array(e_us div $w, e_us div $w + 1)")).as("bkt"),
        col("e_us"))
    p.join(e,
        p("bkt") === e("bkt") &&
          col("e_us") > col("p_us") - w && col("e_us") <= col("p_us"),
        "left")
      .groupBy(col("event_id"))
      .agg(count(col("e_us")).as("n_recent_errors"))
  }

  val j13RangeJoinFacts: QueryDef = QueryDef(
    "j13_range_join_facts",
    """WITH p AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
      |           FROM events WHERE event_type = 'purchase'),
      |e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS e_us
      |      FROM events WHERE event_type = 'error')
      |SELECT p.event_id, CAST(count(e.e_us) AS BIGINT) AS n_recent_errors
      |FROM p LEFT JOIN e ON e.e_us > p.p_us - 1800000000 AND e.e_us <= p.p_us
      |GROUP BY p.event_id""".stripMargin) { t =>
    val W = 1800000000L // 30 min in µs — band width == lookback width
    bucketedRangeCount(
      t.events.filter(col("event_type") === "purchase")
        .select(col("event_id"), unix_micros(col("ts")).as("p_us")),
      t.events.filter(col("event_type") === "error")
        .select(unix_micros(col("ts")).as("e_us")),
      W)
  }

  /** A12 — second-moment statistics (covariance/correlation building
    * blocks) in EXACT integer form: per group the count n and the
    * power sums (Σx, Σy, Σxy, Σx², Σy²), and from them the integer covariance
    * and variance NUMERATORS n·Σxy − Σx·Σy etc. The five sums are the
    * canonical MERGEABLE PARTIAL of corr/cov — partials from disjoint
    * data ADD, which is both why Spark's map-side combine applies and
    * why a float `corr()` (whose accumulation order differs per
    * engine) can never be oracle-exact while this form is. The power
    * sums sxy/sxx/syy and every product-of-sums are both ACCUMULATED
    * and combined in 128-bit (DECIMAL(38,0) / HUGEINT) — syy adds
    * ~1e10 per row, so a 64-bit sum would silently wrap past ~9e8
    * rows, and n²·var(y) exceeds BIGINT from ~sf0.04 already. Every
    * 128-bit value is EMITTED as its canonical integer string (both
    * engines render DECIMAL(38,0)/HUGEINT as the same plain digits),
    * because wide-integer output types hash differently across
    * engines; the final float correlation, if a consumer wants it,
    * is one well-defined division of these exact integers.
    */
  val a12CorrExact: QueryDef = QueryDef(
    "a12_corr_exact",
    """WITH s AS (SELECT l_returnflag,
      |             count(*) AS n,
      |             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
      |             CAST(sum(CAST(round(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
      |             sum(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice) AS BIGINT)) AS sxy,
      |             sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
      |             sum(CAST(round(l_extendedprice) AS BIGINT) * CAST(round(l_extendedprice) AS BIGINT)) AS syy
      |           FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n, sx, sy,
      |       CAST(sxy AS VARCHAR) AS sxy,
      |       CAST(n::HUGEINT * sxy - sx::HUGEINT * sy AS VARCHAR) AS cov_num,
      |       CAST(n::HUGEINT * sxx - sx::HUGEINT * sx AS VARCHAR) AS varx_num,
      |       CAST(n::HUGEINT * syy - sy::HUGEINT * sy AS VARCHAR) AS vary_num
      |FROM s""".stripMargin) { t =>
    val x = col("l_quantity").cast("long")
    val y = round(col("l_extendedprice")).cast("long")
    val d128 = "decimal(38,0)"
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum((x * y).cast(d128)).as("sxy"),
        sum((x * x).cast(d128)).as("sxx"),
        sum((y * y).cast(d128)).as("syy"))
      .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
        col("sxy").cast("string").as("sxy"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS STRING)").as("cov_num"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS STRING)").as("varx_num"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS STRING)").as("vary_num"))
  }

  val all: Seq[QueryDef] = Seq(
    q1PricingSummary, p5RejectFilter, p8CurrencyCase, j5DimEnrich,
    j6MultikeyJoin, j9ExistsSemi, j10InSemi, a2FunnelCounts, a2FunnelOnepass,
    a3DedupGroupby, a4ConditionalDistinct, a5UnionSpine, a5SpineOnepass,
    u1Explode, u2NestedExplode, o1TopK, m3IncrementalAppend, a9Rollup,
    a9Cube, a9GroupingSets, a10Quantiles, a11Pivot, o3IntersectExcept, j12BandJoin,
    j13RangeJoinFacts,
    p14JsonExtract, a12CorrExact)
}

package graft.operators

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Time-bounded (interval) joins and the multi-stage funnel chain from
  * SURVEY.md §2.4 (J1–J4, J7, P13), batch form on `events`. The streaming
  * forms are graft.streaming.EventStreams.intervalJoinPairs /
  * leftIntervalJoinPairs (J1/J2) and graft.streaming.FunnelState (J3);
  * StreamingSpec asserts each equals its batch twin here row for row.
  *
  * Scale notes: each interval join is an equi join on `user_id` with the
  * time bound as a post-join range predicate — Spark shuffles both sides
  * by the equi key (hash join), so the range condition never degenerates
  * into a cartesian product. State at streaming runtime is bounded by the
  * same time bounds (reference funnel_jobs.sql:55-63: 5 s/10 s/60 s).
  */
object FunnelOps {

  /** J1/J2/J4 — interval join: clicks within 30 min of a view by the same
    * user (aggregation_jobs.sql:42-52), re-aggregated per user.
    */
  val j1IntervalJoin: QueryDef = QueryDef(
    "j1_interval_join",
    """WITH v AS (SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'),
      |     c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click')
      |SELECT v.user_id, count(*) AS n_pairs,
      |       round(sum(epoch_ms(c_ts) - epoch_ms(v_ts)) / 1000.0, 3) AS total_lag_s
      |FROM v JOIN c ON v.user_id = c.user_id
      |              AND c_ts >= v_ts AND c_ts <= v_ts + INTERVAL 30 MINUTE
      |GROUP BY v.user_id""".stripMargin) { t =>
    val ev = t.events
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"))
    v.join(c,
        col("user_id") === col("c_user_id") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(unix_millis(col("c_ts")) - unix_millis(col("v_ts"))) / 1000.0, 3)
          .as("total_lag_s"))
  }

  /** J2/J4 — the LEFT interval join in its batch form, oracle-checked:
    * every view row survives, matched to clicks within its 30-minute
    * window or to NULL. Counts are exact integers (rows, matches,
    * unmatched = rows − matches), so the cross-engine compare is
    * hash-stable. This closes the loop on the streaming twin: the
    * streamed [[graft.streaming.EventStreams.leftIntervalJoinPairs]]
    * is pinned row-equal to THIS batch form by StreamingSpec, and this
    * form is pinned value-equal to DuckDB — so the stream's outer-join
    * semantics (NULL emission after watermark) are transitively
    * oracle-checked. Equi-join on user_id with the time bound as a
    * residual: a hash join at any scale, never a range scan.
    */
  val j2LeftIntervalJoin: QueryDef = QueryDef(
    "j2_left_interval_join",
    """WITH v AS (SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'),
      |     c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click')
      |SELECT v.user_id,
      |       count(*) AS n_rows,
      |       count(c.c_ts) AS n_matched,
      |       count(*) - count(c.c_ts) AS n_unmatched_views
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |                   AND c_ts >= v_ts AND c_ts <= v_ts + INTERVAL 30 MINUTE
      |GROUP BY v.user_id""".stripMargin) { t =>
    val ev = t.events
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"))
    v.join(c,
        col("user_id") === col("c_user_id") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("c_ts")).as("n_matched"),
        (count(lit(1)) - count(col("c_ts"))).as("n_unmatched_views"))
  }

  /** J7/J3/P13 — 3-stage funnel chain with NULL-preserving left joins and
    * join-null stage flags (v_event_enriched_full_funnel.sql:72-84;
    * streaming twin funnel_jobs.sql:54-63): view →(≤30 min) click
    * →(≤2 h) purchase, then per-user distinct stage conversion counts
    * (reference counts 4 distincts at once, funnel_jobs.sql:32-35).
    */
  val j7FunnelChain: QueryDef = QueryDef(
    "j7_funnel_chain",
    """WITH v AS (SELECT user_id, event_id AS view_id, ts AS v_ts
      |           FROM events WHERE event_type = 'view'),
      |     c AS (SELECT user_id AS c_user_id, event_id AS click_id, ts AS c_ts
      |           FROM events WHERE event_type = 'click'),
      |     p AS (SELECT user_id AS p_user_id, event_id AS purchase_id, ts AS p_ts
      |           FROM events WHERE event_type = 'purchase')
      |SELECT user_id,
      |       count(DISTINCT view_id) AS n_views,
      |       count(DISTINCT CASE WHEN click_id    IS NOT NULL THEN view_id END) AS n_clicked_views,
      |       count(DISTINCT CASE WHEN purchase_id IS NOT NULL THEN view_id END) AS n_converted_views
      |FROM v
      |LEFT JOIN c ON user_id = c_user_id
      |            AND c_ts >= v_ts AND c_ts <= v_ts + INTERVAL 30 MINUTE
      |LEFT JOIN p ON user_id = p_user_id
      |            AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 2 HOUR
      |GROUP BY user_id""".stripMargin) { t =>
    val ev = t.events
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    funnelCountsSemi(v, c, p)
  }

  private def clickCond =
    col("user_id") === col("c_user_id") &&
      col("c_ts") >= col("v_ts") &&
      col("c_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES")

  private def purchaseCond =
    col("c_user_id") === col("p_user_id") &&
      col("p_ts") >= col("c_ts") &&
      col("p_ts") <= col("c_ts") + expr("INTERVAL 2 HOURS")

  private val ClickWindowMs = 30L * 60 * 1000
  private val PurchaseWindowMs = 2L * 3600 * 1000

  /** Hot-key-safe interval semi-join: keep each `left` row that has a
    * `right` row with the same user and rightTs ∈ [leftTs, leftTs + W].
    * The plain formulation equi-joins on the user alone, so ONE dense
    * key (a bot holding 10% of all events) lands on one task and pays a
    * per-key quadratic scan — measured on the 10×+hot probe: j3 36.4 s
    * vs 3.5 s benign, j7 24.0 s vs 1.7 s. Striping the key with the
    * window-width time bucket fixes both failure modes at once: the
    * right side is exploded to the (at most two) buckets whose left
    * rows it can serve (bucket b holds left ts ∈ [bW, (b+1)W); a right
    * row at rt serves left ts ∈ [rt−W, rt], which spans buckets
    * ⌊rt/W⌋−1 and ⌊rt/W⌋), the left side carries its single bucket, and
    * the join becomes an equi join on (user, bucket) with the range as
    * residual — the hot key spreads over span/W shuffle partitions and
    * every pair scan is bucket-bounded. The LEFT side is never exploded,
    * so the left-semi output needs no dedup pass. Same rewrite as j13's
    * fact-to-fact range join; SkewSpec + FunnelSkewSpec pin output
    * equality with the naive chained-join form on hot-key data.
    * (Fixed-duration windows under the UTC session make the
    * millisecond bucket arithmetic exactly the INTERVAL semantics.)
    */
  private def bucketedIntervalSemi(
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      leftUser: String, rightUser: String,
      leftTs: String, rightTs: String,
      windowMs: Long): org.apache.spark.sql.DataFrame = {
    val lb = left.withColumn("l_bkt",
      floor(unix_millis(col(leftTs)) / windowMs))
    val rBkt = floor(unix_millis(col(rightTs)) / windowMs)
    val rb = right.withColumn("r_bkt", explode(array(rBkt - 1, rBkt)))
    lb.join(rb,
        col(leftUser) === col(rightUser) && col("l_bkt") === col("r_bkt") &&
          col(rightTs) >= col(leftTs) &&
          unix_millis(col(rightTs)) <= unix_millis(col(leftTs)) + windowMs,
        "left_semi")
      .drop("l_bkt")
  }

  /** Skew-safe funnel counts: the naive chained LEFT joins materialize
    * views × clicks × purchases per user before the distinct-agg
    * collapses them — a power user with V·C·P in-window events is the
    * row explosion that kills the query at 100×. The distinct counts
    * only need EXISTENCE per stage, so each stage is a left-semi join
    * (emits each left row at most once, no product):
    *   clicked views     = v ⋉ c          (click within 30 min)
    *   converting clicks = c ⋉ p          (purchase within 2 h)
    *   converted views   = v ⋉ (c ⋉ p)    (via a converting click)
    * then three per-user aggregates merged on user_id. Identical output
    * to [[funnelCountsNaive]] (SkewSpec proves it on skewed data).
    */
  private[graft] def funnelCountsSemi(
      v: org.apache.spark.sql.DataFrame,
      c: org.apache.spark.sql.DataFrame,
      p: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val clickedViews = bucketedIntervalSemi(
      v, c, "user_id", "c_user_id", "v_ts", "c_ts", ClickWindowMs)
    val convertingClicks = bucketedIntervalSemi(
      c, p, "c_user_id", "p_user_id", "c_ts", "p_ts", PurchaseWindowMs)
    val convertedViews = bucketedIntervalSemi(
      v, convertingClicks, "user_id", "c_user_id", "v_ts", "c_ts", ClickWindowMs)
    val nv = v.groupBy(col("user_id"))
      .agg(countDistinct(col("view_id")).as("n_views"))
    val nc = clickedViews.groupBy(col("user_id"))
      .agg(countDistinct(col("view_id")).as("n_clicked_views"))
    val np = convertedViews.groupBy(col("user_id"))
      .agg(countDistinct(col("view_id")).as("n_converted_views"))
    nv.join(nc, Seq("user_id"), "left")
      .join(np, Seq("user_id"), "left")
      .select(col("user_id"), col("n_views"),
        coalesce(col("n_clicked_views"), lit(0L)).as("n_clicked_views"),
        coalesce(col("n_converted_views"), lit(0L)).as("n_converted_views"))
  }

  /** The reference-literal chained-join form (row-level fanout), kept
    * for the equivalence test — not used by any registered query.
    */
  private[graft] def funnelCountsNaive(
      v: org.apache.spark.sql.DataFrame,
      c: org.apache.spark.sql.DataFrame,
      p: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    v.join(c, clickCond, "left")
      .join(p, purchaseCond, "left")
      .groupBy(col("user_id"))
      .agg(
        countDistinct(col("view_id")).as("n_views"),
        countDistinct(when(col("click_id").isNotNull, col("view_id"))).as("n_clicked_views"),
        countDistinct(when(col("purchase_id").isNotNull, col("view_id"))).as("n_converted_views"))

  /** J3 — the FULL 4-stage funnel (reference chains
    * requests→responses→impressions→clicks, funnel_jobs.sql:54-63; on
    * the driver testdata the stages are signup →(≤7 d) view →(≤30 min)
    * click →(≤2 h) purchase). Same skew-safe shape as j7: existence per
    * stage via left-semi joins, never a chained-outer-join product.
    * The OpenRTB instantiation on generated nested data is
    * graft.rtb.RtbIngest.funnelHourly (RtbSpec checks it against the
    * generator's ground truth).
    */
  val j3Funnel4Stage: QueryDef = QueryDef(
    "j3_funnel_4stage",
    """WITH s AS (SELECT user_id, event_id AS signup_id, ts AS s_ts
      |           FROM events WHERE event_type = 'signup'),
      |     v AS (SELECT user_id AS v_user_id, event_id AS view_id, ts AS v_ts
      |           FROM events WHERE event_type = 'view'),
      |     c AS (SELECT user_id AS c_user_id, event_id AS click_id, ts AS c_ts
      |           FROM events WHERE event_type = 'click'),
      |     p AS (SELECT user_id AS p_user_id, event_id AS purchase_id, ts AS p_ts
      |           FROM events WHERE event_type = 'purchase')
      |SELECT user_id,
      |       count(DISTINCT signup_id) AS n_signups,
      |       count(DISTINCT CASE WHEN view_id     IS NOT NULL THEN signup_id END) AS n_viewed,
      |       count(DISTINCT CASE WHEN click_id    IS NOT NULL THEN signup_id END) AS n_clicked,
      |       count(DISTINCT CASE WHEN purchase_id IS NOT NULL THEN signup_id END) AS n_converted
      |FROM s
      |LEFT JOIN v ON user_id = v_user_id
      |            AND v_ts >= s_ts AND v_ts <= s_ts + INTERVAL 7 DAY
      |LEFT JOIN c ON v_user_id = c_user_id
      |            AND c_ts >= v_ts AND c_ts <= v_ts + INTERVAL 30 MINUTE
      |LEFT JOIN p ON c_user_id = p_user_id
      |            AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 2 HOUR
      |GROUP BY user_id""".stripMargin) { t =>
    val ev = t.events
    def stage(typ: String, user: String, id: String, ts: String) =
      ev.filter(col("event_type") === typ)
        .select(col("user_id").as(user), col("event_id").as(id), col("ts").as(ts))
    val s = stage("signup", "user_id", "signup_id", "s_ts")
    val v = stage("view", "user_id", "view_id", "v_ts")
    val c = stage("click", "c_user_id", "click_id", "c_ts")
    val p = stage("purchase", "p_user_id", "purchase_id", "p_ts")
    val SignupWindowMs = 7L * 86400 * 1000
    val clickedViews = bucketedIntervalSemi(
      v, c, "user_id", "c_user_id", "v_ts", "c_ts", ClickWindowMs)
    val convertingClicks = bucketedIntervalSemi(
      c, p, "c_user_id", "p_user_id", "c_ts", "p_ts", PurchaseWindowMs)
    val convertedViews = bucketedIntervalSemi(
      v, convertingClicks, "user_id", "c_user_id", "v_ts", "c_ts", ClickWindowMs)
    def vSide(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id").as("v_user_id"), col("v_ts"))
    def viewedWithin(stage: org.apache.spark.sql.DataFrame,
        views: org.apache.spark.sql.DataFrame) =
      bucketedIntervalSemi(stage, vSide(views),
        "user_id", "v_user_id", "s_ts", "v_ts", SignupWindowMs)
    val viewed = viewedWithin(s, v)
    val clicked = viewedWithin(s, clickedViews)
    val converted = viewedWithin(s, convertedViews)
    def cnt(df: org.apache.spark.sql.DataFrame, name: String) =
      df.groupBy(col("user_id")).agg(countDistinct(col("signup_id")).as(name))
    cnt(s, "n_signups")
      .join(cnt(viewed, "n_viewed"), Seq("user_id"), "left")
      .join(cnt(clicked, "n_clicked"), Seq("user_id"), "left")
      .join(cnt(converted, "n_converted"), Seq("user_id"), "left")
      .select(col("user_id"), col("n_signups"),
        coalesce(col("n_viewed"), lit(0L)).as("n_viewed"),
        coalesce(col("n_clicked"), lit(0L)).as("n_clicked"),
        coalesce(col("n_converted"), lit(0L)).as("n_converted"))
  }

  /** A6/P11 — funnel leakage metrics (funnel_jobs.sql:69-106): stage-count
    * differences and guarded conversion rates per day.
    */
  val a6FunnelLeakage: QueryDef = QueryDef(
    "a6_funnel_leakage",
    """WITH s AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |         count(CASE WHEN event_type = 'view'     THEN 1 END) AS views,
      |         count(CASE WHEN event_type = 'click'    THEN 1 END) AS clicks,
      |         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases
      |  FROM events GROUP BY 1)
      |SELECT day, views, clicks, purchases,
      |       views - clicks    AS view_to_click_loss,
      |       clicks - purchases AS click_to_purchase_loss,
      |       CASE WHEN views  > 0 THEN round(CAST(clicks AS DOUBLE) / views, 4)  ELSE 0.0 END AS click_rate,
      |       CASE WHEN clicks > 0 THEN round(CAST(purchases AS DOUBLE) / clicks, 4) ELSE 0.0 END AS purchase_rate
      |FROM s""".stripMargin) { t =>
    val s = t.events
      .groupBy(col("ts").cast("date").as("day"))
      .agg(
        count(when(col("event_type") === "view", 1)).as("views"),
        count(when(col("event_type") === "click", 1)).as("clicks"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"))
    s.select(
      col("day"), col("views"), col("clicks"), col("purchases"),
      (col("views") - col("clicks")).as("view_to_click_loss"),
      (col("clicks") - col("purchases")).as("click_to_purchase_loss"),
      when(col("views") > 0, round(col("clicks").cast("double") / col("views"), 4))
        .otherwise(0.0).as("click_rate"),
      when(col("clicks") > 0, round(col("purchases").cast("double") / col("clicks"), 4))
        .otherwise(0.0).as("purchase_rate"))
  }

  val all: Seq[QueryDef] =
    Seq(j1IntervalJoin, j2LeftIntervalJoin, j7FunnelChain, j3Funnel4Stage, a6FunnelLeakage)
}

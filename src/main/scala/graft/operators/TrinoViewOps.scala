package graft.operators

import graft.QueryDef
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The last six Trino views without a one-for-one named row — with these,
  * every file in `trino/sql/` has a literal oracle twin.
  *
  *  - `v_agg_bid_landscape` (v_agg_bid_landscape.sql): hourly auction
  *    landscape per publisher over the LANDED tables — per-bid
  *    bid_responses LEFT-joined to the clean PER-IMP bid_requests on
  *    request_id alone, so a multi-imp request fans out every one of
  *    its bids (the reference's real cardinality, preserved exactly —
  *    same discipline as qx12), then the `is_current` publisher dim.
  *  - `v_agg_funnel_leakage` (v_agg_funnel_leakage.sql): the raw-table
  *    funnel chain (NO interval bounds — unlike the Flink funnel job)
  *    emitting the three stage-loss counts and leakage rates; same
  *    chain and grain conventions as the `v_funnel_by_publisher` row.
  *  - `v_event_enriched_bid_responses` (…bid_responses.sql): the
  *    row-level per-bid stream enriched by its EIGHT DSP-hierarchy
  *    SCD2 dims with the dims' derived attributes (format, targeting
  *    type, budget, industry, holding company, deal type/floor…). The
  *    12-dim funnel-wide variant is `v_event_enriched_full_funnel`;
  *    this one pins the response-side view users query directly, and
  *    is where the dim ATTRIBUTE derivations are value-checked.
  *  - `v_realtime_bid_landscape_hourly` / `v_realtime_funnel_by_publisher`
  *    / `v_realtime_rolling_metrics_by_bidder` (v_realtime_agg_*.sql):
  *    the thin serving overlays — each Flink-written realtime table
  *    LEFT-joined to its `is_current` dim. The base-table definitions
  *    are shared verbatim with the rows that pin them
  *    ([[RtbOracleOps.vBidLandscapeHourly]]'s oracle SQL,
  *    [[DashboardOps.funnelTblSql]], [[DashboardOps.rollingTblSql]]) —
  *    one definition, two gates.
  *
  * Dim attributes are pure functions of the dim key (the fixture's
  * standing convention — `bidder_domain`, `publisher_vertical`, tier,
  * creative format all predate this file), NULL on a dim miss, rebuilt
  * identically by both engines from the same integer ranges.
  *
  * Scale shape: every dim join is a broadcast (dims are bounded); the
  * landscape/leakage aggregates shuffle once on their group keys; the
  * overlays add zero shuffles beyond their base table's own build.
  */
object TrinoViewOps {

  import RtbOracleOps.{root, ensureData, tsSql, rangeDim, rangeDimSql,
    creativeFormatSql, creativeFormatCol}

  // ---- derived dim attributes (pure functions of the key) ----

  private def enumSql(key: String, vals: Seq[String]): String =
    s"CASE WHEN $key IS NULL THEN NULL " +
      vals.zipWithIndex.map { case (v, i) =>
        s"WHEN $key % ${vals.size} = $i THEN '$v'" }.mkString(" ") + " END"

  private def enumCol(key: String, vals: Seq[String]): Column =
    vals.zipWithIndex.foldLeft(when(col(key).isNull, lit(null))) {
      case (c, (v, i)) => c.when(col(key) % vals.size === i, v)
    }

  private def verticalSql(key: String): String =
    s"""CASE WHEN $key IS NULL THEN NULL
       |     ELSE 'v' || CAST($key % 4 AS VARCHAR) END""".stripMargin

  private def verticalCol(key: String): Column =
    when(col(key).isNotNull, concat(lit("v"), (col(key) % 4).cast("string")))

  /** v_agg_bid_landscape.sql one-for-one. Money: avg through exact
    * cents; max is order-independent and stays raw.
    */
  val vAggBidLandscape: QueryDef = QueryDef(
    "v_agg_bid_landscape",
    s"""WITH dim_publisher AS (${rangeDimSql(30, "d_publisher_id", "publisher_name", "publisher")}),
       |respx AS (
       |  SELECT id AS response_id, ext['request_id'] AS request_id,
       |         $tsSql AS event_ts, unnest(seatbid) AS sb
       |  FROM (SELECT DISTINCT id, ext, seatbid, event_timestamp
       |        FROM read_parquet('$root/responses/*.parquet'))
       |),
       |resp AS (
       |  SELECT request_id, event_ts, unnest(sb['bid']) AS b FROM respx
       |),
       |brx AS (
       |  SELECT id, site, app, device, unnest(imp) AS imp_t
       |  FROM (SELECT DISTINCT id, imp, site, app, device, regs, "at",
       |               event_timestamp
       |        FROM read_parquet('$root/requests/*.parquet'))
       |),
       |br AS (
       |  SELECT id AS request_id,
       |         coalesce(site['publisher']['id'], app['publisher']['id'])
       |           AS publisher_id
       |  FROM brx
       |  WHERE coalesce(site['publisher']['id'], app['publisher']['id']) > 0
       |    AND device['ip'] NOT LIKE '10.%' AND device['ip'] NOT LIKE '192.168.%'
       |    AND device['ip'] NOT LIKE '172.16.%' AND device['ip'] NOT LIKE '172.2_.%'
       |    AND device['ip'] NOT LIKE '172.3_.%'
       |    AND imp_t['bidfloor'] > 0
       |),
       |j AS (
       |  SELECT resp.request_id, resp.event_ts, resp.b['price'] AS bid_price,
       |         br.publisher_id, dp.publisher_name, dp.d_publisher_id
       |  FROM resp
       |  LEFT JOIN br ON resp.request_id = br.request_id
       |  LEFT JOIN dim_publisher dp
       |    ON br.publisher_id = dp.d_publisher_id AND dp.is_current
       |)
       |SELECT date_trunc('hour', event_ts) AS hour_start,
       |       publisher_id, publisher_name,
       |       ${verticalSql("d_publisher_id")} AS publisher_vertical,
       |       count(DISTINCT request_id) AS request_count,
       |       count(*) AS total_bids,
       |       CASE WHEN count(DISTINCT request_id) > 0
       |            THEN CAST(count(*) AS DOUBLE) / count(DISTINCT request_id)
       |            ELSE 0.0 END AS bids_per_request,
       |       CAST(sum(CAST(round(bid_price * 100) AS BIGINT)) AS DOUBLE)
       |         / 100.0 / count(*) AS avg_bid_price,
       |       max(bid_price) AS max_bid_price
       |FROM j GROUP BY 1, 2, 3, 4""".stripMargin) { t =>
    ensureData(t.spark)
    val resp = ExampleQueryOps.bids(t.spark)
      .select(col("request_id"), col("event_ts"), col("bid_price"))
    val br = ExampleQueryOps.br(t.spark)
      .select(col("request_id").as("b_request_id"), col("publisher_id"))
    val dp = broadcast(
      rangeDim(t.spark, 30, "d_publisher_id", "publisher_name", "publisher")
        .filter(col("is_current")).drop("is_current"))
    resp
      .join(br, col("request_id") === col("b_request_id"), "left")
      .join(dp, col("publisher_id") === col("d_publisher_id"), "left")
      .groupBy(date_trunc("hour", col("event_ts")).as("hour_start"),
        col("publisher_id"), col("publisher_name"),
        verticalCol("d_publisher_id").as("publisher_vertical"))
      .agg(
        countDistinct(col("request_id")).as("request_count"),
        count(lit(1)).as("total_bids"),
        when(countDistinct(col("request_id")) > 0,
          count(lit(1)).cast("double") / countDistinct(col("request_id")))
          .otherwise(0.0).as("bids_per_request"),
        (sum(round(col("bid_price") * 100).cast("long")).cast("double") / 100.0
          / count(lit(1))).as("avg_bid_price"),
        max(col("bid_price")).as("max_bid_price"))
  }

  /** v_agg_funnel_leakage.sql one-for-one — same chain conventions as
    * the `v_funnel_by_publisher` row, leakage outputs.
    */
  val vAggFunnelLeakage: QueryDef = QueryDef(
    "v_agg_funnel_leakage",
    s"""WITH dim_publisher AS (${rangeDimSql(30, "d_publisher_id", "publisher_name", "publisher")}),
       |br AS (SELECT id AS request_id,
       |              coalesce(site['publisher']['id'], app['publisher']['id']) AS publisher_id,
       |              $tsSql AS event_ts
       |       FROM read_parquet('$root/requests/*.parquet')),
       |resp AS (SELECT id AS response_id, ext['request_id'] AS request_id
       |         FROM read_parquet('$root/responses/*.parquet')),
       |imp AS (SELECT impression_id, response_id
       |        FROM read_parquet('$root/impressions/*.parquet')),
       |cl AS (SELECT click_id, impression_id
       |       FROM read_parquet('$root/clicks/*.parquet')),
       |j AS (
       |  SELECT br.event_ts, br.publisher_id, br.request_id,
       |         resp.response_id, imp.impression_id, cl.click_id,
       |         dp.publisher_name, dp.d_publisher_id
       |  FROM br
       |  LEFT JOIN resp ON br.request_id = resp.request_id
       |  LEFT JOIN imp ON resp.response_id = imp.response_id
       |  LEFT JOIN cl ON imp.impression_id = cl.impression_id
       |  LEFT JOIN dim_publisher dp
       |    ON br.publisher_id = dp.d_publisher_id AND dp.is_current)
       |SELECT date_trunc('hour', event_ts) AS hour_start,
       |       publisher_id, publisher_name,
       |       ${verticalSql("d_publisher_id")} AS publisher_vertical,
       |       count(DISTINCT request_id) - count(DISTINCT response_id)
       |         AS requests_no_response,
       |       count(DISTINCT response_id) - count(DISTINCT impression_id)
       |         AS responses_no_impression,
       |       count(DISTINCT impression_id) - count(DISTINCT click_id)
       |         AS impressions_no_click,
       |       CASE WHEN count(DISTINCT request_id) > 0
       |            THEN CAST(count(DISTINCT request_id)
       |                      - count(DISTINCT response_id) AS DOUBLE)
       |                 / count(DISTINCT request_id)
       |            ELSE 0.0 END AS response_leakage_rate,
       |       CASE WHEN count(DISTINCT response_id) > 0
       |            THEN CAST(count(DISTINCT response_id)
       |                      - count(DISTINCT impression_id) AS DOUBLE)
       |                 / count(DISTINCT response_id)
       |            ELSE 0.0 END AS impression_leakage_rate,
       |       CASE WHEN count(DISTINCT impression_id) > 0
       |            THEN CAST(count(DISTINCT impression_id)
       |                      - count(DISTINCT click_id) AS DOUBLE)
       |                 / count(DISTINCT impression_id)
       |            ELSE 0.0 END AS click_leakage_rate
       |FROM j GROUP BY 1, 2, 3, 4""".stripMargin) { t =>
    ensureData(t.spark)
    val br = RtbOracleOps.slice(t.spark, "requests")
      .select(col("id").as("request_id"),
        coalesce(col("site.publisher.id"), col("app.publisher.id")).as("publisher_id"),
        graft.rtb.RtbIngest.parseTs(col("event_timestamp")).as("event_ts"))
    val resp = RtbOracleOps.slice(t.spark, "responses")
      .select(col("id").as("response_id"), col("ext.request_id").as("r_request_id"))
    val imp = RtbOracleOps.slice(t.spark, "impressions")
      .select(col("impression_id"), col("response_id").as("i_response_id"))
    val cl = RtbOracleOps.slice(t.spark, "clicks")
      .select(col("click_id"), col("impression_id").as("c_impression_id"))
    val dp = broadcast(
      rangeDim(t.spark, 30, "d_publisher_id", "publisher_name", "publisher")
        .filter(col("is_current")).drop("is_current"))
    def d(a: Column, b: Column): Column = a - b
    val rq = countDistinct(col("request_id"))
    val rs = countDistinct(col("response_id"))
    val im = countDistinct(col("impression_id"))
    val ck = countDistinct(col("click_id"))
    br
      .join(resp, col("request_id") === col("r_request_id"), "left")
      .join(imp, col("response_id") === col("i_response_id"), "left")
      .join(cl, col("impression_id") === col("c_impression_id"), "left")
      .join(dp, col("publisher_id") === col("d_publisher_id"), "left")
      .groupBy(date_trunc("hour", col("event_ts")).as("hour_start"),
        col("publisher_id"), col("publisher_name"),
        verticalCol("d_publisher_id").as("publisher_vertical"))
      .agg(
        d(rq, rs).as("requests_no_response"),
        d(rs, im).as("responses_no_impression"),
        d(im, ck).as("impressions_no_click"),
        when(rq > 0, d(rq, rs).cast("double") / rq).otherwise(0.0)
          .as("response_leakage_rate"),
        when(rs > 0, d(rs, im).cast("double") / rs).otherwise(0.0)
          .as("impression_leakage_rate"),
        when(im > 0, d(im, ck).cast("double") / im).otherwise(0.0)
          .as("click_leakage_rate"))
  }

  // ---- v_event_enriched_bid_responses: 8 dims with attributes ----

  private case class Dim(cte: String, n: Int, key: String, label: String,
      prefix: String, factKey: String)

  private val respDims = Seq(
    Dim("dim_bidder", 25, "d_bidder_id", "bidder_name", "bidder", "seat"),
    Dim("dim_creative", 200, "d_creative_id", "creative_name", "creative", "creative_id"),
    Dim("dim_strategy", 180, "d_strategy_id", "strategy_name", "strategy", "strategy_id"),
    Dim("dim_line_item", 120, "d_line_item_id", "line_item_name", "lineitem", "line_item_id"),
    Dim("dim_campaign", 60, "d_campaign_id", "campaign_name", "campaign", "campaign_id"),
    Dim("dim_advertiser", 20, "d_advertiser_id", "advertiser_name", "advertiser", "advertiser_id"),
    Dim("dim_agency", 5, "d_agency_id", "agency_name", "agency", "agency_id"),
    Dim("dim_deal", 40, "d_deal_id", "deal_name", "deal", "deal_id"))

  private val targetingTypes = Seq("contextual", "behavioral", "geo", "retargeting")
  private val channels = Seq("display", "video", "native", "audio")
  private val bidStrategies = Seq("cpc", "cpm", "cpa")
  private val objectives = Seq("awareness", "conversion", "traffic")
  private val industries = Seq("retail", "auto", "tech", "cpg", "finance")
  private val dealTypes = Seq("PMP", "PG", "preferred")

  /** v_event_enriched_bid_responses.sql one-for-one: the per-bid stream
    * × 8 `is_current` DSP dims, attributes included. `bid_price` passes
    * through raw per row (bit-identical); `budget` and
    * `deal_floor_price` are integer-derived doubles (exact).
    */
  val vEventEnrichedBidResponses: QueryDef = QueryDef(
    "v_event_enriched_bid_responses", {
      val dimCtes = respDims.map(dm =>
        s"${dm.cte} AS (${rangeDimSql(dm.n, dm.key, dm.label, dm.prefix)})")
        .mkString(",\n")
      val joins = respDims.map(dm =>
        s"LEFT JOIN ${dm.cte} ON b.${dm.factKey} = ${dm.cte}.${dm.key} AND ${dm.cte}.is_current")
        .mkString("\n")
      s"""WITH $dimCtes,
         |s AS (
         |  SELECT id AS response_id, ext['request_id'] AS request_id,
         |         cur AS currency, $tsSql AS event_ts, unnest(seatbid) AS sb
         |  FROM (SELECT DISTINCT id, ext, cur, seatbid, event_timestamp
         |        FROM read_parquet('$root/responses/*.parquet'))
         |),
         |eb AS (
         |  SELECT response_id, request_id, currency, event_ts,
         |         sb['seat'] AS seat, unnest(sb['bid']) AS bid
         |  FROM s
         |),
         |b AS (
         |  SELECT response_id, request_id, currency, event_ts, seat,
         |         bid['id'] AS bid_id, bid['impid'] AS imp_id,
         |         bid['price'] AS bid_price, bid['crid'] AS creative_id,
         |         bid['adomain'][1] AS ad_domain, bid['dealid'] AS deal_id,
         |         bid['campaign_id'] AS campaign_id,
         |         bid['line_item_id'] AS line_item_id,
         |         bid['strategy_id'] AS strategy_id,
         |         bid['advertiser_id'] AS advertiser_id,
         |         bid['agency_id'] AS agency_id
         |  FROM eb
         |)
         |SELECT b.response_id, b.request_id, b.seat, bidder_name,
         |       b.bid_id, b.imp_id, b.bid_price,
         |       b.creative_id, creative_name,
         |       ${creativeFormatSql("d_creative_id")} AS creative_format,
         |       CASE WHEN d_creative_id IS NULL THEN NULL
         |            ELSE 100 + (d_creative_id % 8) * 50 END AS creative_width,
         |       CASE WHEN d_creative_id IS NULL THEN NULL
         |            ELSE 50 + (d_creative_id % 6) * 50 END AS creative_height,
         |       b.strategy_id, strategy_name,
         |       ${enumSql("d_strategy_id", targetingTypes)} AS targeting_type,
         |       ${enumSql("d_strategy_id", channels)} AS channel,
         |       b.line_item_id, line_item_name,
         |       CASE WHEN d_line_item_id IS NULL THEN NULL
         |            ELSE CAST(1000 * (1 + d_line_item_id % 50) AS DOUBLE)
         |       END AS budget,
         |       ${enumSql("d_line_item_id", bidStrategies)} AS bid_strategy,
         |       b.campaign_id, campaign_name,
         |       ${enumSql("d_campaign_id", objectives)} AS campaign_objective,
         |       b.advertiser_id, advertiser_name,
         |       ${enumSql("d_advertiser_id", industries)} AS industry,
         |       b.agency_id, agency_name,
         |       CASE WHEN d_agency_id IS NULL THEN NULL
         |            ELSE 'holdco-' || CAST(1 + d_agency_id % 3 AS VARCHAR)
         |       END AS holding_company,
         |       b.deal_id, deal_name,
         |       ${enumSql("d_deal_id", dealTypes)} AS deal_type,
         |       CASE WHEN d_deal_id IS NULL THEN NULL
         |            ELSE CAST(d_deal_id * 25 AS DOUBLE) / 100.0
         |       END AS deal_floor_price,
         |       b.ad_domain, b.currency, b.event_ts
         |FROM b
         |$joins""".stripMargin
    }) { t =>
    ensureData(t.spark)
    val base = ExampleQueryOps.bids(t.spark)
      .withColumnRenamed("bidder_id", "seat")
    val enrichedAll = respDims.foldLeft(base) { (df, dm) =>
      df.join(broadcast(rangeDim(t.spark, dm.n, dm.key, dm.label, dm.prefix)
        .filter(col("is_current")).drop("is_current")),
        col(dm.factKey) === col(dm.key), "left")
    }
    enrichedAll.select(
      col("response_id"), col("request_id"), col("seat"), col("bidder_name"),
      col("bid_id"), col("imp_id"), col("bid_price"),
      col("creative_id"), col("creative_name"),
      creativeFormatCol("d_creative_id").as("creative_format"),
      when(col("d_creative_id").isNotNull,
        lit(100) + (col("d_creative_id") % 8) * 50).as("creative_width"),
      when(col("d_creative_id").isNotNull,
        lit(50) + (col("d_creative_id") % 6) * 50).as("creative_height"),
      col("strategy_id"), col("strategy_name"),
      enumCol("d_strategy_id", targetingTypes).as("targeting_type"),
      enumCol("d_strategy_id", channels).as("channel"),
      col("line_item_id"), col("line_item_name"),
      when(col("d_line_item_id").isNotNull,
        (lit(1000) * (lit(1) + col("d_line_item_id") % 50)).cast("double"))
        .as("budget"),
      enumCol("d_line_item_id", bidStrategies).as("bid_strategy"),
      col("campaign_id"), col("campaign_name"),
      enumCol("d_campaign_id", objectives).as("campaign_objective"),
      col("advertiser_id"), col("advertiser_name"),
      enumCol("d_advertiser_id", industries).as("industry"),
      col("agency_id"), col("agency_name"),
      when(col("d_agency_id").isNotNull,
        concat(lit("holdco-"), (lit(1) + col("d_agency_id") % 3).cast("string")))
        .as("holding_company"),
      col("deal_id"), col("deal_name"),
      enumCol("d_deal_id", dealTypes).as("deal_type"),
      when(col("d_deal_id").isNotNull,
        (col("d_deal_id") * 25).cast("double") / 100.0).as("deal_floor_price"),
      col("ad_domain"), col("currency"), col("event_ts"))
  }

  // ---- the three v_realtime_agg_* overlays ----

  /** v_realtime_agg_bid_landscape_hourly.sql one-for-one: the Flink
    * `bid_landscape_hourly` table (the `v_bid_landscape_hourly` row's
    * oracle SQL, verbatim as a CTE) + the `is_current` publisher dim.
    */
  val vRealtimeBidLandscapeHourly: QueryDef = QueryDef(
    "v_realtime_bid_landscape_hourly",
    s"""WITH dim_publisher AS (${rangeDimSql(30, "d_publisher_id", "publisher_name", "publisher")}),
       |base AS (${RtbOracleOps.vBidLandscapeHourly.oracle.get})
       |SELECT base.window_start, base.publisher_id,
       |       dp.publisher_name,
       |       ${verticalSql("dp.d_publisher_id")} AS publisher_vertical,
       |       base.request_count, base.total_bids, base.bids_per_request,
       |       base.avg_bid_price, base.max_bid_price
       |FROM base
       |LEFT JOIN dim_publisher dp
       |  ON base.publisher_id = dp.d_publisher_id AND dp.is_current""".stripMargin) { t =>
    val base = RtbOracleOps.vBidLandscapeHourly.run(t.spark, t.dir)
    val dp = broadcast(
      rangeDim(t.spark, 30, "d_publisher_id", "publisher_name", "publisher")
        .filter(col("is_current")).drop("is_current"))
    base.join(dp, col("publisher_id") === col("d_publisher_id"), "left")
      .select(col("window_start"), col("publisher_id"), col("publisher_name"),
        verticalCol("d_publisher_id").as("publisher_vertical"),
        col("request_count"), col("total_bids"), col("bids_per_request"),
        col("avg_bid_price"), col("max_bid_price"))
  }

  /** v_realtime_agg_hourly_funnel_by_publisher.sql one-for-one: the
    * Flink `hourly_funnel_by_publisher` table
    * ([[DashboardOps.funnelTblSql]] + the table's guarded rates,
    * funnel_jobs.sql:37-53) + publisher dim with vertical and tier.
    */
  val vRealtimeFunnelByPublisher: QueryDef = QueryDef(
    "v_realtime_funnel_by_publisher", {
      def rateSql(num: String, den: String) =
        s"""CASE WHEN $den > 0
           |     THEN CAST($num AS DOUBLE) / CAST($den AS DOUBLE)
           |     ELSE 0.0 END""".stripMargin
      s"""WITH ${DashboardOps.funnelTblSql},
         |dim_publisher AS (${rangeDimSql(30, "d_publisher_id", "publisher_name", "publisher")})
         |SELECT tbl.window_start, tbl.publisher_id,
         |       dp.publisher_name,
         |       ${verticalSql("dp.d_publisher_id")} AS publisher_vertical,
         |       CASE WHEN dp.d_publisher_id IS NULL THEN NULL
         |            ELSE 1 + dp.d_publisher_id % 3 END AS publisher_tier,
         |       tbl.bid_requests, tbl.bid_responses, tbl.impressions,
         |       tbl.clicks,
         |       ${rateSql("tbl.bid_responses", "tbl.bid_requests")} AS fill_rate,
         |       ${rateSql("tbl.impressions", "tbl.bid_responses")} AS win_rate,
         |       ${rateSql("tbl.clicks", "tbl.impressions")} AS ctr
         |FROM tbl
         |LEFT JOIN dim_publisher dp
         |  ON tbl.publisher_id = dp.d_publisher_id AND dp.is_current""".stripMargin
    }) { t =>
    RtbOracleOps.ensureData(t.spark)
    def rate(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double")).otherwise(0.0)
    val dp = broadcast(
      rangeDim(t.spark, 30, "d_publisher_id", "publisher_name", "publisher")
        .filter(col("is_current")).drop("is_current"))
    DashboardOps.funnelTbl(t.spark)
      .join(dp, col("publisher_id") === col("d_publisher_id"), "left")
      .select(col("window_start"), col("publisher_id"), col("publisher_name"),
        verticalCol("d_publisher_id").as("publisher_vertical"),
        when(col("d_publisher_id").isNotNull, lit(1) + col("d_publisher_id") % 3)
          .as("publisher_tier"),
        col("bid_requests"), col("bid_responses"), col("impressions"),
        col("clicks"),
        rate(col("bid_responses"), col("bid_requests")).as("fill_rate"),
        rate(col("impressions"), col("bid_responses")).as("win_rate"),
        rate(col("clicks"), col("impressions")).as("ctr"))
  }

  /** v_realtime_agg_rolling_metrics_by_bidder.sql one-for-one: the
    * Flink `rolling_metrics_by_bidder` table
    * ([[DashboardOps.rollingTblSql]] + revenue/avg_cpm in the suite's
    * exact-cents forms) + bidder dim with the derived domain.
    */
  val vRealtimeRollingMetricsByBidder: QueryDef = QueryDef(
    "v_realtime_rolling_metrics_by_bidder",
    s"""WITH ${DashboardOps.rollingTblSql},
       |dim_bidder AS (${rangeDimSql(25, "d_bidder_id", "bidder_name", "bidder")})
       |SELECT tbl.window_start, tbl.window_end, tbl.bidder_id,
       |       db.bidder_name,
       |       CASE WHEN db.d_bidder_id IS NULL THEN NULL
       |            ELSE 'dsp-' || CAST(db.d_bidder_id AS VARCHAR) || '.example.com'
       |       END AS bidder_domain,
       |       tbl.win_count,
       |       CAST(tbl.revenue_cents AS DOUBLE) / 100.0 AS revenue,
       |       CAST((2 * tbl.revenue_cents + tbl.win_count)
       |            // (2 * tbl.win_count) AS DOUBLE) / 100.0 AS avg_cpm
       |FROM tbl
       |LEFT JOIN dim_bidder db
       |  ON tbl.bidder_id = db.d_bidder_id AND db.is_current""".stripMargin) { t =>
    RtbOracleOps.ensureData(t.spark)
    val db = broadcast(
      rangeDim(t.spark, 25, "d_bidder_id", "bidder_name", "bidder")
        .filter(col("is_current")).drop("is_current"))
    DashboardOps.rollingTbl(t.spark)
      .join(db, col("bidder_id") === col("d_bidder_id"), "left")
      .select(col("window_start"), col("window_end"), col("bidder_id"),
        col("bidder_name"),
        when(col("d_bidder_id").isNotNull,
          concat(lit("dsp-"), col("d_bidder_id").cast("string"),
            lit(".example.com"))).as("bidder_domain"),
        col("win_count"),
        (col("revenue_cents").cast("double") / 100.0).as("revenue"),
        expr("""CAST((2 * revenue_cents + win_count) DIV (2 * win_count)
                AS DOUBLE) / 100.0""").as("avg_cpm"))
  }

  // ---- v_event_enriched_bid_requests: the supply-side enriched view ----

  private val pubVerticals = Seq("News", "Entertainment", "Sports", "Tech",
    "Finance", "Lifestyle", "Health", "Education", "Travel", "Automotive")
  private val pubTiers = Seq("premium", "mid-tier", "long-tail")

  /** v_event_enriched_bid_requests.sql one-for-one: the CLEAN landed
    * bid_requests grain (insert_jobs.sql:17-62 — the same `br` CTE the
    * qx example-query rows pin) LEFT joined to its four `is_current`
    * supply-side SCD2 dims, projecting the reference's exact column
    * list (v_event_enriched_bid_requests.sql:3-43). Dim content is the
    * reference's own seed where the fixture's keys align —
    * dim_publisher carries dimension_mapping.py:312-319 verbatim
    * (vertical = VERTICALS[(id-1) % 10], tier = TIERS[(id-1) % 3],
    * name = '<vertical> Publisher <id>'), dim_device_type and
    * dim_device_os are the LITERAL 4-row seed tables
    * (dimension_mapping.py:130-142) — so the generator's device types
    * 3/5/6 and its 'Linux' OS genuinely MISS and surface the
    * reference's real NULL-attribute behavior. dim_geo keeps the
    * fixture's own 8-country × 20-region grid (the reference seeds
    * 3-letter ISO codes its generator never emits, which would
    * NULL-out the whole multi-key join): country_name / region_name /
    * timezone are pure key functions per the fixture dim convention.
    * Every third key also carries a non-current '-old' SCD2 row, so a
    * dropped `is_current` predicate changes values, not just plans.
    *
    * Scale shape: a pure per-row view — scan + FOUR broadcast hash
    * joins (one multi-key), zero shuffles at any fact size; the widest
    * supply-side projection stays one WholeStageCodegen span.
    */
  val vEventEnrichedBidRequests: QueryDef = QueryDef(
    "v_event_enriched_bid_requests", {
      val vertsSql = pubVerticals.map("'" + _ + "'").mkString(", ")
      val tiersSql = pubTiers.map("'" + _ + "'").mkString(", ")
      s"""${ExampleQueryOps.brSql},
         |pub AS (
         |  SELECT pid,
         |         ([$vertsSql])[(pid - 1) % 10 + 1] AS v,
         |         ([$tiersSql])[(pid - 1) % 3 + 1] AS tier
         |  FROM (SELECT unnest(generate_series(1, 30)) AS pid)),
         |dim_publisher AS (
         |  SELECT pid AS d_publisher_id,
         |         v || ' Publisher ' || CAST(pid AS VARCHAR) AS publisher_name,
         |         v AS publisher_vertical, tier AS publisher_tier,
         |         true AS is_current
         |  FROM pub
         |  UNION ALL
         |  SELECT pid, v || ' Publisher ' || CAST(pid AS VARCHAR) || '-old',
         |         v, tier, false
         |  FROM pub WHERE pid % 3 = 0),
         |dim_device_type AS (
         |  SELECT * FROM (VALUES
         |    (1, 'Mobile/Tablet', 'tablet', true, true),
         |    (2, 'Personal Computer', 'desktop', false, true),
         |    (4, 'Phone', 'phone', true, true),
         |    (7, 'Set Top Box', 'stb', false, true),
         |    (1, 'Mobile/Tablet-old', 'tablet', true, false))
         |    AS t(device_type_code, device_type_name, form_factor,
         |         is_mobile, is_current)),
         |dim_device_os AS (
         |  SELECT * FROM (VALUES
         |    ('iOS', 'Apple', true), ('Android', 'Google', true),
         |    ('Windows', 'Microsoft', true), ('macOS', 'Apple', true),
         |    ('iOS', 'Apple-old', false))
         |    AS t(os_name, os_vendor, is_current)),
         |geo AS (
         |  SELECT c, r
         |  FROM (SELECT unnest(['US','GB','DE','FR','JP','BR','IN','CA']) AS c),
         |       (SELECT unnest(generate_series(0, 19)) AS r)),
         |dim_geo AS (
         |  SELECT c AS country_code, c || '-' || CAST(r AS VARCHAR) AS region_code,
         |         'country-' || c AS country_name,
         |         'region-' || c || '-' || CAST(r AS VARCHAR) AS region_name,
         |         'tz-' || CAST(r % 12 AS VARCHAR) AS "timezone",
         |         true AS is_current
         |  FROM geo
         |  UNION ALL
         |  SELECT c, c || '-' || CAST(r AS VARCHAR), 'country-' || c,
         |         'region-' || c || '-' || CAST(r AS VARCHAR) || '-old',
         |         'tz-' || CAST(r % 12 AS VARCHAR), false
         |  FROM geo WHERE r % 3 = 0)
         |SELECT br.request_id, br.imp_id, br.imp_banner_w, br.imp_banner_h,
         |       br.imp_bidfloor, br.site_id, br.site_domain,
         |       br.publisher_id, dp.publisher_name, dp.publisher_vertical,
         |       dp.publisher_tier,
         |       br.device_type, ddt.device_type_name, ddt.form_factor,
         |       ddt.is_mobile,
         |       br.device_os, dos.os_vendor,
         |       br.device_geo_country, br.device_geo_region,
         |       dg.country_name, dg.region_name, dg."timezone",
         |       br.user_id, br.auction_type, br.tmax, br.currency,
         |       br.is_coppa, br.is_gdpr, br.event_ts, br.received_ts
         |FROM br
         |LEFT JOIN dim_publisher dp
         |  ON br.publisher_id = dp.d_publisher_id AND dp.is_current
         |LEFT JOIN dim_device_type ddt
         |  ON br.device_type = ddt.device_type_code AND ddt.is_current
         |LEFT JOIN dim_device_os dos
         |  ON br.device_os = dos.os_name AND dos.is_current
         |LEFT JOIN dim_geo dg
         |  ON br.device_geo_country = dg.country_code
         |  AND br.device_geo_region = dg.region_code AND dg.is_current""".stripMargin
    }) { t =>
    RtbOracleOps.ensureData(t.spark)
    val s = t.spark
    def cur(df: DataFrame) =
      broadcast(df.filter(col("is_current")).drop("is_current"))
    val pub = s.range(1, 31)
      .select(col("id").cast("int").as("d_publisher_id"))
      .withColumn("publisher_vertical",
        element_at(array(pubVerticals.map(lit): _*),
          ((col("d_publisher_id") - 1) % 10 + 1).cast("int")))
      .withColumn("publisher_tier",
        element_at(array(pubTiers.map(lit): _*),
          ((col("d_publisher_id") - 1) % 3 + 1).cast("int")))
      .withColumn("publisher_name",
        concat(col("publisher_vertical"), lit(" Publisher "),
          col("d_publisher_id").cast("string")))
    val dimPub = pub.withColumn("is_current", lit(true))
      .unionByName(pub.filter(col("d_publisher_id") % 3 === 0)
        .withColumn("publisher_name", concat(col("publisher_name"), lit("-old")))
        .withColumn("is_current", lit(false)))
    val dimDt = s.createDataFrame(Seq(
      (1, "Mobile/Tablet", "tablet", true, true),
      (2, "Personal Computer", "desktop", false, true),
      (4, "Phone", "phone", true, true),
      (7, "Set Top Box", "stb", false, true),
      (1, "Mobile/Tablet-old", "tablet", true, false)))
      .toDF("device_type_code", "device_type_name", "form_factor",
        "is_mobile", "is_current")
    val dimOs = s.createDataFrame(Seq(
      ("iOS", "Apple", true), ("Android", "Google", true),
      ("Windows", "Microsoft", true), ("macOS", "Apple", true),
      ("iOS", "Apple-old", false)))
      .toDF("os_name", "os_vendor", "is_current")
    val geo = s.createDataFrame(
      for (c <- Seq("US", "GB", "DE", "FR", "JP", "BR", "IN", "CA");
           r <- 0 until 20)
        yield (c, s"$c-$r", s"country-$c", s"region-$c-$r", s"tz-${r % 12}"))
      .toDF("country_code", "region_code", "country_name", "region_name",
        "timezone")
    val dimGeo = geo.withColumn("is_current", lit(true))
      .unionByName(geo
        .filter(expr("CAST(split(region_code, '-')[1] AS INT) % 3 = 0"))
        .withColumn("region_name", concat(col("region_name"), lit("-old")))
        .withColumn("is_current", lit(false)))
    ExampleQueryOps.br(s)
      .join(cur(dimPub), col("publisher_id") === col("d_publisher_id"), "left")
      .join(cur(dimDt), col("device_type") === col("device_type_code"), "left")
      .join(cur(dimOs), col("device_os") === col("os_name"), "left")
      .join(cur(dimGeo),
        col("device_geo_country") === col("country_code") &&
          col("device_geo_region") === col("region_code"), "left")
      .select(col("request_id"), col("imp_id"), col("imp_banner_w"),
        col("imp_banner_h"), col("imp_bidfloor"),
        col("property_id").as("site_id"),
        col("property_domain").as("site_domain"),
        col("publisher_id"), col("publisher_name"), col("publisher_vertical"),
        col("publisher_tier"),
        col("device_type"), col("device_type_name"), col("form_factor"),
        col("is_mobile"),
        col("device_os"), col("os_vendor"),
        col("device_geo_country"), col("device_geo_region"),
        col("country_name"), col("region_name"), col("timezone"),
        col("user_id"), col("auction_type"), col("tmax"), col("currency"),
        col("is_coppa"), col("is_gdpr"), col("event_ts"), col("received_ts"))
  }

  val all: Seq[QueryDef] = Seq(
    vAggBidLandscape, vAggFunnelLeakage, vEventEnrichedBidResponses,
    vEventEnrichedBidRequests,
    vRealtimeBidLandscapeHourly, vRealtimeFunnelByPublisher,
    vRealtimeRollingMetricsByBidder)
}

package graft.operators

import graft.QueryDef
import graft.rtb.RtbIngest
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's two data-quality tables, one-for-one on the RTB
  * fixture — the last two Flink insert targets without a named row.
  *
  *  - `dq_rejected_events` (insert_jobs.sql:135-173): the row-level
  *    rejected stream — per-imp rows failing the ingestion gate,
  *    persisted with their reason for audit. Note the reference's OWN
  *    asymmetry, preserved literally: the gate here is
  *    `publisher_id < 0` where `bid_requests_enriched` flags
  *    `<= 0` as test traffic, and the private-IP LIKE list is the dq
  *    job's fuller spelling (172.16-19/2x/30/31) where the clean-insert
  *    uses the 3-pattern shorthand. Both engines state the dq variant.
  *  - `dq_event_quality_hourly` (aggregation_jobs.sql:84-226): the ONE
  *    table computed over the RAW duplicated streams — total vs
  *    DISTINCT-id counts per stream per hour on a UNION window spine
  *    (the A5 shape), duplicate/invalid rates, and the all-stream
  *    rollup. On the shared fixture this directly measures the 3%
  *    injected re-deliveries the other oracle rows dedup away, so it is
  *    the row that would catch a silently-lost duplicate in the
  *    fixture's replay path.
  *
  * No stream is deduplicated anywhere in this file — these tables exist
  * to OBSERVE the duplicates; injected copies are byte-identical so raw
  * counts agree across engines. Rates are single double divisions of
  * exact BIGINT counts (deterministic); the additive count arithmetic
  * stays in BIGINT in both engines (only sum() promotes to HUGEINT in
  * DuckDB, and there is none here).
  *
  * Scale shape: the rejected stream is a scan → explode → codegen'd
  * filter (no shuffle at all); the quality rollup is four map-side-
  * combined hourly aggregates (plus one exploded distinct-CASE pass)
  * equi-joined on the hour key — at most |hours| rows after the first
  * shuffle, so every join fits in a broadcast at any corpus size.
  */
object DqOps {

  import RtbOracleOps.{root, ensureData, tsSql}

  /** The dq job's private-IP predicate, its literal LIKE list. */
  private val ipLikesSql = Seq(
    "10.%", "192.168.%", "172.16.%", "172.17.%", "172.18.%", "172.19.%",
    "172.2_.%", "172.30.%", "172.31.%")

  private def ipLikeSql(c: String): String =
    ipLikesSql.map(p => s"$c LIKE '$p'").mkString("(", " OR ", ")")

  private def ipLikeCol(c: Column): Column =
    ipLikesSql.map(c.like).reduce(_ || _)

  /** dq_rejected_events one-for-one: per-imp rejected rows with the
    * reason CASE in the insert job's own precedence (test publisher,
    * then private IP, then non-positive floor, UNKNOWN unreachable
    * under the WHERE).
    */
  val dqRejectedEvents: QueryDef = QueryDef(
    "dq_rejected_events",
    s"""WITH x AS (
       |  SELECT id, site, app, device, unnest(imp) AS imp_t, event_timestamp
       |  FROM read_parquet('$root/requests/*.parquet')
       |)
       |SELECT id AS request_id,
       |       imp_t['id'] AS imp_id,
       |       coalesce(site['publisher']['id'], app['publisher']['id'])
       |         AS publisher_id,
       |       device['ip'] AS device_ip,
       |       CASE WHEN coalesce(site['publisher']['id'],
       |                          app['publisher']['id']) < 0
       |              THEN 'TEST_PUBLISHER'
       |            WHEN ${ipLikeSql("device['ip']")} THEN 'PRIVATE_IP'
       |            WHEN imp_t['bidfloor'] <= 0 THEN 'NON_POSITIVE_BIDFLOOR'
       |            ELSE 'UNKNOWN' END AS reject_reason,
       |       $tsSql AS event_ts
       |FROM x
       |WHERE coalesce(site['publisher']['id'], app['publisher']['id']) < 0
       |   OR ${ipLikeSql("device['ip']")}
       |   OR imp_t['bidfloor'] <= 0""".stripMargin) { t =>
    ensureData(t.spark)
    val pub = coalesce(col("site.publisher.id"), col("app.publisher.id"))
    val ip = col("device.ip")
    RtbOracleOps.slice(t.spark, "requests")
      .select(col("id").as("request_id"), col("site"), col("app"),
        col("device"), explode(col("imp")).as("imp_t"),
        RtbIngest.parseTs(col("event_timestamp")).as("event_ts"))
      .filter(pub < 0 || ipLikeCol(ip) || col("imp_t.bidfloor") <= 0)
      .select(col("request_id"), col("imp_t.id").as("imp_id"),
        pub.as("publisher_id"), ip.as("device_ip"),
        when(pub < 0, "TEST_PUBLISHER")
          .when(ipLikeCol(ip), "PRIVATE_IP")
          .when(col("imp_t.bidfloor") <= 0, "NON_POSITIVE_BIDFLOOR")
          .otherwise("UNKNOWN").as("reject_reason"),
        col("event_ts"))
  }

  /** dq_event_quality_hourly one-for-one: per-hour total/unique/
    * duplicate counts for all four raw streams on the UNION spine, the
    * invalid-request count, and the all-stream duplicate rollup.
    */
  val dqEventQualityHourly: QueryDef = QueryDef(
    "dq_event_quality_hourly", {
      def hourly(src: String, idCol: String, tot: String, uniq: String) =
        s"""SELECT date_trunc('hour', $tsSql) AS window_start,
           |       count(*) AS $tot, count(DISTINCT $idCol) AS $uniq
           |FROM read_parquet('$root/$src/*.parquet') GROUP BY 1""".stripMargin
      def rate(num: String, den: String) =
        s"""CASE WHEN $den > 0
           |     THEN CAST($num AS DOUBLE) / CAST($den AS DOUBLE)
           |     ELSE 0.0 END""".stripMargin
      val totAll =
        """coalesce(total_bid_requests, 0) + coalesce(total_bid_responses, 0)
          | + coalesce(total_wins, 0) + coalesce(total_clicks, 0)""".stripMargin
      val dupAll =
        """(coalesce(total_bid_requests, 0) - coalesce(unique_bid_requests, 0))
          | + (coalesce(total_bid_responses, 0) - coalesce(unique_bid_responses, 0))
          | + (coalesce(total_wins, 0) - coalesce(unique_wins, 0))
          | + (coalesce(total_clicks, 0) - coalesce(unique_clicks, 0))""".stripMargin
      s"""WITH w AS (
         |  SELECT date_trunc('hour', $tsSql) AS window_start
         |  FROM read_parquet('$root/requests/*.parquet') GROUP BY 1
         |  UNION
         |  SELECT date_trunc('hour', $tsSql)
         |  FROM read_parquet('$root/responses/*.parquet') GROUP BY 1
         |  UNION
         |  SELECT date_trunc('hour', $tsSql)
         |  FROM read_parquet('$root/impressions/*.parquet') GROUP BY 1
         |  UNION
         |  SELECT date_trunc('hour', $tsSql)
         |  FROM read_parquet('$root/clicks/*.parquet') GROUP BY 1
         |),
         |req_tot AS (${hourly("requests", "id", "total_bid_requests", "unique_bid_requests")}),
         |req_inv AS (
         |  SELECT date_trunc('hour', ts) AS window_start,
         |         count(DISTINCT CASE WHEN pub < 0 OR ${ipLikeSql("ip")}
         |                               OR imp_t['bidfloor'] <= 0
         |                             THEN id END) AS invalid_bid_requests
         |  FROM (SELECT $tsSql AS ts, id,
         |               coalesce(site['publisher']['id'],
         |                        app['publisher']['id']) AS pub,
         |               device['ip'] AS ip, unnest(imp) AS imp_t
         |        FROM read_parquet('$root/requests/*.parquet'))
         |  GROUP BY 1
         |),
         |req AS (
         |  SELECT req_tot.window_start, total_bid_requests, unique_bid_requests,
         |         coalesce(invalid_bid_requests, 0) AS invalid_bid_requests
         |  FROM req_tot LEFT JOIN req_inv USING (window_start)
         |),
         |resp AS (${hourly("responses", "id", "total_bid_responses", "unique_bid_responses")}),
         |win AS (${hourly("impressions", "impression_id", "total_wins", "unique_wins")}),
         |clk AS (${hourly("clicks", "click_id", "total_clicks", "unique_clicks")})
         |SELECT w.window_start,
         |  coalesce(total_bid_requests, 0) AS total_bid_requests,
         |  coalesce(unique_bid_requests, 0) AS unique_bid_requests,
         |  coalesce(total_bid_requests, 0) - coalesce(unique_bid_requests, 0)
         |    AS duplicate_bid_requests,
         |  ${rate("coalesce(total_bid_requests, 0) - coalesce(unique_bid_requests, 0)", "coalesce(total_bid_requests, 0)")}
         |    AS duplicate_bid_request_rate,
         |  coalesce(total_bid_responses, 0) AS total_bid_responses,
         |  coalesce(unique_bid_responses, 0) AS unique_bid_responses,
         |  coalesce(total_bid_responses, 0) - coalesce(unique_bid_responses, 0)
         |    AS duplicate_bid_responses,
         |  ${rate("coalesce(total_bid_responses, 0) - coalesce(unique_bid_responses, 0)", "coalesce(total_bid_responses, 0)")}
         |    AS duplicate_bid_response_rate,
         |  coalesce(total_wins, 0) AS total_wins,
         |  coalesce(unique_wins, 0) AS unique_wins,
         |  coalesce(total_wins, 0) - coalesce(unique_wins, 0) AS duplicate_wins,
         |  ${rate("coalesce(total_wins, 0) - coalesce(unique_wins, 0)", "coalesce(total_wins, 0)")}
         |    AS duplicate_win_rate,
         |  coalesce(total_clicks, 0) AS total_clicks,
         |  coalesce(unique_clicks, 0) AS unique_clicks,
         |  coalesce(total_clicks, 0) - coalesce(unique_clicks, 0) AS duplicate_clicks,
         |  ${rate("coalesce(total_clicks, 0) - coalesce(unique_clicks, 0)", "coalesce(total_clicks, 0)")}
         |    AS duplicate_click_rate,
         |  coalesce(invalid_bid_requests, 0) AS invalid_bid_requests,
         |  ${rate("coalesce(invalid_bid_requests, 0)", "coalesce(total_bid_requests, 0)")}
         |    AS invalid_bid_request_rate,
         |  $totAll AS total_events_all,
         |  $dupAll AS duplicate_events_all,
         |  ${rate(s"($dupAll)", s"($totAll)")} AS duplicate_rate_all
         |FROM w
         |LEFT JOIN req ON w.window_start = req.window_start
         |LEFT JOIN resp ON w.window_start = resp.window_start
         |LEFT JOIN win ON w.window_start = win.window_start
         |LEFT JOIN clk ON w.window_start = clk.window_start""".stripMargin
    }) { t =>
    ensureData(t.spark)
    val spark = t.spark
    def hour(src: String) = spark.read.parquet(s"$root/$src")
      .withColumn("window_start",
        date_trunc("hour", RtbIngest.parseTs(col("event_timestamp"))))
    def hourly(src: String, idCol: String, tot: String, uniq: String) =
      hour(src).groupBy(col("window_start"))
        .agg(count(lit(1)).as(tot), countDistinct(col(idCol)).as(uniq))
    def rate(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double")).otherwise(0.0)

    val spine = Seq("requests", "responses", "impressions", "clicks")
      .map(s => hour(s).select(col("window_start")))
      .reduce(_ union _).distinct()
    val reqTot = hourly("requests", "id", "total_bid_requests", "unique_bid_requests")
    val pub = coalesce(col("site.publisher.id"), col("app.publisher.id"))
    val reqInv = hour("requests")
      .select(col("window_start"), col("id"), pub.as("pub"),
        col("device.ip").as("ip"), explode(col("imp")).as("imp_t"))
      .groupBy(col("window_start"))
      .agg(countDistinct(when(col("pub") < 0 || ipLikeCol(col("ip")) ||
        col("imp_t.bidfloor") <= 0, col("id"))).as("invalid_bid_requests"))
    val req = reqTot.join(reqInv, Seq("window_start"), "left")
    val resp = hourly("responses", "id", "total_bid_responses", "unique_bid_responses")
    val win = hourly("impressions", "impression_id", "total_wins", "unique_wins")
    val clk = hourly("clicks", "click_id", "total_clicks", "unique_clicks")

    def z(c: String): Column = coalesce(col(c), lit(0L))
    val totAll = z("total_bid_requests") + z("total_bid_responses") +
      z("total_wins") + z("total_clicks")
    val dupAll = (z("total_bid_requests") - z("unique_bid_requests")) +
      (z("total_bid_responses") - z("unique_bid_responses")) +
      (z("total_wins") - z("unique_wins")) +
      (z("total_clicks") - z("unique_clicks"))
    spine
      .join(req, Seq("window_start"), "left")
      .join(resp, Seq("window_start"), "left")
      .join(win, Seq("window_start"), "left")
      .join(clk, Seq("window_start"), "left")
      .select(col("window_start"),
        z("total_bid_requests").as("total_bid_requests"),
        z("unique_bid_requests").as("unique_bid_requests"),
        (z("total_bid_requests") - z("unique_bid_requests"))
          .as("duplicate_bid_requests"),
        rate(z("total_bid_requests") - z("unique_bid_requests"),
          z("total_bid_requests")).as("duplicate_bid_request_rate"),
        z("total_bid_responses").as("total_bid_responses"),
        z("unique_bid_responses").as("unique_bid_responses"),
        (z("total_bid_responses") - z("unique_bid_responses"))
          .as("duplicate_bid_responses"),
        rate(z("total_bid_responses") - z("unique_bid_responses"),
          z("total_bid_responses")).as("duplicate_bid_response_rate"),
        z("total_wins").as("total_wins"),
        z("unique_wins").as("unique_wins"),
        (z("total_wins") - z("unique_wins")).as("duplicate_wins"),
        rate(z("total_wins") - z("unique_wins"), z("total_wins"))
          .as("duplicate_win_rate"),
        z("total_clicks").as("total_clicks"),
        z("unique_clicks").as("unique_clicks"),
        (z("total_clicks") - z("unique_clicks")).as("duplicate_clicks"),
        rate(z("total_clicks") - z("unique_clicks"), z("total_clicks"))
          .as("duplicate_click_rate"),
        z("invalid_bid_requests").as("invalid_bid_requests"),
        rate(z("invalid_bid_requests"), z("total_bid_requests"))
          .as("invalid_bid_request_rate"),
        totAll.as("total_events_all"),
        dupAll.as("duplicate_events_all"),
        rate(dupAll, totAll).as("duplicate_rate_all"))
  }

  val all: Seq[QueryDef] = Seq(dqRejectedEvents, dqEventQualityHourly)
}

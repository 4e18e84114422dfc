package graft.rtb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ingestion pipeline over the nested OpenRTB model — the engine's
  * analog of the reference's Flink statement-set job
  * (streaming/flink/sql/insert_jobs.sql:11-235), exercising the nested
  * operators on REAL nested data:
  *
  *  U1  explode(imp)                                  (:47)
  *  U2  double explode seatbid→bid                    (:198-199)
  *  P1  nested projection site.publisher.id etc.      (:24-37)
  *  P2  COALESCE site/app union merge                 (:24-27)
  *  P3  element_at(cur, 1)                            (:35)
  *  P4  ISO-string timestamp parse                    (:38-45)
  *  P5  test-traffic + RFC1918 (incl. `_` wildcard)
  *      + bidfloor predicate filters                  (:48-62)
  *  P6  int→bool flags (gdpr/coppa)                   (:36-37)
  *  P7  CASE device classification                    (:92-98)
  *  P8  CASE static-FX currency normalization         (:74-79)
  *  P9  CASE reject-reason derivation                 (:141-155)
  *
  * All pure column expressions — one WholeStageCodegen span over the
  * exploded rows, no UDFs, no shuffle until an aggregation asks for one.
  */
object RtbIngest {

  /** P4 — wire timestamps are ISO-8601 strings with microseconds. */
  def parseTs(c: Column): Column =
    to_timestamp(substring(c, 1, 26), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  /** P5 — RFC1918 patterns, `_` single-char wildcard included. */
  private def isPrivateIp(ip: Column): Column =
    ip.like("10.%") || ip.like("192.168.%") || ip.like("172.16.%") ||
      ip.like("172.2_.%") || ip.like("172.3_.%")

  /** One row per (request, impression) with every enrichment column and
    * a `reject_reason` (NULL = clean). Downstream splits on it — same
    * rows feed the clean, enriched, and rejected sinks, mirroring the
    * statement set's shared source read.
    */
  def flattenRequests(requests: DataFrame): DataFrame =
    requests
      .select(col("*"), explode(col("imp")).as("imp_t")) // U1
      .select(
        col("id").as("request_id"),
        col("imp_t.id").as("imp_id"),
        col("imp_t.banner.w").as("banner_w"),
        col("imp_t.banner.h").as("banner_h"),
        col("imp_t.bidfloor").as("imp_bidfloor"),
        coalesce(col("site.id"), col("app.id")).as("property_id"), // P2
        coalesce(col("site.domain"), col("app.bundle")).as("property_domain"),
        coalesce(col("site.publisher.id"), col("app.publisher.id")).as("publisher_id"), // P1
        coalesce(col("site.cat"), col("app.cat")).as("content_cat"),
        element_at(col("cur"), 1).as("currency"), // P3
        col("device.ip").as("device_ip"),
        col("device.geo.country").as("device_geo_country"), // P1
        col("device.geo.region").as("device_geo_region"),
        col("device.devicetype").as("devicetype"),
        col("device.os").as("device_os"),
        col("app").isNotNull.as("is_app"),
        (col("regs.ext.gdpr") === 1).as("is_gdpr"), // P6 (+ P1 depth-2 nesting)
        (col("regs.coppa") === 1).as("is_coppa"),
        col("at").as("auction_type"),
        col("user.id").as("user_id"), // insert_jobs.sql:32 (landed schema)
        col("tmax"),
        parseTs(col("event_timestamp")).as("event_ts"), // P4
        parseTs(col("received_at")).as("received_ts")) // insert_jobs.sql:42-45
      .withColumn("device_category", // P7
        when(col("devicetype").isin(3, 6, 7), "CTV")
          .when(col("devicetype").isin(1, 4) && col("is_app"), "Mobile App")
          .when(col("devicetype").isin(1, 4) && !col("is_app"), "Mobile Web")
          .when(col("devicetype") === 2, "Desktop")
          .otherwise("Unknown"))
      .withColumn("imp_bidfloor_usd", // P8 — static FX like the reference
        when(col("currency") === "EUR", round(col("imp_bidfloor") * 1.08, 4))
          .when(col("currency") === "GBP", round(col("imp_bidfloor") * 1.25, 4))
          .when(col("currency") === "JPY", round(col("imp_bidfloor") * 0.0067, 4))
          .otherwise(col("imp_bidfloor")))
      .withColumn("is_test_traffic", col("publisher_id") <= 0) // P6
      .withColumn("is_private_ip", isPrivateIp(col("device_ip")))
      .withColumn("reject_reason", // P9
        when(col("is_test_traffic"), "TEST_PUBLISHER")
          .when(col("is_private_ip"), "PRIVATE_IP")
          .when(col("imp_bidfloor") <= 0, "NON_POSITIVE_BIDFLOOR"))

  def cleanRequests(flat: DataFrame): DataFrame =
    flat.filter(col("reject_reason").isNull) // P5

  def rejectedRequests(flat: DataFrame): DataFrame =
    flat.filter(col("reject_reason").isNotNull)

  /** U2 — one row per bid across all seats of all responses. */
  def flattenBids(responses: DataFrame): DataFrame =
    responses
      .select(col("id").as("response_id"), col("ext.request_id").as("request_id"),
        col("cur").as("currency"), parseTs(col("event_timestamp")).as("event_ts"),
        explode(col("seatbid")).as("sb"))
      .select(col("response_id"), col("request_id"), col("currency"), col("event_ts"),
        col("sb.seat").as("bidder_id"), explode(col("sb.bid")).as("b"))
      .select(col("response_id"), col("request_id"), col("currency"), col("event_ts"),
        col("bidder_id"),
        col("b.id").as("bid_id"), col("b.impid").as("imp_id"),
        col("b.price").as("bid_price"), col("b.crid").as("creative_id"),
        element_at(col("b.adomain"), 1).as("ad_domain"), // P3
        col("b.dealid").as("deal_id"),
        col("b.campaign_id"), col("b.line_item_id"), col("b.strategy_id"),
        col("b.advertiser_id"), col("b.agency_id"))

  /** J3 (full 4-stage form) + A2/A3/P10/P11 — the hourly funnel:
    * requests →(≤5 s) responses →(≤10 s) impressions →(≤60 s) clicks
    * (funnel_jobs.sql:54-63), each stream DEDUPLICATED first
    * (aggregation_jobs.sql:31-50), chained on the UNIQUE event ids (so
    * the left joins cannot fan out), grouped by request hour with the 4
    * distinct counts and guarded conversion rates.
    */
  def funnelHourly(
      requests: DataFrame,
      responses: DataFrame,
      impressions: DataFrame,
      clicks: DataFrame): DataFrame = {
    // A3 — dedup by event id (duplicate injection is part of the data)
    val r = requests.dropDuplicates("id")
      .select(col("id").as("request_id"), parseTs(col("event_timestamp")).as("r_ts"))
    val b = responses.dropDuplicates("id")
      .select(col("id").as("response_id"), col("ext.request_id").as("b_request_id"),
        parseTs(col("event_timestamp")).as("b_ts"))
    val i = impressions.dropDuplicates("impression_id")
      .select(col("impression_id"), col("request_id").as("i_request_id"),
        parseTs(col("event_timestamp")).as("i_ts"))
    val c = clicks.dropDuplicates("click_id")
      .select(col("click_id"), col("impression_id").as("c_impression_id"),
        parseTs(col("event_timestamp")).as("c_ts"))
    funnelHourlyFromStages(r, b, i, c)
  }

  /** The funnel over already-normalized, already-deduplicated stage
    * frames — shared by [[funnelHourly]] (raw nested events) and the
    * serving path over ingested tables ([[graft.streaming.Jobs]]).
    * Expected columns: r(request_id, r_ts), b(response_id, b_request_id,
    * b_ts), i(impression_id, i_request_id, i_ts),
    * c(click_id, c_impression_id, c_ts).
    */
  def funnelHourlyFromStages(
      r: DataFrame, b: DataFrame, i: DataFrame, c: DataFrame): DataFrame = {
    val chained = r
      .join(b, col("request_id") === col("b_request_id") &&
        col("b_ts") >= col("r_ts") && col("b_ts") <= col("r_ts") + expr("INTERVAL 5 SECONDS"),
        "left")
      .join(i, col("request_id") === col("i_request_id") &&
        col("i_ts") >= col("b_ts") && col("i_ts") <= col("b_ts") + expr("INTERVAL 10 SECONDS"),
        "left")
      .join(c, col("impression_id") === col("c_impression_id") &&
        col("c_ts") >= col("i_ts") && col("c_ts") <= col("i_ts") + expr("INTERVAL 60 SECONDS"),
        "left")
    chained
      .groupBy(date_trunc("hour", col("r_ts")).as("hour")) // P10
      .agg(
        countDistinct(col("request_id")).as("n_requests"), // A2
        countDistinct(col("response_id")).as("n_responses"),
        countDistinct(col("impression_id")).as("n_impressions"),
        countDistinct(col("click_id")).as("n_clicks"))
      .withColumn("fill_rate", // P11
        when(col("n_requests") > 0,
          round(col("n_responses").cast("double") / col("n_requests"), 4)).otherwise(0.0))
      .withColumn("win_rate",
        when(col("n_responses") > 0,
          round(col("n_impressions").cast("double") / col("n_responses"), 4)).otherwise(0.0))
      .withColumn("ctr",
        when(col("n_impressions") > 0,
          round(col("n_clicks").cast("double") / col("n_impressions"), 4)).otherwise(0.0))
  }
}

package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.QueryDef
import graft.gen.RtbGenerator
import graft.rtb.RtbIngest
import org.apache.spark.sql.functions._

/** The nested OpenRTB pipeline pushed through the DuckDB oracle gate —
  * not a testdata analog: each query GENERATES the seeded funnel
  * (S9, deterministic), writes the raw NESTED events as parquet to a
  * fixed scratch path, recomputes in Spark from the written files, and
  * the oracle SQL recomputes the same result in DuckDB via
  * `read_parquet` on the very same files (struct bracket access +
  * UNNEST replicate the nested projections). This value-checks the real
  * P1–P7/P9 enrichment and the real J3 funnel on real nested data, both
  * engines reading identical bytes.
  *
  * Deliberately excluded from the projections: `content_cat` (a LIST
  * cell — the gate hashes scalar cells) and `imp_bidfloor_usd`
  * (`round(x, 4)` half-tie divergence between engines — P8 is
  * oracle-checked on exact cents in `p8_currency_case`), and the funnel
  * rate columns (same `round` tie risk; the counts are exact and the
  * rates are oracle-checked via a2/a6).
  */
object RtbOracleOps {

  // literal path shared with the oracle SQL — must be identical text on
  // both engines, so no tmpdir indirection
  private val root = "/tmp/graft_rtb_oracle"

  private val Seed = 987654321L
  private val N = 1500
  private val StartMs = 1704103200000L // 2024-01-01 10:00:00 UTC
  private val SpanMs = 3L * 3600 * 1000

  /** Generate once, share across the three queries (and across Verify →
    * oracle → Bench runs — the data is a pure function of the seed, so a
    * marker file short-circuits the regenerate+rewrite). All four fault
    * classes are on; each query simply reads the slices it needs.
    */
  private def ensureData(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    // the marker must encode EVERY generation parameter — a partial key
    // (seed+N only) would silently reuse stale data after a parameter edit
    val marker = Paths.get(s"$root/_complete-$Seed-$N-$StartMs-$SpanMs-dup03x4")
    if (Files.exists(marker)) return
    val p = Paths.get(root)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    val funnel = RtbGenerator.generate(Seed, N, StartMs, SpanMs,
      RtbGenerator.Rates(dupRequest = 0.03, dupResponse = 0.03,
        dupImpression = 0.03, dupClick = 0.03))
    import spark.implicits._
    spark.createDataset(funnel.requests).write.mode("overwrite").parquet(s"$root/requests")
    spark.createDataset(funnel.responses).write.mode("overwrite").parquet(s"$root/responses")
    spark.createDataset(funnel.impressions).write.mode("overwrite").parquet(s"$root/impressions")
    spark.createDataset(funnel.clicks).write.mode("overwrite").parquet(s"$root/clicks")
    Files.createFile(marker)
  }

  private val tsSql = "strptime(substr(event_timestamp, 1, 26), '%Y-%m-%dT%H:%M:%S.%f')"

  /** Shared oracle SQL for the enrichment shape — used verbatim by both
    * the direct parquet path and the Avro wire round-trip (the point of
    * the latter: decoded bytes must be indistinguishable downstream).
    */
  private val enrichSql =
    s"""WITH x AS (
       |  SELECT id, unnest(imp) AS imp_t, site, app, cur, device, regs, "at",
       |         event_timestamp
       |  FROM read_parquet('$root/requests/*.parquet')
       |),
       |flat AS (
       |  SELECT id AS request_id,
       |         imp_t['id'] AS imp_id,
       |         imp_t['banner']['w'] AS banner_w,
       |         imp_t['banner']['h'] AS banner_h,
       |         imp_t['bidfloor'] AS imp_bidfloor,
       |         coalesce(site['id'], app['id']) AS property_id,
       |         coalesce(site['domain'], app['bundle']) AS property_domain,
       |         coalesce(site['publisher']['id'], app['publisher']['id']) AS publisher_id,
       |         cur[1] AS currency,
       |         device['ip'] AS device_ip,
       |         device['geo']['country'] AS device_geo_country,
       |         device['geo']['region'] AS device_geo_region,
       |         device['devicetype'] AS devicetype,
       |         device['os'] AS device_os,
       |         app IS NOT NULL AS is_app,
       |         regs['ext']['gdpr'] = 1 AS is_gdpr,
       |         regs['coppa'] = 1 AS is_coppa,
       |         "at" AS auction_type,
       |         $tsSql AS event_ts
       |  FROM x
       |)
       |SELECT *,
       |       CASE WHEN devicetype IN (3, 6, 7) THEN 'CTV'
       |            WHEN devicetype IN (1, 4) AND is_app THEN 'Mobile App'
       |            WHEN devicetype IN (1, 4) AND NOT is_app THEN 'Mobile Web'
       |            WHEN devicetype = 2 THEN 'Desktop'
       |            ELSE 'Unknown' END AS device_category,
       |       publisher_id <= 0 AS is_test_traffic,
       |       (device_ip LIKE '10.%' OR device_ip LIKE '192.168.%'
       |        OR device_ip LIKE '172.16.%' OR device_ip LIKE '172.2_.%'
       |        OR device_ip LIKE '172.3_.%') AS is_private_ip,
       |       CASE WHEN publisher_id <= 0 THEN 'TEST_PUBLISHER'
       |            WHEN device_ip LIKE '10.%' OR device_ip LIKE '192.168.%'
       |              OR device_ip LIKE '172.16.%' OR device_ip LIKE '172.2_.%'
       |              OR device_ip LIKE '172.3_.%' THEN 'PRIVATE_IP'
       |            WHEN imp_bidfloor <= 0 THEN 'NON_POSITIVE_BIDFLOOR'
       |            ELSE NULL END AS reject_reason
       |FROM flat""".stripMargin

  /** P1–P7/P9 + U1 on REAL nested rows, engine-parity-checked. */
  val rtbIngestEnrich: QueryDef = QueryDef(
    "rtb_ingest_enrich", enrichSql) { t =>
    ensureData(t.spark)
    RtbIngest.flattenRequests(t.spark.read.parquet(s"$root/requests"))
      .drop("content_cat", "imp_bidfloor_usd")
  }

  /** S1's Avro wire leg, engine-parity-checked end to end: the nested
    * requests are ENCODED to Confluent-framed Avro binary under a
    * registered writer schema, DECODED back through the registry's
    * reader, and only then flattened — while the oracle recomputes from
    * the original parquet. A hash-identical result proves the wire
    * round-trip preserves every value the enrichment consumes (nested
    * structs, arrays, the site/app null-union), i.e. a user could swap
    * the typed source for the Kafka-Avro wire without observable change.
    */
  val rtbAvroRoundtrip: QueryDef = QueryDef(
    "rtb_avro_roundtrip", enrichSql) { t =>
    ensureData(t.spark)
    val raw = t.spark.read.parquet(s"$root/requests")
    val registry = new graft.sources.WireRegistry
    val schema = graft.sources.AvroWire.schemaFor(raw)
    val id = registry.register("bid-requests-value", schema)
    val wire = raw.select(graft.sources.AvroWire.toWire(
      struct(raw.columns.map(col): _*), schema, id).as("value"))
    val decoded = wire.select(graft.sources.AvroWire.fromWire(
      col("value"), registry.latest("bid-requests-value")._2, registry.writers).as("r"))
      .select("r.*")
    RtbIngest.flattenRequests(decoded)
      .drop("content_cat", "imp_bidfloor_usd")
  }

  /** U2 (real double-explode) + P3 on generated nested responses: one
    * row per bid across every seat of every response, engine-parity-
    * checked via two-level UNNEST in DuckDB.
    */
  val rtbFlattenBids: QueryDef = QueryDef(
    "rtb_flatten_bids",
    s"""WITH s AS (
       |  SELECT id AS response_id, ext['request_id'] AS request_id, cur AS currency,
       |         $tsSql AS event_ts, unnest(seatbid) AS sb
       |  FROM read_parquet('$root/responses/*.parquet')
       |),
       |b AS (
       |  SELECT response_id, request_id, currency, event_ts,
       |         sb['seat'] AS bidder_id, unnest(sb['bid']) AS b
       |  FROM s
       |)
       |SELECT response_id, request_id, currency, event_ts, bidder_id,
       |       b['id'] AS bid_id, b['impid'] AS imp_id, b['price'] AS bid_price,
       |       b['crid'] AS creative_id, b['adomain'][1] AS ad_domain,
       |       b['dealid'] AS deal_id, b['campaign_id'] AS campaign_id,
       |       b['advertiser_id'] AS advertiser_id
       |FROM b""".stripMargin) { t =>
    ensureData(t.spark)
    RtbIngest.flattenBids(t.spark.read.parquet(s"$root/responses"))
  }

  /** J3 (real 4-stage form) + A2/A3/P10 on generated nested events:
    * dedup each stream by event id, chain the interval left joins, count
    * the four funnel stages per request hour. Both engines read the same
    * written files; the counts must match exactly.
    */
  val rtbFunnelHourly: QueryDef = QueryDef(
    "rtb_funnel_hourly",
    s"""WITH r AS (SELECT DISTINCT id AS request_id, $tsSql AS r_ts
       |           FROM read_parquet('$root/requests/*.parquet')),
       |b AS (SELECT DISTINCT id AS response_id, ext['request_id'] AS b_request_id,
       |             $tsSql AS b_ts
       |      FROM read_parquet('$root/responses/*.parquet')),
       |i AS (SELECT DISTINCT impression_id, request_id AS i_request_id, $tsSql AS i_ts
       |      FROM read_parquet('$root/impressions/*.parquet')),
       |c AS (SELECT DISTINCT click_id, impression_id AS c_impression_id, $tsSql AS c_ts
       |      FROM read_parquet('$root/clicks/*.parquet')),
       |chained AS (
       |  SELECT r.request_id, b.response_id, i.impression_id, c.click_id, r.r_ts
       |  FROM r
       |  LEFT JOIN b ON b.b_request_id = r.request_id
       |             AND b.b_ts >= r.r_ts AND b.b_ts <= r.r_ts + INTERVAL 5 SECOND
       |  LEFT JOIN i ON i.i_request_id = r.request_id
       |             AND i.i_ts >= b.b_ts AND i.i_ts <= b.b_ts + INTERVAL 10 SECOND
       |  LEFT JOIN c ON c.c_impression_id = i.impression_id
       |             AND c.c_ts >= i.i_ts AND c.c_ts <= i.i_ts + INTERVAL 60 SECOND
       |)
       |SELECT date_trunc('hour', r_ts) AS hour,
       |       count(DISTINCT request_id) AS n_requests,
       |       count(DISTINCT response_id) AS n_responses,
       |       count(DISTINCT impression_id) AS n_impressions,
       |       count(DISTINCT click_id) AS n_clicks
       |FROM chained GROUP BY 1""".stripMargin) { t =>
    ensureData(t.spark)
    RtbIngest.funnelHourly(
      t.spark.read.parquet(s"$root/requests"),
      t.spark.read.parquet(s"$root/responses"),
      t.spark.read.parquet(s"$root/impressions"),
      t.spark.read.parquet(s"$root/clicks"))
      .select(col("hour"), col("n_requests"), col("n_responses"),
        col("n_impressions"), col("n_clicks"))
  }

  val all: Seq[QueryDef] =
    Seq(rtbIngestEnrich, rtbAvroRoundtrip, rtbFlattenBids, rtbFunnelHourly)
}

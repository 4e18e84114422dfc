package graft.operators

import graft.QueryDef
import org.apache.spark.sql.SparkSession

/** X3 — the reference's SQL surface replayed VERBATIM: register the
  * queryable tables under their reference names (`create_tables.sql` /
  * insert-job targets: the four flat event streams, every `v_*` Trino
  * view, the two `dq_*` tables) as temp views in the session catalog,
  * then run the literal text of `scripts/query-examples.sh` #13
  * (lines 148-161, the 4-table LEFT-JOIN full-funnel summary) through
  * `spark.sql`. The other 18 example queries are pinned semantically by
  * the `qx*`/`v_*`/`dash*` rows; this row pins the TEXTUAL surface — a
  * user pasting the reference's SQL against the registered catalog gets
  * the reference's answer with no rewriting.
  *
  * Scale shape: pure view registration (lazy frames — nothing executes
  * at register time) + one scan → hash-join chain → distinct-count
  * aggregate, exactly #13's own shape; the four distinct counts plan as
  * one Expand over the joined stream, never a per-count re-scan.
  */
object SqlSurfaceOps {

  import RtbOracleOps.{root, ensureData}

  /** Register the four flat event streams under their reference table
    * names. The streams use the standing fixture discipline (the
    * fixture injects 3% byte-identical duplicate deliveries to exercise
    * the dedup operators; the reference's DEFAULT generator emits none,
    * so each stream is collapsed to one row per event id — see
    * [[ExampleQueryOps]]'s deviation notes).
    */
  def registerBaseStreams(spark: SparkSession): Unit = {
    ensureData(spark)
    ExampleQueryOps.br(spark).createOrReplaceTempView("bid_requests")
    ExampleQueryOps.bids(spark).createOrReplaceTempView("bid_responses")
    spark.read.parquet(s"$root/impressions").dropDuplicates("impression_id")
      .createOrReplaceTempView("impressions")
    spark.read.parquet(s"$root/clicks").dropDuplicates("click_id")
      .createOrReplaceTempView("clicks")
  }

  /** Register the FULL reference surface: the base streams plus every
    * `v_*` view and `dq_*` table, straight from the registry so the
    * view surface can never drift from the oracle-checked definitions.
    * One-time catalog setup (each frame construction is an eager
    * analyzer pass over a wide plan — ~19 of them), so the bench-timed
    * x3 row registers only the streams #13 reads; this full form is
    * SqlSurfaceSpec's pin and the entry point a user replaying
    * arbitrary reference SQL would call once per session.
    */
  def registerSurface(spark: SparkSession, sfDir: String): Unit = {
    registerBaseStreams(spark)
    for (q <- graft.SparkEntry.registry
         if q.name.startsWith("v_") || q.name.startsWith("dq_"))
      q.fn(spark, sfDir).createOrReplaceTempView(q.name)
  }

  /** scripts/query-examples.sh:150-161, byte-for-byte (the string the
    * reference passes to `trino --execute`).
    */
  private val example13 =
    """SELECT COUNT(DISTINCT br.request_id) AS requests,
      |          COUNT(DISTINCT resp.request_id) AS responses,
      |          COUNT(DISTINCT imp.impression_id) AS impressions,
      |          COUNT(DISTINCT clk.click_id) AS clicks,
      |          ROUND(CAST(COUNT(DISTINCT resp.request_id) AS DOUBLE) / COUNT(DISTINCT br.request_id) * 100, 2) AS fill_rate_pct,
      |          ROUND(CAST(COUNT(DISTINCT imp.impression_id) AS DOUBLE) / NULLIF(COUNT(DISTINCT resp.request_id), 0) * 100, 2) AS win_rate_pct,
      |          ROUND(CAST(COUNT(DISTINCT clk.click_id) AS DOUBLE) / NULLIF(COUNT(DISTINCT imp.impression_id), 0) * 100, 2) AS ctr_pct
      |   FROM bid_requests br
      |   LEFT JOIN bid_responses resp ON br.request_id = resp.request_id
      |   LEFT JOIN impressions imp ON br.request_id = imp.request_id
      |   LEFT JOIN clicks clk ON imp.impression_id = clk.impression_id""".stripMargin

  val x3SqlSurface: QueryDef = QueryDef(
    "x3_sql_surface",
    // the same funnel restated over the raw fixture: br is the shared
    // clean per-imp CTE, responses/bids double-unnested (a response
    // with no bids is absent from the flat view in both engines), and
    // each stream id-deduplicated — distinct counts are grain-invariant,
    // so the per-bid fan-out of the joined stream cannot move them
    s"""${ExampleQueryOps.brSql},
       |s AS (SELECT id AS response_id, ext['request_id'] AS request_id,
       |             unnest(seatbid) AS sb
       |      FROM (SELECT DISTINCT id, ext, seatbid
       |            FROM read_parquet('$root/responses/*.parquet'))),
       |resp AS (SELECT response_id, request_id, unnest(sb['bid']) AS b FROM s),
       |imp AS (SELECT DISTINCT impression_id, request_id AS i_request_id
       |        FROM read_parquet('$root/impressions/*.parquet')),
       |clk AS (SELECT DISTINCT click_id, impression_id AS c_impression_id
       |        FROM read_parquet('$root/clicks/*.parquet'))
       |SELECT count(DISTINCT br.request_id) AS requests,
       |       count(DISTINCT resp.request_id) AS responses,
       |       count(DISTINCT imp.impression_id) AS impressions,
       |       count(DISTINCT clk.click_id) AS clicks,
       |       round(CAST(count(DISTINCT resp.request_id) AS DOUBLE)
       |             / count(DISTINCT br.request_id) * 100, 2) AS fill_rate_pct,
       |       round(CAST(count(DISTINCT imp.impression_id) AS DOUBLE)
       |             / nullif(count(DISTINCT resp.request_id), 0) * 100, 2) AS win_rate_pct,
       |       round(CAST(count(DISTINCT clk.click_id) AS DOUBLE)
       |             / nullif(count(DISTINCT imp.impression_id), 0) * 100, 2) AS ctr_pct
       |FROM br
       |LEFT JOIN resp ON br.request_id = resp.request_id
       |LEFT JOIN imp ON br.request_id = imp.i_request_id
       |LEFT JOIN clk ON imp.impression_id = clk.c_impression_id""".stripMargin) { t =>
    registerBaseStreams(t.spark)
    t.spark.sql(example13)
  }

  /** A second literal replay for the VIEW surface: #15's text runs
    * against the registered `dq_rejected_events` view name — proving
    * the view registrations resolve, not just the base streams.
    * Covered by the dq row's own oracle; here the count-by-reason text
    * must agree with a direct re-aggregation of the registered view.
    */
  private[operators] def example15(spark: SparkSession): org.apache.spark.sql.DataFrame =
    spark.sql(
      """SELECT reject_reason, COUNT(*) AS rejected_count
        |   FROM dq_rejected_events
        |   GROUP BY reject_reason
        |   ORDER BY rejected_count DESC
        |   LIMIT 10""".stripMargin)

  val all: Seq[QueryDef] = Seq(x3SqlSurface)
}

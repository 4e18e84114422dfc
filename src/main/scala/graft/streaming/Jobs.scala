package graft.streaming

import graft.model.OpenRtb._
import graft.rtb.RtbIngest
import graft.tables.{DayTransform, GraftTable, TableCatalog, TableDef}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** The reference's deployment topology as a library API: three Flink
  * jobs chained through Iceberg tables (README.md architecture diagram)
  * become streaming ingestion into the snapshot-log tables plus batch
  * serving views over them.
  *
  *  - [[ingestion]] — the statement-set job (insert_jobs.sql:11-235):
  *    four watermarked sources fan into the stored tables; the request
  *    stream feeds clean AND rejected from ONE cached micro-batch pass
  *    (X1), every sink exactly-once (S4).
  *  - [[servingFunnelHourly]] — the Trino funnel view
  *    (v_event_enriched_full_funnel.sql:75-84 + v_agg_funnel_by_publisher):
  *    batch 4-stage funnel over the INGESTED tables, reusing the same
  *    chained-join/agg code as the raw-events form, so
  *    "stream through storage, then serve" must equal "aggregate the
  *    raw events directly" row for row.
  *  - [[servingMetricsByBidder]] — v_agg_serving_metrics.sql:15-20 (J8):
  *    clicks pre-aggregated per impression BEFORE the join (the fanout
  *    guard), then hourly bidder CTR.
  *
  * Scale: tables are day-partitioned on event time like the reference's
  * (bid_requests.yml:44-48); appends are the only streaming write shape
  * (continuous revision lives in the upsert sinks, [[Sinks]]); serving
  * reads prune by partition + footer stats.
  */
object Jobs {

  val cleanTable = "clean_requests"
  val rejectedTable = "rejected_requests"
  val bidsTable = "bids"
  val impressionsTable = "impressions"
  val clicksTable = "clicks"

  private def emptyDf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](), schema)

  private def flatRequestSchema(spark: SparkSession): StructType = {
    import spark.implicits._
    RtbIngest.flattenRequests(spark.emptyDataset[BidRequest].toDF()).schema
  }

  private def flatBidSchema(spark: SparkSession): StructType = {
    import spark.implicits._
    RtbIngest.flattenBids(spark.emptyDataset[BidResponse].toDF()).schema
  }

  private def withEventTs(spark: SparkSession, base: StructType): StructType =
    emptyDf(spark, base)
      .withColumn("event_ts", RtbIngest.parseTs(col("event_timestamp"))).schema

  /** Declarative registry of the ingestion tables (S6) — all
    * day-partitioned on the parsed event time.
    */
  def ingestionTableDefs(spark: SparkSession): Seq[TableDef] = {
    import spark.implicits._
    Seq(
      TableDef(cleanTable, flatRequestSchema(spark), Seq(DayTransform("event_ts"))),
      TableDef(rejectedTable, flatRequestSchema(spark), Seq(DayTransform("event_ts"))),
      TableDef(bidsTable, flatBidSchema(spark), Seq(DayTransform("event_ts"))),
      TableDef(impressionsTable,
        withEventTs(spark, spark.emptyDataset[ImpressionEvent].schema),
        Seq(DayTransform("event_ts"))),
      TableDef(clicksTable,
        withEventTs(spark, spark.emptyDataset[ClickEvent].schema),
        Seq(DayTransform("event_ts"))))
  }

  /** The running ingestion job: one streaming query per source stream,
    * exactly like the reference's one statement set over four topics.
    */
  final case class IngestionPipeline(queries: Seq[StreamingQuery]) {
    def processAllAvailable(): Unit = queries.foreach(_.processAllAvailable())
    def stop(): Unit = queries.foreach(_.stop())
  }

  /** S1/S2/S4/X1 — the ingestion statement set. `requests`..`clicks` are
    * UNBOUNDED streaming DataFrames of the nested wire rows (Kafka in
    * the reference; MemoryStream/file streams offline — same plan either
    * way). The request query is the fan-out: flatten ONCE per
    * micro-batch, cache, split into clean/rejected by `reject_reason`,
    * each side exactly-once into its table.
    */
  def ingestion(
      requests: DataFrame,
      responses: DataFrame,
      impressions: DataFrame,
      clicks: DataFrame,
      cat: TableCatalog,
      checkpointRoot: String): IngestionPipeline = {
    val clean = cat.table(cleanTable)
    val rejected = cat.table(rejectedTable)
    val bids = cat.table(bidsTable)
    val imps = cat.table(impressionsTable)
    val clks = cat.table(clicksTable)

    val requestsQ = requests
      .withColumn("event_ts", RtbIngest.parseTs(col("event_timestamp")))
      .withWatermark("event_ts", "30 seconds") // S2 (create_tables.sql:73)
      .drop("event_ts")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$checkpointRoot/requests")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val flat = RtbIngest.flattenRequests(batch).persist()
        try {
          Sinks.exactlyOnce(clean, "ingest", batchId) {
            clean.append(RtbIngest.cleanRequests(flat))
          }
          Sinks.exactlyOnce(rejected, "ingest", batchId) {
            rejected.append(RtbIngest.rejectedRequests(flat))
          }
        } finally flat.unpersist()
        ()
      }
      .start()

    def appendQ(src: DataFrame, table: GraftTable, name: String,
        transform: DataFrame => DataFrame): StreamingQuery =
      src
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$checkpointRoot/$name")
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          Sinks.exactlyOnce(table, "ingest", batchId) {
            table.append(transform(batch))
          }
          ()
        }
        .start()

    IngestionPipeline(Seq(
      requestsQ,
      appendQ(responses, bids, "responses", RtbIngest.flattenBids),
      appendQ(impressions, imps, "impressions",
        _.withColumn("event_ts", RtbIngest.parseTs(col("event_timestamp")))),
      appendQ(clicks, clks, "clicks",
        _.withColumn("event_ts", RtbIngest.parseTs(col("event_timestamp"))))))
  }

  /** J3/A2/A3/P10/P11 over the STORED tables — the reference's serving
    * funnel view. Requests = clean ∪ rejected (the raw table analog);
    * every stage dedups on its event id before the chained joins.
    */
  def servingFunnelHourly(cat: TableCatalog): DataFrame = {
    val r = cat.table(cleanTable).readLogical()
      .unionByName(cat.table(rejectedTable).readLogical())
      .select(col("request_id"), col("event_ts").as("r_ts"))
      .dropDuplicates("request_id")
    val b = cat.table(bidsTable).readLogical()
      .select(col("response_id"), col("request_id").as("b_request_id"),
        col("event_ts").as("b_ts"))
      .dropDuplicates("response_id")
    val i = cat.table(impressionsTable).readLogical()
      .select(col("impression_id"), col("request_id").as("i_request_id"),
        col("event_ts").as("i_ts"))
      .dropDuplicates("impression_id")
    val c = cat.table(clicksTable).readLogical()
      .select(col("click_id"), col("impression_id").as("c_impression_id"),
        col("event_ts").as("c_ts"))
      .dropDuplicates("click_id")
    RtbIngest.funnelHourlyFromStages(r, b, i, c)
  }

  /** J8/A1 — v_agg_serving_metrics: clicks pre-aggregated per impression
    * BEFORE the join (a click burst on one impression must not fan the
    * join out), then hourly per-bidder win spend and CTR.
    */
  def servingMetricsByBidder(cat: TableCatalog): DataFrame = {
    val i = cat.table(impressionsTable).readLogical()
      .dropDuplicates("impression_id")
    val clicksPer = cat.table(clicksTable).readLogical()
      .dropDuplicates("click_id")
      .groupBy(col("impression_id"))
      .agg(count(lit(1)).as("click_count"))
    i.join(clicksPer, Seq("impression_id"), "left")
      .groupBy(date_trunc("hour", col("event_ts")).as("hour"), col("bidder_id"))
      .agg(
        count(lit(1)).as("n_impressions"),
        round(sum(col("win_price")), 2).as("total_win_price"),
        sum(coalesce(col("click_count"), lit(0L))).as("n_clicks"))
      .withColumn("ctr",
        when(col("n_impressions") > 0,
          round(col("n_clicks").cast("double") / col("n_impressions"), 4)).otherwise(0.0))
  }
}

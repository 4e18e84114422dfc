package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.gen.RtbGenerator
import graft.model.OpenRtb._
import graft.rtb.RtbIngest
import graft.streaming.{Jobs, RtbFunnel}
import graft.tables.TableCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end topology test — the reference's full deployment
  * (generator → topics → ingestion job → tables → serving views) run
  * through [[Jobs]]: seeded generator events stream in two arrival
  * chunks through the ingestion statement-set into day-partitioned
  * tables, and the serving views over those tables must equal both the
  * batch recompute over the raw events AND the generator's own ground
  * truth. Any loss, duplication, mis-flatten, or mis-join anywhere in
  * the chain breaks an equality.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fresh(base: String, name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), base, name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private def assertSameRows(a: DataFrame, b: DataFrame, hint: String): Unit = {
    val extraA = a.exceptAll(b).count()
    val extraB = b.exceptAll(a).count()
    assert(extraA == 0 && extraB == 0,
      s"$hint: $extraA rows only in left, $extraB only in right")
  }

  test("streaming OpenRTB funnel (flatMapGroupsWithState) == batch funnel counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val start = 1704103200000L // 2024-01-01 10:00:00 UTC
    val funnel = RtbGenerator.generate(
      seed = 555L, nRequests = 600, startMs = start, spanMs = 30 * 60 * 1000L,
      rates = RtbGenerator.Rates(
        dupRequest = 0.05, dupResponse = 0.05, dupImpression = 0.05, dupClick = 0.05))

    val cat = new TableCatalog(spark, fresh("graft_pipeline_wh", "rtbfunnel"),
      Jobs.funnelTableDefs(spark))
    val rS = MemoryStream[BidRequest]
    val bS = MemoryStream[BidResponse]
    val iS = MemoryStream[ImpressionEvent]
    val cS = MemoryStream[ClickEvent]
    // the full funnel JOB: stateful funnel → summary table → tailed
    // hourly rollup, chained through storage like the reference's jobs
    val pipe = Jobs.funnel(rS.toDF(), bS.toDF(), iS.toDF(), cS.toDF(),
      cat, fresh("graft_pipeline_ckpt", "rtbfunnel"))

    def half[T](xs: Seq[T], first: Boolean) = {
      val (a, b) = xs.splitAt(xs.size / 2); if (first) a else b
    }
    for (first <- Seq(true, false)) {
      rS.addData(half(funnel.requests, first))
      bS.addData(half(funnel.responses, first))
      iS.addData(half(funnel.impressions, first))
      cS.addData(half(funnel.clicks, first))
      pipe.processAllAvailable()
    }
    // two far-future flush funnels: the first's summaries are finalized
    // by the second's watermark advance (timeouts fire the batch AFTER
    // the advance), which in turn closes every REAL hourly window in the
    // rollup's own tailing watermark
    for (k <- 0 until 2) {
      rS.addData(RtbGenerator.generate(900L + k, 3,
        start + (4 + k) * 3600 * 1000L, 1000L).requests)
      pipe.processAllAvailable()
      pipe.processAllAvailable() // summary files land, then the rollup tails them
    }
    pipe.stop()

    val streamed = cat.table(Jobs.funnelRollupTable).readLogical()
    val batch = RtbIngest.funnelHourly(
      spark.createDataset(funnel.requests).toDF(),
      spark.createDataset(funnel.responses).toDF(),
      spark.createDataset(funnel.impressions).toDF(),
      spark.createDataset(funnel.clicks).toDF())
      .select(col("hour"), col("n_requests"), col("n_responses"),
        col("n_impressions"), col("n_clicks"))
    assertSameRows(streamed, batch, "streaming OpenRTB funnel vs batch")
    // and against the generator's own truth
    val tot = streamed.agg(sum("n_requests"), sum("n_responses"),
      sum("n_impressions"), sum("n_clicks")).collect().head
    assert(tot.getLong(0) == funnel.truth.requests)
    assert(tot.getLong(1) == funnel.truth.responses)
    assert(tot.getLong(2) == funnel.truth.impressions)
    assert(tot.getLong(3) == funnel.truth.clicks)
  }

  test("generator → streaming ingestion → tables → serving == batch == truth") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // duplicates + every fault class ON so the dedup/reject paths carry
    val funnel = RtbGenerator.generate(
      seed = 20260812L, nRequests = 1200,
      startMs = 1704103200000L, // 2024-01-01 10:00:00 UTC
      spanMs = 2 * 3600 * 1000L,
      rates = RtbGenerator.Rates(
        dupRequest = 0.04, dupResponse = 0.04, dupImpression = 0.04, dupClick = 0.04))

    val cat = new TableCatalog(spark, fresh("graft_pipeline_wh", "e2e"),
      Jobs.ingestionTableDefs(spark) ++ Jobs.aggregationTableDefs(spark))
    val ckpt = fresh("graft_pipeline_ckpt", "e2e")

    val rS = MemoryStream[BidRequest]
    val bS = MemoryStream[BidResponse]
    val iS = MemoryStream[ImpressionEvent]
    val cS = MemoryStream[ClickEvent]
    val pipe = Jobs.ingestion(rS.toDF(), bS.toDF(), iS.toDF(), cS.toDF(), cat, ckpt)
    // the aggregation job runs CONCURRENTLY, tailing the tables the
    // ingestion job appends — the reference's job-chained topology
    val aggPipe = Jobs.aggregationGeo(cat, ckpt)

    // two arrival chunks — each source commits ≥2 micro-batches, so the
    // exactly-once guards and append commit chain are exercised
    def feed[T](s: MemoryStream[T], xs: Seq[T], firstHalf: Boolean): Unit = {
      val (a, b) = xs.splitAt(xs.size / 2)
      s.addData(if (firstHalf) a else b)
    }
    for (first <- Seq(true, false)) {
      feed(rS, funnel.requests, first)
      feed(bS, funnel.responses, first)
      feed(iS, funnel.impressions, first)
      feed(cS, funnel.clicks, first)
      pipe.processAllAvailable()
      aggPipe.processAllAvailable()
    }
    pipe.stop()
    aggPipe.stop()
    cat.checkDrift() // S7 on every ingested table

    // ingested tables == batch recompute over the raw events
    val rawReq = spark.createDataset(funnel.requests).toDF()
    val rawResp = spark.createDataset(funnel.responses).toDF()
    val rawImp = spark.createDataset(funnel.impressions).toDF()
    val rawClk = spark.createDataset(funnel.clicks).toDF()
    val flatBatch = RtbIngest.flattenRequests(rawReq)
    assertSameRows(cat.table(Jobs.cleanTable).readLogical(),
      RtbIngest.cleanRequests(flatBatch), "clean_requests")
    assertSameRows(cat.table(Jobs.rejectedTable).readLogical(),
      RtbIngest.rejectedRequests(flatBatch), "rejected_requests")
    assertSameRows(cat.table(Jobs.bidsTable).readLogical(),
      RtbIngest.flattenBids(rawResp), "bids")

    // serving funnel over stored tables == batch funnel over raw events
    val served = Jobs.servingFunnelHourly(cat)
    val batchFunnel = RtbIngest.funnelHourly(rawReq, rawResp, rawImp, rawClk)
    assertSameRows(served, batchFunnel, "serving funnel vs batch funnel")

    // ... == the generator's own bookkeeping (stage latencies are within
    // the join windows by construction, so nothing may fall out)
    val tot = served.agg(
      sum("n_requests"), sum("n_responses"), sum("n_impressions"), sum("n_clicks"))
      .collect().head
    assert(tot.getLong(0) == funnel.truth.requests, "funnel n_requests vs truth")
    assert(tot.getLong(1) == funnel.truth.responses, "funnel n_responses vs truth")
    assert(tot.getLong(2) == funnel.truth.impressions, "funnel n_impressions vs truth")
    assert(tot.getLong(3) == funnel.truth.clicks, "funnel n_clicks vs truth")

    // serving metrics (J8 pre-agg guard): totals vs truth — duplicate
    // impressions/clicks injected by the generator must all collapse
    val metrics = Jobs.servingMetricsByBidder(cat)
    val mTot = metrics.agg(sum("n_impressions"), sum("n_clicks")).collect().head
    assert(mTot.getLong(0) == funnel.truth.impressions, "metrics n_impressions vs truth")
    assert(mTot.getLong(1) == funnel.truth.clicks, "metrics n_clicks vs truth")

    // the aggregation job's continuously-revised geo table == the batch
    // twin (dedup → interval join → hourly agg) over the raw events
    val rB = RtbIngest.cleanRequests(flatBatch)
      .select(col("request_id"), col("device_geo_country").as("country"), col("event_ts"))
      .dropDuplicates("request_id").alias("r")
    val iB = rawImp
      .withColumn("event_ts", RtbIngest.parseTs(col("event_timestamp")))
      .dropDuplicates("impression_id").alias("i")
    val geoBatch = iB.join(rB,
      expr("""i.request_id = r.request_id AND
             |r.event_ts BETWEEN i.event_ts - INTERVAL 15 SECONDS AND i.event_ts""".stripMargin))
      .select(date_trunc("hour", col("i.event_ts")).as("hour"), col("r.country"),
        round(col("i.win_price") * 100).cast("long").as("win_cents"))
      .groupBy(col("hour"), col("country"))
      .agg(count(lit(1)).as("n_impressions"),
        sum(col("win_cents")).as("total_win_cents"))
      // materialized: exceptAll between this plan (explode→join→agg) and
      // the table scan trips a Catalyst attribute-dedup bug
      // (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND binding the Generate)
      .localCheckpoint()
    assertSameRows(cat.table(Jobs.geoTable).readLogical(), geoBatch,
      "hourly_impressions_by_geo vs batch twin")

    // the injected rejects all landed in rejected_requests with the
    // right precedence-ordered reasons
    val rej = cat.table(Jobs.rejectedTable).readLogical()
    assert(rej.filter(col("reject_reason") === "TEST_PUBLISHER")
      .select(countDistinct(col("request_id"))).collect().head.getLong(0)
      == funnel.truth.testPublisherRequests, "TEST_PUBLISHER rejects vs truth")
  }

  test("statement-set fan-out flattens once: both request sinks read the shared cache (X1)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val funnel = RtbGenerator.generate(
      seed = 777L, nRequests = 300,
      startMs = 1704103200000L, spanMs = 3600 * 1000L,
      rates = RtbGenerator.Rates()) // test-publisher/private-ip faults are structural, both sinks fill
    val cat = new TableCatalog(spark, fresh("graft_pipeline_wh", "fusion"),
      Jobs.ingestionTableDefs(spark))
    val ckpt = fresh("graft_pipeline_ckpt", "fusion")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        plans.add(qe.executedPlan.toString); ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(qel)
    try {
      val rS = MemoryStream[BidRequest]
      val bS = MemoryStream[BidResponse]
      val iS = MemoryStream[ImpressionEvent]
      val cS = MemoryStream[ClickEvent]
      val pipe = Jobs.ingestion(rS.toDF(), bS.toDF(), iS.toDF(), cS.toDF(), cat, ckpt)
      rS.addData(funnel.requests)
      pipe.processAllAvailable()
      pipe.stop()
      // the listener bus is async — wait for both request-sink writes
      val deadline = System.nanoTime() + 10_000_000_000L
      def sinkWrites = {
        import scala.jdk.CollectionConverters._
        plans.asScala.toSeq.filter(pl =>
          pl.contains(Jobs.cleanTable) || pl.contains(Jobs.rejectedTable))
      }
      while (sinkWrites.size < 2 && System.nanoTime() < deadline) Thread.sleep(100)
      val writes = sinkWrites
      assert(writes.size >= 2, s"expected clean+rejected sink writes, saw ${writes.size}")
      // X1's shared-read contract: the statement set flattens the nested
      // batch ONCE; each sink's write plan must scan the shared cache —
      // a raw re-flatten here means the source is read N times per batch
      writes.foreach(pl => assert(pl.contains("InMemoryTableScan"),
        s"request sink write does not read the shared cached flatten:\n$pl"))
    } finally spark.listenerManager.unregister(qel)
  }
}

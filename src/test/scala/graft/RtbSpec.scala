package graft

import graft.gen.RtbGenerator
import graft.gen.RtbGenerator.Rates
import graft.model.OpenRtb._
import graft.rtb.RtbIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The OpenRTB pipeline against the generator's own ground truth: the
  * seeded generator KNOWS how many test-publisher / private-IP / app /
  * non-USD / duplicate events it injected, so every enrichment and
  * filter column is checked against exact expected counts — the
  * engine-level analog of the reference's fault-injection switches
  * (mock_data_gen/config.py:54-76) existing "to exercise a specific
  * pipeline feature".
  */
class RtbSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val t0 = java.sql.Timestamp.valueOf("2024-04-01 00:00:00").getTime

  private lazy val funnel = RtbGenerator.generate(
    seed = 42L, nRequests = 1500, startMs = t0, spanMs = 2L * 3600 * 1000,
    rates = Rates(dupRequest = 0.04, dupResponse = 0.04, dupImpression = 0.04, dupClick = 0.04))

  private lazy val requestsDf: DataFrame = {
    import spark.implicits._
    spark.createDataset(funnel.requests).toDF()
  }
  private lazy val flat = RtbIngest.flattenRequests(requestsDf).cache()

  test("nested schema round-trips: imp[], site/app union, device.geo, regs.ext") {
    val sch = requestsDf.schema
    assert(sch("imp").dataType.typeName == "array")
    assert(sch("site").nullable && sch("app").nullable)
    // exactly one of site/app per request — the OpenRTB union invariant
    assert(requestsDf.filter(col("site").isNull === col("app").isNull).count() == 0)
  }

  test("U1 explode yields one row per (request, imp); duplicates included") {
    val expected = funnel.requests.map(_.imp.size).sum
    assert(flat.count() == expected.toLong)
  }

  test("P5/P9: reject reasons match the generator's injections exactly") {
    val dedup = flat.dropDuplicates("request_id", "imp_id")
    // distinct requests per reason, priority TEST_PUBLISHER > PRIVATE_IP >
    // NON_POSITIVE_BIDFLOOR — recompute expectations from the raw events
    def nReq(p: BidRequest => Boolean) = funnel.requests.distinct.count(p).toLong
    val expTest = nReq(r => r.site.map(_.publisher.id).orElse(r.app.map(_.publisher.id)).get <= 0)
    val gotTest = dedup.filter(col("reject_reason") === "TEST_PUBLISHER")
      .select("request_id").distinct().count()
    assert(gotTest == expTest)
    // mirrors the SQL LIKE patterns exactly: '172.2_.%' needs a two-digit
    // second octet (the `_` wildcard), so 172.2.x.x must NOT match
    def privLike(ip: String) =
      ip.startsWith("10.") || ip.startsWith("192.168.") || ip.startsWith("172.16.") ||
        ip.matches("^172\\.[23]\\d\\..*")
    val expPriv = nReq(r =>
      r.site.map(_.publisher.id).orElse(r.app.map(_.publisher.id)).get > 0 &&
        privLike(r.device.ip))
    val gotPriv = dedup.filter(col("reject_reason") === "PRIVATE_IP")
      .select("request_id").distinct().count()
    assert(gotPriv == expPriv)
    assert(dedup.filter(col("is_test_traffic")).select("request_id").distinct().count()
      == funnel.truth.testPublisherRequests.toLong)
  }

  test("P2/P7: site/app COALESCE and device classification") {
    assert(flat.filter(col("property_id").isNull).count() == 0)
    assert(flat.filter(col("publisher_id").isNull).count() == 0)
    val appRows = flat.dropDuplicates("request_id")
    assert(appRows.filter(col("is_app")).count() == funnel.truth.appRequests.toLong)
    // Mobile App only ever on app traffic; Mobile Web only on site traffic
    assert(flat.filter(col("device_category") === "Mobile App" && !col("is_app")).count() == 0)
    assert(flat.filter(col("device_category") === "Mobile Web" && col("is_app")).count() == 0)
    assert(flat.filter(col("device_category").isNull).count() == 0)
  }

  test("P3/P8: first-currency access and static FX normalization") {
    val eur = flat.filter(col("currency") === "EUR")
    assert(eur.filter(
      col("imp_bidfloor_usd") =!= round(col("imp_bidfloor") * 1.08, 4)).count() == 0)
    assert(flat.filter(col("currency") === "USD" &&
      col("imp_bidfloor_usd") =!= col("imp_bidfloor")).count() == 0)
    val nonUsdReq = flat.dropDuplicates("request_id").filter(col("currency") =!= "USD")
    assert(nonUsdReq.count() == funnel.truth.nonUsdRequests.toLong)
  }

  test("P4: ISO-microsecond wire timestamps parse losslessly") {
    assert(flat.filter(col("event_ts").isNull).count() == 0)
    val span = flat.agg(
      min(col("event_ts")).cast("long").as("mn"),
      max(col("event_ts")).cast("long").as("mx")).head
    assert(span.getLong(0) >= t0 / 1000 && span.getLong(1) <= t0 / 1000 + 2 * 3600 + 1)
  }

  test("U2: double explode yields one row per bid (net of duplicate responses)") {
    import spark.implicits._
    val bids = RtbIngest.flattenBids(spark.createDataset(funnel.responses).toDF())
    assert(bids.select("bid_id").distinct().count() == funnel.truth.totalBids.toLong)
  }

  test("4-stage funnel counts equal the generator truth after dedup") {
    import spark.implicits._
    val hourly = RtbIngest.funnelHourly(
      requestsDf,
      spark.createDataset(funnel.responses).toDF(),
      spark.createDataset(funnel.impressions).toDF(),
      spark.createDataset(funnel.clicks).toDF())
    val tot = hourly.agg(
      sum("n_requests"), sum("n_responses"), sum("n_impressions"), sum("n_clicks")).head
    assert(tot.getLong(0) == funnel.truth.requests.toLong)
    assert(tot.getLong(1) == funnel.truth.responses.toLong)
    assert(tot.getLong(2) == funnel.truth.impressions.toLong)
    assert(tot.getLong(3) == funnel.truth.clicks.toLong)
    // guarded rates bounded and funnel monotone per hour
    val bad = hourly.filter(
      col("fill_rate") < 0 || col("fill_rate") > 1 ||
        col("win_rate") < 0 || col("win_rate") > 1 ||
        col("ctr") < 0 || col("ctr") > 1 ||
        col("n_requests") < col("n_responses") ||
        col("n_responses") < col("n_impressions") ||
        col("n_impressions") < col("n_clicks")).count()
    assert(bad == 0)
  }

  test("clean + rejected partition the exploded rows (statement-set split)") {
    val n = flat.count()
    assert(RtbIngest.cleanRequests(flat).count() + RtbIngest.rejectedRequests(flat).count() == n)
  }
}

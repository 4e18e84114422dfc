package graft.gen

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import graft.model.OpenRtb._
import scala.util.Random

/** Deterministic, seeded funnel generator — the engine's port of the
  * reference's producer semantics (mock_data_gen/generator.py:275-394,
  * rates config.py:46-76): every request may cascade
  * response (60%) → impression (15%) → click (5%), with fault
  * injection for every downstream pipeline feature —
  * duplicates (dedup tests), test publishers (negative ids), RFC1918
  * private IPs, app-vs-site traffic (30%), non-USD currencies (10%),
  * zero bidfloors. Backfill semantics: the n requests are spread evenly
  * across [start, start+span) (generator.py:163-272).
  *
  * Same seed ⇒ identical output, so tests assert EXACT counts against
  * [[Truth]], the generator's own bookkeeping.
  */
object RtbGenerator {

  final case class Rates(
      response: Double = 0.60,
      win: Double = 0.15,
      click: Double = 0.05,
      dupRequest: Double = 0.0,
      dupResponse: Double = 0.0,
      dupImpression: Double = 0.0,
      dupClick: Double = 0.0,
      testPublisher: Double = 0.05,
      privateIp: Double = 0.02,
      appTraffic: Double = 0.30,
      nonUsd: Double = 0.10,
      zeroBidfloor: Double = 0.03)

  /** Ground truth the generator accumulated while producing. */
  final case class Truth(
      requests: Int,
      responses: Int,
      impressions: Int,
      clicks: Int,
      dupRequests: Int,
      dupResponses: Int,
      dupImpressions: Int,
      dupClicks: Int,
      testPublisherRequests: Int,
      privateIpRequests: Int,
      appRequests: Int,
      nonUsdRequests: Int,
      zeroBidfloorRequests: Int,
      totalBids: Int)

  final case class Funnel(
      requests: Seq[BidRequest],
      responses: Seq[BidResponse],
      impressions: Seq[ImpressionEvent],
      clicks: Seq[ClickEvent],
      truth: Truth)

  private val isoMicros =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS").withZone(ZoneOffset.UTC)

  private def iso(ms: Long, extraMicros: Long): String =
    isoMicros.format(Instant.ofEpochMilli(ms).plusNanos(extraMicros * 1000))

  private val countries = Seq("US", "GB", "DE", "FR", "JP", "BR", "IN", "CA")
  private val oses = Seq("iOS", "Android", "Windows", "macOS", "Linux")
  private val currencies = Seq("EUR", "GBP", "JPY")
  private val cats = Seq("IAB1", "IAB2", "IAB3", "IAB9", "IAB12", "IAB19")
  private val privateIpPrefixes = Seq("10.", "192.168.", "172.16.", "172.20.", "172.28.")

  def generate(
      seed: Long,
      nRequests: Int,
      startMs: Long,
      spanMs: Long,
      rates: Rates = Rates()): Funnel = {
    val rnd = new Random(seed)
    val reqs = Seq.newBuilder[BidRequest]
    val resps = Seq.newBuilder[BidResponse]
    val imps = Seq.newBuilder[ImpressionEvent]
    val clks = Seq.newBuilder[ClickEvent]
    var (nResp, nImp, nClk) = (0, 0, 0)
    var (dReq, dResp, dImp, dClk) = (0, 0, 0, 0)
    var (nTest, nPriv, nApp, nNonUsd, nZeroFloor, nBids) = (0, 0, 0, 0, 0, 0)

    for (i <- 0 until nRequests) {
      val tMs = startMs + (spanMs.toDouble * i / nRequests).toLong
      val requestId = f"req-$seed%x-$i%08d"
      val isTest = rnd.nextDouble() < rates.testPublisher
      val isPriv = rnd.nextDouble() < rates.privateIp
      val isApp = rnd.nextDouble() < rates.appTraffic
      val isNonUsd = rnd.nextDouble() < rates.nonUsd
      val isZeroFloor = rnd.nextDouble() < rates.zeroBidfloor
      if (isTest) nTest += 1
      if (isPriv) nPriv += 1
      if (isApp) nApp += 1
      if (isNonUsd) nNonUsd += 1
      if (isZeroFloor) nZeroFloor += 1

      val pubId = if (isTest) -(1 + rnd.nextInt(50)) else 1 + rnd.nextInt(30)
      val publisher = Publisher(pubId, s"publisher-$pubId")
      val cur = if (isNonUsd) currencies(rnd.nextInt(currencies.size)) else "USD"
      val nImps = 1 + rnd.nextInt(3)
      val impList = (0 until nImps).map { j =>
        Imp(
          id = s"$requestId-imp-$j",
          banner = Banner(Seq(300, 728, 320)(rnd.nextInt(3)), Seq(250, 90, 50)(rnd.nextInt(3)),
            rnd.nextInt(8)),
          bidfloor = if (isZeroFloor) 0.0 else math.rint((0.1 + rnd.nextDouble() * 4.9) * 100) / 100,
          bidfloorcur = cur,
          secure = rnd.nextInt(2))
      }
      val ip =
        if (isPriv) privateIpPrefixes(rnd.nextInt(privateIpPrefixes.size)) +
          s"${rnd.nextInt(256)}.${rnd.nextInt(256)}"
        else s"${1 + rnd.nextInt(222)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${1 + rnd.nextInt(254)}"
      val country = countries(rnd.nextInt(countries.size))
      val deviceType = 1 + rnd.nextInt(7)
      val device = Device(
        ua = s"Agent/${1 + rnd.nextInt(9)}.0",
        ip = ip,
        geo = Geo(math.rint(rnd.nextDouble() * 180 - 90) / 1.0,
          math.rint(rnd.nextDouble() * 360 - 180) / 1.0, country, s"$country-${rnd.nextInt(20)}"),
        devicetype = deviceType,
        os = oses(rnd.nextInt(oses.size)),
        osv = s"${10 + rnd.nextInt(8)}.${rnd.nextInt(5)}")
      val siteCat = Seq.fill(1 + rnd.nextInt(2))(cats(rnd.nextInt(cats.size))).distinct
      val (site, app) =
        if (isApp)
          (None, Some(App(s"app-${rnd.nextInt(500)}", s"com.example.a${rnd.nextInt(500)}",
            "https://store.example/app", siteCat, publisher)))
        else
          (Some(Site(s"site-${rnd.nextInt(500)}", s"site${rnd.nextInt(500)}.example.com", siteCat,
            "/index.html", publisher)), None)

      val req = BidRequest(
        id = requestId,
        imp = impList,
        device = device,
        user = User(s"user-${rnd.nextInt(5000)}", s"buyer-${rnd.nextInt(5000)}"),
        at = 1 + rnd.nextInt(2),
        tmax = 100 + rnd.nextInt(200),
        cur = Seq(cur),
        source = Source(rnd.nextInt(2), s"tid-$i"),
        regs = Regs(rnd.nextInt(2), RegsExt(rnd.nextInt(2))),
        site = site,
        app = app,
        event_timestamp = iso(tMs, rnd.nextInt(1000)),
        received_at = iso(tMs + rnd.nextInt(100), 0))
      reqs += req
      if (rnd.nextDouble() < rates.dupRequest) { reqs += req; dReq += 1 }

      if (rnd.nextDouble() < rates.response) {
        val respMs = tMs + 50 + rnd.nextInt(4900) // ≤ 5 s stage latency
        val bidderId = 1 + rnd.nextInt(24)
        val seatbids = (0 until 1 + rnd.nextInt(2)).map { s =>
          SeatBid(bidderId + s, (0 until 1 + rnd.nextInt(2)).map { b =>
            val tgt = impList(rnd.nextInt(impList.size))
            Bid(s"$requestId-bid-$s-$b", tgt.id,
              math.rint((tgt.bidfloor + rnd.nextDouble() * 5) * 100) / 100,
              s"ad-${rnd.nextInt(900)}", 1 + rnd.nextInt(200),
              Seq(s"adv${rnd.nextInt(60)}.example.com"),
              tgt.banner.w, tgt.banner.h,
              if (rnd.nextInt(4) == 0) Some(1 + rnd.nextInt(40)) else None,
              Some(1 + rnd.nextInt(60)), Some(1 + rnd.nextInt(120)),
              Some(1 + rnd.nextInt(180)), Some(1 + rnd.nextInt(20)),
              Some(1 + rnd.nextInt(5)))
          })
        }
        nBids += seatbids.map(_.bid.size).sum
        val resp = BidResponse(s"resp-$i", seatbids, s"bidid-$i", cur,
          BidResponseExt(requestId), iso(respMs, rnd.nextInt(1000)), iso(respMs + 10, 0))
        resps += resp
        nResp += 1
        if (rnd.nextDouble() < rates.dupResponse) { resps += resp; dResp += 1 }

        if (rnd.nextDouble() < rates.win) {
          val impMs = respMs + 100 + rnd.nextInt(9900) // ≤ 10 s
          val winBid = seatbids.head.bid.head
          val impEv = ImpressionEvent(s"impr-$i", requestId, resp.id, winBid.impid,
            seatbids.head.seat, winBid.price, cur, winBid.crid,
            winBid.adomain.head, iso(impMs, rnd.nextInt(1000)))
          imps += impEv
          nImp += 1
          if (rnd.nextDouble() < rates.dupImpression) { imps += impEv; dImp += 1 }

          if (rnd.nextDouble() < rates.click) {
            val clkMs = impMs + 500 + rnd.nextInt(59500) // ≤ 60 s
            val clk = ClickEvent(s"clk-$i", requestId, impEv.impression_id,
              winBid.impid, impEv.bidder_id, winBid.crid,
              s"https://adv.example.com/c/${rnd.nextInt(100000)}", iso(clkMs, rnd.nextInt(1000)))
            clks += clk
            nClk += 1
            if (rnd.nextDouble() < rates.dupClick) { clks += clk; dClk += 1 }
          }
        }
      }
    }
    Funnel(reqs.result(), resps.result(), imps.result(), clks.result(),
      Truth(nRequests, nResp, nImp, nClk, dReq, dResp, dImp, dClk,
        nTest, nPriv, nApp, nNonUsd, nZeroFloor, nBids))
  }
}

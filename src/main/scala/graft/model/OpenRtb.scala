package graft.model

/** The four funnel event types as typed Scala case classes — the
  * engine's schema source of truth, mirroring the reference's Avro
  * records (schemas/avro/bid_request.avsc, bid_response.avsc,
  * impression.avsc, click.avsc) including the nested arrays
  * (imp[], seatbid[] → bid[]), the site/app null-union, and wire
  * timestamps as ISO-8601 STRINGS parsed in-engine (P4 — the reference
  * parses them with TO_TIMESTAMP(SUBSTRING(...)), create_tables.sql:71).
  *
  * `Dataset[BidRequest]` etc. give compile-time schema checking; the
  * implicit product encoders derive the same nested StructType the
  * reference declares in its Flink source DDL.
  */
object OpenRtb {

  final case class Banner(w: Int, h: Int, pos: Int)

  final case class Imp(
      id: String,
      banner: Banner,
      bidfloor: Double,
      bidfloorcur: String,
      secure: Int)

  final case class Geo(lat: Double, lon: Double, country: String, region: String)

  final case class Device(
      ua: String,
      ip: String,
      geo: Geo,
      devicetype: Int,
      os: String,
      osv: String)

  final case class User(id: String, buyeruid: String)

  final case class Publisher(id: Int, name: String)

  final case class Site(
      id: String,
      domain: String,
      cat: Seq[String],
      page: String,
      publisher: Publisher)

  final case class App(
      id: String,
      bundle: String,
      storeurl: String,
      cat: Seq[String],
      publisher: Publisher)

  final case class Source(fd: Int, tid: String)

  final case class RegsExt(gdpr: Int)

  final case class Regs(coppa: Int, ext: RegsExt)

  /** site/app is the OpenRTB null-union: exactly one is defined. */
  final case class BidRequest(
      id: String,
      imp: Seq[Imp],
      device: Device,
      user: User,
      at: Int,
      tmax: Int,
      cur: Seq[String],
      source: Source,
      regs: Regs,
      site: Option[Site],
      app: Option[App],
      event_timestamp: String,
      received_at: String)

  final case class Bid(
      id: String,
      impid: String,
      price: Double,
      adid: String,
      crid: Int,
      adomain: Seq[String],
      w: Int,
      h: Int,
      dealid: Option[Int],
      campaign_id: Option[Int],
      line_item_id: Option[Int],
      strategy_id: Option[Int],
      advertiser_id: Option[Int],
      agency_id: Option[Int])

  final case class SeatBid(seat: Int, bid: Seq[Bid])

  final case class BidResponseExt(request_id: String)

  final case class BidResponse(
      id: String,
      seatbid: Seq[SeatBid],
      bidid: String,
      cur: String,
      ext: BidResponseExt,
      event_timestamp: String,
      received_at: String)

  final case class ImpressionEvent(
      impression_id: String,
      request_id: String,
      response_id: String,
      imp_id: String,
      bidder_id: Int,
      win_price: Double,
      win_currency: String,
      creative_id: Int,
      ad_domain: String,
      event_timestamp: String)

  final case class ClickEvent(
      click_id: String,
      request_id: String,
      impression_id: String,
      imp_id: String,
      bidder_id: Int,
      creative_id: Int,
      click_url: String,
      event_timestamp: String)
}

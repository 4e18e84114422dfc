package graft

import graft.functions.PrepOps
import graft.operators.{RelationalOps, SessionOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the session/as-of operators and the
  * corpus-preparation layer (value-level correctness is the DuckDB
  * oracle gate; these pin the properties a hash compare can't express).
  */
class SessionPrepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("sessionize: sessions per user are disjoint and cover every event") {
    val sessions = SessionOps.wSessionize.run(spark, sf).cache()
    // disjoint: no session starts before the previous one ends (same user)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("session_start"))
    val overlaps = sessions
      .withColumn("prev_end", lag(col("session_end"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("session_start") < col("prev_end"))
      .count()
    assert(overlaps == 0, "session windows must not overlap within a user")
    // coverage: session event counts sum to the per-user event totals
    val fromSessions = sessions.groupBy(col("user_id"))
      .agg(sum(col("n_events")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromEvents = Tables(spark, sf).events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromSessions == fromEvents, "every event lands in exactly one session")
    sessions.unpersist()
  }

  test("asof join: match precedes the purchase; one output row per purchase") {
    val t = Tables(spark, sf)
    val out = SessionOps.j11AsofJoin.run(spark, sf).cache()
    val bad = out.filter(col("click_ts").isNotNull &&
      (col("click_ts") > col("ts") || col("gap_s") < 0)).count()
    assert(bad == 0, "matched click must be at or before the purchase ts")
    val nPurchases = t.events.filter(col("event_type") === "purchase").count()
    assert(out.count() == nPurchases, "LEFT semantics: every purchase emits once")
    // the match really is the LATEST qualifying click: no other click by
    // the same user lies strictly between click_ts and ts
    val clicks = t.events.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("c2_ts"))
    val stale = out.filter(col("click_ts").isNotNull).join(clicks,
      col("user_id") === col("cu") &&
        col("c2_ts") > col("click_ts") && col("c2_ts") <= col("ts") &&
        col("c2_ts") =!= col("click_ts")).count()
    assert(stale == 0, "a later qualifying click must win")
    out.unpersist()
  }

  test("rollup: subtotals and grand total are consistent with the leaves") {
    val out = RelationalOps.a9Rollup.run(spark, sf).cache()
    val leafN = out.filter(col("gid") === 0)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val totalN = out.filter(col("gid") === 3)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val subN = out.filter(col("gid") === 2)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(leafN == totalN && subN == totalN,
      s"every rollup level must count the same rows ($leafN/$subN/$totalN)")
    assert(out.filter(col("gid") === 3).count() == 1, "exactly one grand-total row")
    out.unpersist()
  }

  test("chunking: strides tile the document; every chunk is in-bounds text") {
    val t = Tables(spark, sf)
    val chunks = PrepOps.textChunk.run(spark, sf).cache()
    val counts = chunks.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_chunks"), max(col("chunk_idx")).as("max_idx"))
    val expected = t.documents.filter(length(col("text")) > 0)
      .select(col("doc_id"), (expr("(length(text) - 1) div 150") + 1).as("want"))
    val wrong = counts.join(expected, "doc_id")
      .filter(col("n_chunks") =!= col("want") || col("max_idx") =!= col("want") - 1)
      .count()
    assert(wrong == 0, "chunk count must be floor((len-1)/stride)+1, ids contiguous")
    // each chunk is exactly min(size, remaining text) characters —
    // with size (200) > stride (150) the tail chunks are the short ones
    val lens = t.documents.select(col("doc_id"), length(col("text")).as("len"))
    val badLen = chunks.join(lens, "doc_id")
      .filter(col("chunk_len") =!=
        least(lit(200), col("len") - col("chunk_idx") * 150)).count()
    assert(badLen == 0, "chunk length must be min(window, remaining)")
    chunks.unpersist()
  }

  test("tf-idf: one keyword per document, df consistent with corpus usage") {
    val out = PrepOps.textTfidf.run(spark, sf).cache()
    val t = Tables(spark, sf)
    assert(out.count() == out.select(col("doc_id")).distinct().count())
    assert(out.filter(col("tf") < 1 || col("df") < 1 || col("df") > 500).count() == 0)
    // a term's df can never exceed the number of documents containing it…
    // spot-check: recompute df for the 5 most common top_terms
    val top5 = out.groupBy(col("top_term")).count()
      .orderBy(col("count").desc, col("top_term")).limit(5)
      .collect().map(_.getString(0))
    val docs = t.documents.select(col("doc_id"),
      explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(col("term").isin(top5.toSeq: _*))
      .groupBy(col("term")).agg(countDistinct(col("doc_id")).as("true_df"))
    val mismatched = out.filter(col("top_term").isin(top5.toSeq: _*))
      .select(col("top_term").as("term"), col("df")).distinct()
      .join(docs, "term").filter(col("df") =!= col("true_df")).count()
    assert(mismatched == 0, "df must equal the number of documents using the term")
    out.unpersist()
  }

  test("weighted mix: keep decisions are deterministic and tier-ordered") {
    val a = PrepOps.sampleWeightedMix.run(spark, sf)
    val b = PrepOps.sampleWeightedMix.run(spark, sf)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "hash sampling must be reproducible")
    // per-tier keep fractions must be ordered t1 > t2 > t3 > tail
    // (25 docs/source at sf0.001 is noisy per-source, so compare tiers)
    def tierOf = when(col("source").isin((0 to 4).map("src" + _): _*), 1)
      .when(col("source").isin((5 to 9).map("src" + _): _*), 2)
      .when(col("source").isin((10 to 14).map("src" + _): _*), 3)
      .otherwise(4)
    val total = Tables(spark, sf).documents.groupBy(tierOf.as("tier"))
      .agg(count(lit(1)).as("all_n"))
    val kept = a.groupBy(tierOf.as("tier")).agg(count(lit(1)).as("kept_n"))
    val rates = total.join(kept, "tier")
      .select(col("tier"), (col("kept_n").cast("double") / col("all_n")).as("rate"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(rates(1) > rates(2) && rates(2) > rates(3) && rates(3) > rates(4),
      s"keep rates must follow the mix weights: $rates")
    assert(rates(1) > 0.75 && rates(4) < 0.25, s"rates far off their weights: $rates")
  }

  test("pii scrub: no email/phone pattern survives redaction") {
    val out = PrepOps.textPiiScrub.run(spark, sf).cache()
    assert(out.filter(col("n_emails") < 1 || col("n_phones") < 1).count() == 0,
      "the fixture injects at least one of each per document")
    val leaked = out.filter(
      col("scrubbed").rlike("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}") ||
        col("scrubbed").rlike("\\+?\\d[\\d-]{6,}\\d")).count()
    assert(leaked == 0, "scrubbed text must contain no redactable pattern")
    assert(out.filter(!col("scrubbed").contains("<EMAIL>")).count() == 0)
    out.unpersist()
  }
}

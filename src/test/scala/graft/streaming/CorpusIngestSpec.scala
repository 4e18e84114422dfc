package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp
import java.util.Comparator

import graft.SparkTestSession
import graft.tables.{GraftTable, TableDef}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

case class Doc(doc_id: Long, text: String, lang: String, source: String, ingest_ts: Timestamp)

/** Streaming corpus ingestion == batch recompute: in-flight digest dedup
  * keeps the first arrival, the quality gate routes rejects, and the
  * fan-out lands both tables exactly-once.
  */
class CorpusIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fresh(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_corpus", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  // 100 ms ticks: the WHOLE timeline spans ~6 s, well inside the 30 s
  // watermark horizon — dropDuplicatesWithinWatermark only guarantees
  // dedup for copies arriving within the horizon of the original
  // (state outside it is evicted by design)
  private def at(ticks: Long) = new Timestamp(t0.getTime + ticks * 100L)

  private val cleanSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("ingest_ts", TimestampType), StructField("digest", LongType),
    StructField("n_tokens", IntegerType), StructField("simhash", LongType)))
  private val rejectedSchema = StructType(cleanSchema.fields :+
    StructField("reject_reason", StringType))

  test("streamed ingest equals batch recompute; duplicates and rejects routed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy("doc_id").limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

    // batch 1: docs 0–39, unique texts (dedup within a batch keeps an
    // arbitrary row, so duplicates are injected ONLY across batches)
    val batch1 = base.take(40).zipWithIndex.map { case ((id, tx, lg, src), i) =>
      Doc(id, tx, lg, src, at(i)) }
    // batch 2: docs 40–59 (new), re-crawled copies of the first 10 texts
    // under NEW ids (same digest, later ts — must be dropped), and three
    // quality violations
    val recrawls = base.take(10).zipWithIndex.map { case ((_, tx, lg, src), i) =>
      Doc(9000L + i, tx, lg, src, at(50 + i)) }
    val junk = Seq(
      Doc(9100L, "ab", "en", "junk", at(62)),                   // TOO_SHORT
      Doc(9101L, "hello there", "en", "junk", at(63)),          // TOO_FEW_TOKENS
      Doc(9102L, "x x x x x x x x x x", "en", "junk", at(64)))  // LOW_DIVERSITY
    val batch2 = base.slice(40, 60).zipWithIndex.map { case ((id, tx, lg, src), i) =>
      Doc(id, tx, lg, src, at(45 + i)) } ++ recrawls ++ junk

    val clean = new GraftTable(spark,
      TableDef("corpus_clean", cleanSchema), fresh("clean"))
    val rejected = new GraftTable(spark,
      TableDef("corpus_rejected", rejectedSchema), fresh("rejected"))

    val src = MemoryStream[Doc]
    val q = CorpusIngest.ingest(src.toDF(), clean, rejected, fresh("ckpt"))
    try {
      src.addData(batch1)
      q.processAllAvailable()
      src.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    // batch twin: enrich everything, keep the earliest arrival per digest
    val all = (batch1 ++ batch2).toSeq.toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("digest")).orderBy(col("ingest_ts"), col("doc_id"))
    val firstPerDigest = CorpusIngest.enrich(all)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    val expectClean = firstPerDigest.filter(col("reject_reason").isNull)
      .drop("reject_reason").localCheckpoint()
    val expectRejected = firstPerDigest.filter(col("reject_reason").isNotNull)
      .localCheckpoint()

    val gotClean = clean.readLogical().localCheckpoint()
    val gotRejected = rejected.readLogical().localCheckpoint()
    assert(gotClean.exceptAll(expectClean).count() == 0 &&
      expectClean.exceptAll(gotClean).count() == 0,
      "clean table must equal the batch recompute")
    assert(gotRejected.exceptAll(expectRejected).count() == 0 &&
      expectRejected.exceptAll(gotRejected).count() == 0,
      "rejected table must equal the batch recompute")

    // the 10 re-crawled duplicates were dropped in flight
    assert(gotClean.count() == 60 - 0) // 60 unique source docs, none rejected
    assert(gotClean.select("digest").distinct().count() == gotClean.count())
    assert(gotRejected.select("reject_reason").as[String].collect().sorted.toSeq ==
      Seq("LOW_DIVERSITY", "TOO_FEW_TOKENS", "TOO_SHORT"))
    // no digest lands on both sides of the gate
    assert(gotClean.select("digest").intersect(gotRejected.select("digest")).count() == 0)
  }

  test("null-text docs are rejected as MALFORMED, never deduped together") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two malformed docs plus one good one, all in one horizon: both
    // null-text rows must land in rejected (NOT collapse into one via
    // the NULL-digest trap) and none may reach the clean table
    val rows = Seq(
      Doc(1L, "a perfectly fine document with several words here", "en", "web", at(0)),
      Doc(2L, null, "en", "web", at(1)),
      Doc(3L, null, "en", "web", at(2)))
    val clean = new GraftTable(spark,
      TableDef("nt_clean", cleanSchema), fresh("ntclean"))
    val rejected = new GraftTable(spark,
      TableDef("nt_rej", rejectedSchema), fresh("ntrej"))
    val src = MemoryStream[Doc]
    val q = CorpusIngest.ingest(src.toDF(), clean, rejected, fresh("ntckpt"))
    try {
      src.addData(rows)
      q.processAllAvailable()
    } finally q.stop()
    assert(clean.readLogical().count() == 1)
    val rej = rejected.readLogical()
    assert(rej.count() == 2, "BOTH null-text docs must be rejected")
    assert(rej.select("reject_reason").as[String].collect().toSeq ==
      Seq("MALFORMED", "MALFORMED"))
    assert(rej.select("digest").distinct().count() == 2,
      "sentinel digests must be per-doc, not a shared NULL")
  }

  test("dedup completeness and gate routing are invariant to micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy("doc_id").limit(30).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    // 30 unique docs + 10 duplicates under new ids + 2 rejects, all
    // inside one watermark horizon; WHICH copy survives depends on the
    // split (in-batch dedup keeps an arbitrary row), so the invariant is
    // at DIGEST level: same kept set, same routing, for EVERY split
    val rows = base.zipWithIndex.map { case ((id, tx, lg, src), i) =>
      Doc(id, tx, lg, src, at(i)) } ++
      base.take(10).zipWithIndex.map { case ((_, tx, lg, src), i) =>
        Doc(5000L + i, tx, lg, src, at(31 + i)) } ++
      Seq(Doc(5100L, "ab", "en", "junk", at(45)),
        Doc(5101L, "z z z z z z z z z z", "en", "junk", at(46)))
    val expectedClean = CorpusIngest.enrich(rows.toSeq.toDF())
      .filter(col("reject_reason").isNull)
      .select("digest").distinct().as[Long].collect().toSet
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val clean = new GraftTable(spark,
        TableDef("pc_clean", cleanSchema), fresh(s"pclean$trial"))
      val rejected = new GraftTable(spark,
        TableDef("pc_rej", rejectedSchema), fresh(s"prej$trial"))
      val src = MemoryStream[Doc]
      val q = CorpusIngest.ingest(src.toDF(), clean, rejected, fresh(s"pckpt$trial"))
      try {
        var rest = rnd.shuffle(rows.toSeq)
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(rest.size)
          src.addData(rest.take(n))
          q.processAllAvailable()
          rest = rest.drop(n)
        }
      } finally q.stop()
      val gotClean = clean.readLogical()
      assert(gotClean.select("digest").as[Long].collect().toSet == expectedClean,
        s"trial $trial: kept digest set must not depend on the split")
      assert(gotClean.count() == expectedClean.size,
        s"trial $trial: exactly one survivor per digest")
      assert(rejected.readLogical().select("reject_reason").as[String]
        .collect().sorted.toSeq == Seq("LOW_DIVERSITY", "TOO_SHORT"),
        s"trial $trial: gate routing must not depend on the split")
    }
  }
}

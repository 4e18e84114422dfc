package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.SparkTestSession
import graft.functions.{DsirScoring, PrepOps}
import graft.tables.GraftTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class DDoc(doc_id: Long, source: String, text: String)

/** The streamed DSIR bucket statistics must be indistinguishable from
  * the batch computation: after ingesting the corpus in micro-batches,
  * scoring through [[DsirIngest.score]] must equal the `sample_dsir`
  * batch operator row for row (bucket counts are additive partials, so
  * arrival order and batch boundaries cannot matter), a replayed batch
  * must change nothing, and compaction must preserve every score.
  */
class DsirIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fresh(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_dsir", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long, Long, Boolean)] =
    df.select("doc_id", "source", "n_feats", "dsir_score", "selected")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet

  test("streamed statistics score identically to the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val counts = new GraftTable(spark, DsirIngest.countsDef, fresh("counts"))
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val docs = docsDf.select("doc_id", "source", "text").collect()
      .map(r => DDoc(r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_.doc_id).toSeq

    val src = MemoryStream[DDoc]
    val q = DsirIngest.countsAppend(src.toDF(), counts, fresh("ck"))
    docs.grouped(math.max(1, docs.size / 4)).foreach { g =>
      src.addData(g); q.processAllAvailable()
    }
    q.stop()

    val streamed = rows(DsirIngest.score(docsDf, counts))
    val batch = rows(PrepOps.sampleDsir.fn(spark, sf))
    assert(streamed == batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}; " +
        s"diff=${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
    // the cut must be a real split, or selected-parity is vacuous
    assert(batch.exists(_._5) && batch.exists(!_._5),
      "selection cut is degenerate on the fixture")

    // maintenance merge-compaction: physical rows collapse to one per
    // bucket, reads (and therefore scores) are unchanged
    val physBefore = counts.readLogical().count()
    DsirIngest.compactCounts(counts)
    val physAfter = counts.readLogical().count()
    val distinctBuckets = DsirIngest.mergedCounts(counts).count()
    assert(physAfter == distinctBuckets && physAfter < physBefore,
      s"expected $distinctBuckets merged rows < $physBefore partials, got $physAfter")
    assert(rows(DsirIngest.score(docsDf, counts)) == batch,
      "scores changed after statistics compaction")
  }

  test("a replayed batch changes nothing; zero-centering holds on a proportional bucket") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val counts = new GraftTable(spark, DsirIngest.countsDef, fresh("rcounts"))
    val docs = Seq(
      DDoc(1L, "src0", "a b c"),
      DDoc(2L, "src9", "a b x")) // src9 outside the target tier

    val src = MemoryStream[DDoc]
    val q = DsirIngest.countsAppend(src.toDF(), counts, fresh("rck"))
    src.addData(docs); q.processAllAvailable(); q.stop()
    val tot = DsirIngest.mergedCounts(counts)
      .agg(org.apache.spark.sql.functions.sum("cr"),
        org.apache.spark.sql.functions.sum("ct")).collect()(0)
    // 3 unigrams + 2 bigrams per doc; only doc 1 is target-tier
    assert(tot.getLong(0) == 10L && tot.getLong(1) == 5L, s"unexpected totals: $tot")

    // same batch replayed from a fresh checkpoint: the marker skips it
    val src2 = MemoryStream[DDoc]
    val q2 = DsirIngest.countsAppend(src2.toDF(), counts, fresh("rck2"))
    src2.addData(docs); q2.processAllAvailable(); q2.stop()
    assert(DsirIngest.mergedCounts(counts)
      .agg(org.apache.spark.sql.functions.sum("cr")).collect()(0).getLong(0) == 10L,
      "bucket append replayed")

    // β=1 back-off zero-centering: a bucket whose target share equals
    // its corpus share weighs exactly 0, so a doc made ONLY of such
    // features scores 0 and is NOT selected (strict >)
    val lam = DsirScoring.lambdaTable(DsirIngest.mergedCounts(counts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fb = DsirScoring.featureBuckets(Seq(DDoc(1L, "src0", "a b")).toDF())
      .select("bk").collect().map(_.getLong(0))
    // 'u|a','u|b','b|a b' each occur once per doc, in one target doc of
    // two total -> ct*tr + cr*tt = 1*10 + 2*5 = 20, cr*tt = 10: ratio 2,
    // lam = 64*log2(2) - 64 = 0
    fb.foreach(b => assert(lam(b) == 0L, s"bucket $b: expected 0, got ${lam(b)}"))
  }
}

package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.SparkTestSession
import graft.functions.TextOps
import graft.tables.GraftTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class LDoc(doc_id: Long, source: String, text: String)

/** The streamed LM dictionaries must be indistinguishable from batch
  * training: after ingesting the corpus in micro-batches, scoring
  * through [[LmIngest.score]] must equal the `text_lm_score` batch
  * operator row for row (counts are additive partials, so arrival
  * order and batch boundaries cannot matter), and a replayed batch
  * must change neither dictionary.
  */
class LmIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fresh(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_lm", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("doc_id", "n_bigrams", "n_unseen", "lm_score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("streamed dictionaries score identically to the batch-trained operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val uni = new GraftTable(spark, LmIngest.unigramsDef, fresh("uni"))
    val big = new GraftTable(spark, LmIngest.bigramsDef, fresh("big"))
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val docs = docsDf.select("doc_id", "source", "text").collect()
      .map(r => LDoc(r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_.doc_id).toSeq

    val src = MemoryStream[LDoc]
    val q = LmIngest.dictionaryAppend(src.toDF(), uni, big, fresh("ck"))
    docs.grouped(math.max(1, docs.size / 4)).foreach { g =>
      src.addData(g); q.processAllAvailable()
    }
    q.stop()

    val streamed = rows(LmIngest.score(docsDf, uni, big))
    val batch = rows(TextOps.textLmScore.fn(spark, sf))
    assert(streamed == batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}; " +
        s"diff=${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
    assert(batch.exists(_._3 > 0), "no unseen bigrams anywhere — backoff untested")

    // maintenance merge-compaction: physical rows collapse to one per
    // key, reads (and therefore scores) are unchanged
    val physBefore = uni.readLogical().count()
    LmIngest.compactDictionaries(uni, big)
    val physAfter = uni.readLogical().count()
    val distinctWords = LmIngest.mergedUnigrams(uni).count()
    assert(physAfter == distinctWords && physAfter < physBefore,
      s"expected $distinctWords merged rows < $physBefore partials, got $physAfter")
    assert(rows(LmIngest.score(docsDf, uni, big)) == batch,
      "scores changed after dictionary compaction")
  }

  test("a replayed batch changes neither dictionary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val uni = new GraftTable(spark, LmIngest.unigramsDef, fresh("runi"))
    val big = new GraftTable(spark, LmIngest.bigramsDef, fresh("rbig"))
    val docs = Seq(
      LDoc(1L, "src0", "a b c a b"),
      LDoc(2L, "src9", "a b x y z")) // src9 is outside the train tier

    val src = MemoryStream[LDoc]
    val q = LmIngest.dictionaryAppend(src.toDF(), uni, big, fresh("rck"))
    src.addData(docs); q.processAllAvailable(); q.stop()
    val u = LmIngest.mergedUnigrams(uni).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val nBig = LmIngest.mergedBigrams(big).count()

    // only doc 1 (trusted tier) trains: a=2, b=2, c=1
    assert(u == Map("a" -> 2L, "b" -> 2L, "c" -> 1L), s"unexpected unigrams: $u")
    assert(nBig == 3L, s"expected bigrams {ab, bc, ca}+{ab merged}: $nBig")

    // same batch id replayed from a fresh checkpoint: markers skip both
    val src2 = MemoryStream[LDoc]
    val q2 = LmIngest.dictionaryAppend(src2.toDF(), uni, big, fresh("rck2"))
    src2.addData(docs); q2.processAllAvailable(); q2.stop()
    val u2 = LmIngest.mergedUnigrams(uni).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(u2 == u, "unigram append replayed")
    assert(LmIngest.mergedBigrams(big).count() == nBig, "bigram append replayed")
  }
}

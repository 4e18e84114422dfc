package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.SparkTestSession
import graft.functions.TextOps
import graft.tables.GraftTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class CDoc(doc_id: Long, source: String, text: String)

/** The streamed classifier dictionary must be indistinguishable from
  * batch training: after ingesting the corpus in micro-batches,
  * scoring through [[ClassifierIngest.score]] must equal the
  * `text_classifier_score` batch operator row for row (the dictionary
  * is an additive partial, so arrival order and batch boundaries
  * cannot matter), a replayed batch must not change it, and
  * merge-compaction must be read-invisible.
  */
class ClassifierIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fresh(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_clf", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Boolean)] =
    df.select("doc_id", "n_words", "classifier_score", "is_high_quality")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet

  test("streamed dictionary scores identically to the batch-trained operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dict = new GraftTable(spark, ClassifierIngest.dictDef, fresh("dict"))
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val docs = docsDf.select("doc_id", "source", "text").collect()
      .map(r => CDoc(r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_.doc_id).toSeq

    val src = MemoryStream[CDoc]
    val q = ClassifierIngest.dictionaryAppend(src.toDF(), dict, fresh("ck"))
    docs.grouped(math.max(1, docs.size / 4)).foreach { g =>
      src.addData(g); q.processAllAvailable()
    }
    q.stop()

    val streamed = rows(ClassifierIngest.score(docsDf, dict))
    val batch = rows(TextOps.textClassifierScore.fn(spark, sf))
    assert(streamed == batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}; " +
        s"diff=${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
    assert(batch.exists(_._4) && batch.exists(!_._4),
      "corpus does not split around the neutral point — the flag is untested")

    // merge-compaction: physical rows collapse to one per word,
    // scores are unchanged
    val physBefore = dict.readLogical().count()
    ClassifierIngest.compactDictionary(dict)
    val physAfter = dict.readLogical().count()
    val distinctWords = ClassifierIngest.mergedDictionary(dict).count()
    assert(physAfter == distinctWords && physAfter < physBefore,
      s"expected $distinctWords merged rows < $physBefore partials, got $physAfter")
    assert(rows(ClassifierIngest.score(docsDf, dict)) == batch,
      "scores changed after dictionary compaction")
  }

  test("scoring against a dictionary with no trusted counts fails loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dict = new GraftTable(spark, ClassifierIngest.dictDef, fresh("cold"))
    val docs = Seq(CDoc(1L, "src9", "a b a")) // nothing from the trusted tier
    val src = MemoryStream[CDoc]
    val q = ClassifierIngest.dictionaryAppend(src.toDF(), dict, fresh("coldck"))
    src.addData(docs); q.processAllAvailable(); q.stop()
    val e = intercept[IllegalArgumentException] {
      ClassifierIngest.score(docs.toDF(), dict)
    }
    assert(e.getMessage.contains("trusted-tier"),
      s"expected the cold-start guard, got: ${e.getMessage}")
  }

  test("a doc with fully-unseen vocabulary emits an explicit NULL-score row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dict = new GraftTable(spark, ClassifierIngest.dictDef, fresh("unseen"))
    val trainDocs = Seq(CDoc(1L, "src0", "a b a b c"))
    val src = MemoryStream[CDoc]
    val q = ClassifierIngest.dictionaryAppend(src.toDF(), dict, fresh("unseenck"))
    src.addData(trainDocs); q.processAllAvailable(); q.stop()

    // serve NEW docs against the older dictionary: doc 2's vocabulary
    // is entirely absent — it must still get a row (NULL score, NULL
    // flag) so downstream gates decide deliberately, not silently
    // bypass (the gate-disabled failure mode)
    val serveDocs = Seq(CDoc(1L, "src0", "a b c"), CDoc(2L, "src9", "q r s")).toDF()
    val out = ClassifierIngest.score(serveDocs, dict)
      .select("doc_id", "n_words", "n_scored", "classifier_score", "is_high_quality")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L), s"expected both docs scored: ${out.keySet}")
    val u = out(2L)
    assert(u.getLong(1) == 3L && u.getLong(2) == 0L,
      s"expected n_words=3 n_scored=0 for the unseen doc, got $u")
    assert(u.isNullAt(3) && u.isNullAt(4),
      "fully-unseen doc must carry NULL score and NULL quality flag")
    val s = out(1L)
    assert(s.getLong(2) == 3L && !s.isNullAt(3),
      s"covered doc must score normally, got $s")
  }

  test("a replayed batch does not change the dictionary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dict = new GraftTable(spark, ClassifierIngest.dictDef, fresh("rdict"))
    val docs = Seq(
      CDoc(1L, "src0", "a b a"),
      CDoc(2L, "src9", "a x")) // src9 is outside the trusted tier

    val src = MemoryStream[CDoc]
    val q = ClassifierIngest.dictionaryAppend(src.toDF(), dict, fresh("rck"))
    src.addData(docs); q.processAllAvailable(); q.stop()
    val d = ClassifierIngest.mergedDictionary(dict).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // c_all counts every occurrence; c_tr only the trusted tier's
    assert(d == Map("a" -> (3L, 2L), "b" -> (1L, 1L), "x" -> (1L, 0L)),
      s"unexpected dictionary: $d")

    // same batch id replayed from a fresh checkpoint over the SAME
    // table: the sink marker must drop it whole
    val src2 = MemoryStream[CDoc]
    val q2 = ClassifierIngest.dictionaryAppend(src2.toDF(), dict, fresh("rck2"))
    src2.addData(docs); q2.processAllAvailable(); q2.stop()
    val d2 = ClassifierIngest.mergedDictionary(dict).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d2 == d, s"replayed batch changed the dictionary: $d2")
  }
}

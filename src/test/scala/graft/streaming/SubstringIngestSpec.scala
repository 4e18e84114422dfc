package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.SparkTestSession
import graft.functions.DedupOps
import graft.tables.GraftTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class SDoc(doc_id: Long, text: String)

/** The streamed substring gate must cut exactly what the batch operator
  * cuts: ingesting the corpus in id-ordered micro-batches yields a stats
  * table row-identical to `dedup_substring_cut` over the whole corpus at
  * once (keep-first == arrival order), and a replayed batch changes
  * nothing (exactly-once + pre-batch index discipline).
  */
class SubstringIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fresh(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_substr", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, String, Boolean)] =
    df.select("doc_id", "n_words", "n_words_kept", "cut_text_hash", "is_modified")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getBoolean(4)))
      .toSet

  test("streamed cut stats over id-ordered batches == the batch operator in one pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val index = new GraftTable(spark, SubstringIngest.windowIndexDef, fresh("idx"))
    val stats = new GraftTable(spark, SubstringIngest.cutStatsDef, fresh("stats"))
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val docs = docsDf.select("doc_id", "text").collect()
      .map(r => SDoc(r.getLong(0), r.getString(1))).sortBy(_.doc_id).toSeq

    val src = MemoryStream[SDoc]
    val q = SubstringIngest.run(src.toDF(), index, stats, fresh("ck"))
    docs.grouped(math.max(1, docs.size / 3)).foreach { g =>
      src.addData(g); q.processAllAvailable()
    }
    q.stop()

    val streamed = rows(stats.readLogical())
    val batch = rows(DedupOps.substringDupCut(
      docsDf.select("doc_id", "text"), DedupOps.SubstringW))
    assert(streamed == batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}; " +
        s"diff=${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
    assert(batch.exists(_._5), "corpus has no duplicated spans — parity is vacuous")
    assert(batch.exists(!_._5), "every doc modified — parity is degenerate")
  }

  test("a replayed batch is a no-op for both sinks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val index = new GraftTable(spark, SubstringIngest.windowIndexDef, fresh("ridx"))
    val stats = new GraftTable(spark, SubstringIngest.cutStatsDef, fresh("rstats"))
    val docs = Seq(
      SDoc(1L, "a b c d e f g h i j"),
      SDoc(2L, "z0 a b c d e f g h z1"))

    val src = MemoryStream[SDoc]
    val q = SubstringIngest.run(src.toDF(), index, stats, fresh("rck"))
    src.addData(docs); q.processAllAvailable(); q.stop()
    val statsAfter = rows(stats.readLogical())
    val idxAfter = index.readLogical().count()

    // same batch id replayed from a fresh checkpoint-less restart: the
    // sink markers must skip both appends
    val src2 = MemoryStream[SDoc]
    val q2 = SubstringIngest.run(src2.toDF(), index, stats, fresh("rck2"))
    src2.addData(docs); q2.processAllAvailable(); q2.stop()

    assert(rows(stats.readLogical()) == statsAfter, "stats append replayed")
    assert(index.readLogical().count() == idxAfter, "index append replayed")
    // doc 2 shares the 8-word run a..h with doc 1: its windows are cut
    val d2 = statsAfter.find(_._1 == 2L).get
    assert(d2._3 == 2L && d2._5, s"doc 2 should keep only z0 z1: $d2")
  }
}

package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.SparkTestSession
import graft.functions.DedupOps
import graft.tables.GraftTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class KDoc(doc_id: Long, source: String, text: String)

/** The streamed keep-best partials must resolve to exactly the batch
  * operator's output regardless of arrival order or batch boundaries
  * (the state is a mergeable partial — min/sum over disjoint batches),
  * and replayed batches must change nothing.
  */
class KeepBestIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fresh(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_keepbest", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, Long, String, Long, Long)] =
    df.select("text_hash", "keep_doc_id", "keep_source", "n_copies", "n_sources")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("streamed partials resolve to the batch operator, in any arrival order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val docs = docsDf.select("doc_id", "source", "text").collect()
      .map(r => KDoc(r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val batch = rows(DedupOps.dedupKeepBest.fn(spark, sf))

    // two adversarial arrival orders: ascending ids, and descending
    // (the WORST order for a keep-lowest rule — every later arrival
    // outranks the resident state)
    for ((order, name) <- Seq(docs.sortBy(_.doc_id) -> "asc",
        docs.sortBy(-_.doc_id) -> "desc")) {
      val partials = new GraftTable(spark, KeepBestIngest.partialsDef, fresh(s"p$name"))
      val src = MemoryStream[KDoc]
      val q = KeepBestIngest.run(src.toDF(), partials, fresh(s"ck$name"))
      order.grouped(math.max(1, order.size / 3)).foreach { g =>
        src.addData(g); q.processAllAvailable()
      }
      q.stop()
      assert(rows(KeepBestIngest.resolve(partials)) == batch,
        s"arrival order '$name' diverged from the batch operator")

      // merge-compaction leaves the resolution byte-identical
      KeepBestIngest.compactPartials(partials)
      assert(rows(KeepBestIngest.resolve(partials)) == batch,
        s"compaction changed the '$name' resolution")
    }
  }

  test("a replayed batch changes nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val partials = new GraftTable(spark, KeepBestIngest.partialsDef, fresh("rp"))
    val docs = Seq(
      KDoc(10L, "src3", "same text"),
      KDoc(11L, "src1", "same text"), // lower rank → the winner
      KDoc(12L, "src3", "other text"))

    val src = MemoryStream[KDoc]
    val q = KeepBestIngest.run(src.toDF(), partials, fresh("rck"))
    src.addData(docs); q.processAllAvailable(); q.stop()
    val r1 = rows(KeepBestIngest.resolve(partials))
    assert(r1.exists(t => t._2 == 11L && t._3 == "src1" && t._4 == 2L && t._5 == 2L),
      s"keep-rule wrong: $r1")

    val src2 = MemoryStream[KDoc]
    val q2 = KeepBestIngest.run(src2.toDF(), partials, fresh("rck2"))
    src2.addData(docs); q2.processAllAvailable(); q2.stop()
    assert(rows(KeepBestIngest.resolve(partials)) == r1, "replay changed the partials")
  }
}

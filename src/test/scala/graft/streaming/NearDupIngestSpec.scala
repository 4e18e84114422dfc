package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.SparkTestSession
import graft.functions.DedupOps
import graft.tables.GraftTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class NDoc(doc_id: Long, text: String)

/** The streamed band index must band exactly like the batch pipeline:
  * probing the full corpus against the streamed index yields the same
  * unordered candidate set as the oracle-checked `dedup_minhash_lsh`,
  * and probing only the late batch yields exactly that batch's slice.
  */
class NearDupIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fresh(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_neardup", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  test("streamed band index reproduces the batch LSH candidate set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = new GraftTable(spark, NearDupIngest.bandTableDef, fresh("wh"))
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val docs = docsDf.select("doc_id", "text").collect()
      .map(r => NDoc(r.getLong(0), r.getString(1))).toSeq
    val src = MemoryStream[NDoc]
    val q = NearDupIngest.bandAppend(src.toDF(), table, fresh("ck"))
    val (first, second) = docs.splitAt(docs.size / 2)
    src.addData(first); q.processAllAvailable()
    src.addData(second); q.processAllAvailable()
    q.stop()

    def canonical(df: org.apache.spark.sql.DataFrame,
        a: String, b: String): Set[(Long, Long)] =
      df.collect().map { r =>
        val (x, y) = (r.getAs[Long](a), r.getAs[Long](b))
        (math.min(x, y), math.max(x, y))
      }.toSet

    // full-corpus probe == the oracle-checked batch candidate pairs
    val streamed = canonical(
      NearDupIngest.nearDupCandidates(table, docsDf), "probe_id", "cand_id")
    val batch = canonical(
      DedupOps.dedupMinhashLsh.run(spark, sf), "doc_a", "doc_b")
    assert(streamed == batch,
      s"streamed ${streamed.size} pairs vs batch ${batch.size}")
    assert(batch.nonEmpty, "corpus has no near-dups — the equality is vacuous")

    // the ingest-gate shape: probing ONLY the late batch returns exactly
    // the batch pairs that touch a late doc
    val lateIds = second.map(_.doc_id).toSet
    val lateProbe = canonical(
      NearDupIngest.nearDupCandidates(table,
        docsDf.filter(col("doc_id").isin(lateIds.toSeq: _*))),
      "probe_id", "cand_id")
    assert(lateProbe == batch.filter(p => lateIds(p._1) || lateIds(p._2)))
  }
}

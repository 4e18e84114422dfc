package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.SparkTestSession
import graft.functions.{DedupOps, SearchOps}
import graft.tables.GraftTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class TDoc(doc_id: Long, text: String)

/** End-to-end pipeline: quality-rejected and VERIFIED near-duplicate
  * docs must never reach any index, survivors must reach every index,
  * and the served BM25 must equal a direct ranking of exactly the
  * surviving corpus. Expected drops are recomputed independently: the
  * near-dup edges come from the oracle-checked verified-pair body, but
  * the cluster resolution (keep the lowest id per component) is a
  * plain Scala union-find over the collected edges — not the engine's
  * connected-components code.
  */
class TrainingIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fresh(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_trainingest", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  /** Components of an undirected edge list; every vertex not the min of
    * its component is a drop.
    */
  private def unionFindDrops(edges: Seq[(Long, Long)]): Set[Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => (v, find(v))).filter { case (v, r) => v != r }
      .map(_._1).toSet
  }

  test("gates drop junk and verified near-dups; survivors reach every index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wh = fresh("wh")
    val bands = new GraftTable(spark, NearDupIngest.bandTableDef, wh)
    val fps = new GraftTable(spark, NearDupIngest.fingerprintDef, wh)
    val postings = new GraftTable(spark, PostingsIngest.postingsDef, wh)
    val docStats = new GraftTable(spark, PostingsIngest.docStatsDef, wh)
    val cmTable = new GraftTable(spark,
      graft.tables.TableDef("cm_cells", org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("i",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType)))), wh)

    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => TDoc(r.getLong(0), r.getString(1))).toSeq
    val dupOfFirst = TDoc(9001L, base.head.text)        // verified near-dup of history
    val tooFewTokens = TDoc(9002L, "tiny text")         // quality reject
    val cleanNew = TDoc(9000L,
      "a genuinely novel document about distributed retrieval engines " +
        "that shares no shingles with the synthetic corpus at all")

    val src = MemoryStream[TDoc]
    val q = TrainingIngest.run(src.toDF(), bands, fps, postings, docStats,
      cmTable, fresh("ck"))
    src.addData(base); q.processAllAvailable()
    src.addData(Seq(dupOfFirst, tooFewTokens, cleanNew)); q.processAllAvailable()
    q.stop()

    // expected batch-1 survivors: quality survivors minus union-find
    // drops over the VERIFIED near-dup edges
    val baseDf = base.toDF("doc_id", "text")
    val clean1 = CorpusIngest.enrich(baseDf)
      .filter(col("reject_reason").isNull).select("doc_id", "text")
    val hv1 = DedupOps.hashedShingles(clean1).localCheckpoint()
    val edges = DedupOps.verifyPairs(
        DedupOps.bandPairsOfKeys(DedupOps.bandKeysOfHv(hv1)), hv1, hv1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dropped1 = unionFindDrops(edges)
    val survivors1 = clean1.collect().map(_.getLong(0)).toSet -- dropped1
    val expected = survivors1 + cleanNew.doc_id

    val landed = docStats.readLogical().select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(landed == expected,
      s"doc_stats: missing ${expected -- landed}, extra ${landed -- expected}")
    assert(dropped1.nonEmpty, "base corpus had no verified near-dups — gate untested")

    // no dropped doc reaches any index; fingerprints track the survivors
    val bandIds = bands.readLogical().select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val fpIds = fps.readLogical().select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!bandIds(dupOfFirst.doc_id) && !bandIds(tooFewTokens.doc_id))
    assert(bandIds.subsetOf(expected) && fpIds.subsetOf(expected))
    assert(bandIds == fpIds, "band index and fingerprint sidecar must cover the same docs")

    // served BM25 == direct ranking of exactly the surviving corpus
    val terms = Seq("vector", "stream", "merge", "window", "hash")
    val survivingDf = baseDf.unionByName(Seq(cleanNew).toDF("doc_id", "text"))
      .filter(col("doc_id").isin(expected.toSeq: _*))
    val toks = SearchOps.tokenize(survivingDf)
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val tot = survivingDf.agg(count(lit(1)).as("nn"))
      .crossJoin(dl.agg(sum(col("dl")).as("ll")))
    val direct = SearchOps.bm25Rank(tf, dl, tot, 20)
    val served = PostingsIngest.bm25TopK(postings, docStats, terms, 20)
    assert(served.collect().toSeq.map(_.toSeq) == direct.collect().toSeq.map(_.toSeq),
      "served BM25 must rank exactly the surviving corpus")
  }
}

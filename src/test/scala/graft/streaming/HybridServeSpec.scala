package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.SparkTestSession
import graft.functions.AnnOps
import graft.tables.{GraftTable, IdentityTransform, TableDef}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

case class HDoc(doc_id: Long, text: String)
case class HVec(vec_id: Long, embedding: Array[Float])

/** Hybrid serving must be exactly RRF over its two component lists:
  * both indexes are built through their streaming ingest paths, the
  * fusion is recomputed independently from the collected component
  * rankings, and the served result must match row for row.
  */
class HybridServeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fresh(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_hybrid", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  test("served hybrid top-k equals RRF recomputed from its component lists") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // lexical index via the postings stream
    val postings = new GraftTable(spark, PostingsIngest.postingsDef, fresh("lwh"))
    val docStats = new GraftTable(spark, PostingsIngest.docStatsDef, fresh("lwh2"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => HDoc(r.getLong(0), r.getString(1))).toSeq
    val dsrc = MemoryStream[HDoc]
    val dq = PostingsIngest.indexAppend(dsrc.toDF(), postings, docStats, fresh("lck"))
    dsrc.addData(docs); dq.processAllAvailable(); dq.stop()

    // semantic index via the vector stream
    val idxSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("nrm", DoubleType),
      StructField("cell", LongType)))
    val vecIndex = new GraftTable(spark,
      TableDef("vec_index", idxSchema, partitions = Seq(IdentityTransform("cell"))),
      fresh("vwh"))
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val codebook = AnnOps.centroids(
      base.withColumn("nrm", sqrt(AnnOps.dot(col("embedding"), col("embedding")))),
      AnnOps.NCentroids).cache()
    val vsrc = MemoryStream[HVec]
    val vq = VectorIngest.cellAppend(vsrc.toDF(), codebook, vecIndex, fresh("vck"))
    vsrc.addData(base.collect().map(r => HVec(r.getLong(0), r.getSeq[Float](1).toArray)).toSeq)
    vq.processAllAvailable(); vq.stop()

    val terms = Seq("vector", "stream", "merge", "window", "hash")
    val queryVec = base.filter(col("vec_id") === 3L).select("vec_id", "embedding")
    val served = HybridServe.hybridTopK(postings, docStats, vecIndex, codebook,
      queryVec, terms, nprobe = 2, kEach = 20, k = 10).collect()

    // recompute expected fusion from the component lists, independently
    val lex = PostingsIngest.bm25TopK(postings, docStats, terms, 20)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rnk").toLong).toMap
    val sem = VectorIngest.probeTopK(vecIndex, queryVec, codebook, 2, 20)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("rnk").toLong).toMap
    val expected = (lex.keySet ++ sem.keySet).toSeq
      .map { d =>
        val rrf = lex.get(d).map(r => 1000000L / (60L + r)).getOrElse(0L) +
          sem.get(d).map(r => 1000000L / (60L + r)).getOrElse(0L)
        (d, rrf)
      }
      .sortBy { case (d, rrf) => (-rrf, d) }
      .take(10)
    assert(served.length == expected.length)
    served.zip(expected).zipWithIndex.foreach { case ((row, (d, rrf)), i) =>
      assert(row.getAs[Int]("rnk") == i + 1)
      assert(row.getAs[Long]("doc_id") == d, s"rank ${i + 1}")
      assert(row.getAs[Long]("rrf_ppm") == rrf, s"doc $d")
      assert(Option(row.getAs[Integer]("r_lex")).map(_.toLong) == lex.get(d))
      assert(Option(row.getAs[Integer]("r_sem")).map(_.toLong) == sem.get(d))
    }
    // a doc on both lists fuses both components (the hybrid property is real)
    assert(served.exists(r => r.getAs[Integer]("r_lex") != null
      && r.getAs[Integer]("r_sem") != null),
      "no doc appeared in both component lists — fusion untested")
  }
}

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

case class RVec(vec_id: Long, embedding: Array[Float])

/** The full production ANN loop: stream-in under the seed codebook,
  * retrain from the landed vectors, rebuild the successor index, and
  * the successor must serve EXACTLY what the oracle-checked
  * `ann_ivf_trained` query computes one-shot.
  */
class ReindexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fresh(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_reindex", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private val idxSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("nrm", DoubleType),
    StructField("cell", LongType)))

  test("ingest -> retrain -> rebuild serves the oracle-checked trained search") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val e = base.withColumn("nrm", sqrt(AnnOps.dot(col("embedding"), col("embedding"))))
      .filter(col("nrm") > 0)
    val seed = AnnOps.centroids(e, AnnOps.NCentroids).cache()

    // live index fed by the stream under the frozen seed codebook
    val live = new GraftTable(spark,
      TableDef("vec_index", idxSchema, partitions = Seq(IdentityTransform("cell"))),
      fresh("live"))
    val src = MemoryStream[RVec]
    val q = VectorIngest.cellAppend(src.toDF(), seed, live, fresh("ck"))
    src.addData(base.collect().map(r => RVec(r.getLong(0), r.getSeq[Float](1).toArray)).toSeq)
    q.processAllAvailable(); q.stop()

    // retrain OFFLINE from the landed vectors (not the source corpus)
    val trained = AnnOps.kmeansTrain(
      live.readLogical().select(col("vec_id"), col("embedding"), col("nrm")),
      AnnOps.NCentroids, 1)

    // successor build + cut-over
    val successor = new GraftTable(spark,
      TableDef("vec_index_v2", idxSchema, partitions = Seq(IdentityTransform("cell"))),
      fresh("succ"))
    VectorIngest.rebuildIndex(live, successor, trained)
    assert(successor.readLogical().count() == live.readLogical().count())

    val queries = base.filter(col("vec_id") < 5).select("vec_id", "embedding")
    val served = VectorIngest.probeTopK(successor, queries, trained, 2, 5)
    val oneShot = AnnOps.annIvfTrained.run(spark, sf)
    assert(served.collect().toSeq.map(_.toSeq).sortBy(_.toString) ==
      oneShot.collect().toSeq.map(_.toSeq).sortBy(_.toString),
      "successor index must serve the oracle-checked trained search exactly")
  }
}

package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF codebook must be a CONSTANT-size selection — the scale
  * property the old `vec_id % 100` rule violated (C grew with N, making
  * the assignment pass O(N²/100) with an unbounded broadcast). The
  * fixed-count pick must also be deterministic, or the oracle could not
  * rebuild it.
  */
class AnnCentroidSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def embeddings(sf: String) =
    spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      .withColumn("nrm", lit(1.0))

  test("centroid count is identical at every scale factor") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"))
      assert(AnnOps.centroids(embeddings(sf)).count() == AnnOps.NCentroids,
        s"codebook size must be the constant ${AnnOps.NCentroids} at $sf")
  }

  test("centroid selection is deterministic") {
    val a = AnnOps.centroids(embeddings("sf0.01")).select("cid")
      .collect().map(_.getLong(0)).toSeq
    val b = AnnOps.centroids(embeddings("sf0.01")).select("cid")
      .collect().map(_.getLong(0)).toSeq
    assert(a == b && a.distinct.size == AnnOps.NCentroids)
  }
}

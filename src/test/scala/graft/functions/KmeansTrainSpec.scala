package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Lloyd trainer must (a) be bit-reproducible run to run, and
  * (b) improve the codebook it feeds the IVF machinery: the average
  * best-cosine of a vector to its nearest centroid — the quantization
  * quality the cell layout lives on — must not degrade from the
  * hash-picked seed, and on real data strictly improves.
  */
class KmeansTrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")
    .withColumn("nrm", sqrt(AnnOps.dot(col("embedding"), col("embedding"))))

  /** Mean best-cosine over the corpus for a codebook, driver-side. */
  private def quality(cent: DataFrame): Double = {
    val cs = cent.collect()
      .map(r => (r.getSeq[Double](1).toArray, r.getDouble(2)))
    val vs = emb.select("embedding", "nrm").collect()
      .map(r => (r.getSeq[Float](0).map(_.toDouble).toArray, r.getDouble(1)))
    vs.map { case (v, vn) =>
      cs.map { case (c, cn) =>
        v.zip(c).map { case (a, b) => a * b }.sum / (vn * cn)
      }.max
    }.sum / vs.length
  }

  test("two Lloyd iterations strictly improve mean best-cosine, reproducibly") {
    val seed = AnnOps.centroids(emb, AnnOps.NCentroids)
      .select(col("cid"),
        transform(col("c_emb"), x => x.cast("double")).as("c_emb"), col("c_nrm"))
    val trained = AnnOps.kmeansTrain(emb, AnnOps.NCentroids, 2)
    val (q0, q2) = (quality(seed), quality(trained))
    assert(q2 > q0, s"training degraded quality: seed $q0 vs trained $q2")

    val again = AnnOps.kmeansTrain(emb, AnnOps.NCentroids, 2)
    val a = trained.orderBy("cid").collect().map(_.toSeq)
    val b = again.orderBy("cid").collect().map(_.toSeq)
    assert(a.sameElements(b) || a.toSeq == b.toSeq,
      "training must be bit-reproducible")
  }

  test("one training pass matches kmeans_refine's oracle-checked means") {
    val t1 = AnnOps.kmeansTrain(emb, AnnOps.NCentroids, 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val refine = AnnOps.kmeansRefine.run(spark, sf).collect()
    refine.foreach { r =>
      val (cell, pos) = (r.getAs[Long]("cell"), r.getAs[Long]("pos"))
      val micro = r.getAs[Long]("c_new_micro")
      assert(t1(cell)(pos.toInt) == micro / 1e6,
        s"cell $cell pos $pos: trainer ${t1(cell)(pos.toInt)} vs refine ${micro / 1e6}")
    }
  }
}

package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Lloyd step's update must be the exact per-cell component mean of
  * the members the assignment put there — recomputed here independently
  * (collect + plain Scala arithmetic) rather than through the same plan.
  */
class KmeansRefineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("refined centroids are the exact integer means of their members") {
    val out = AnnOps.kmeansRefine.run(spark, sf).collect()
    // full grid: every cell × every dim, exactly once
    val cells = out.map(_.getAs[Long]("cell")).distinct
    assert(cells.length == 16)
    assert(out.length == 16 * 64)

    // independent membership: nearest centroid by cosine, ties to low cid
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    def nrm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val centSet = AnnOps.centroids(
      spark.read.parquet(s"$sf/embeddings.parquet")
        .withColumn("nrm", sqrt(AnnOps.dot(col("embedding"), col("embedding")))))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val members = e.map { case (vid, v) =>
      val best = centSet.map { case (cid, c) =>
        val cs = v.zip(c).map { case (a, b) => a * b }.sum / (nrm(v) * nrm(c))
        (cid, cs)
      }.sortBy { case (cid, cs) => (-cs, cid) }.head._1
      (best, v)
    }
    val expected = members.groupBy(_._1).map { case (cell, vs) =>
      val qs = vs.map(_._2.map(x => math.floor(x * 1e6).toLong))
      cell -> (0 until 64).map(p => {
        val s = qs.map(_(p)).sum
        s / qs.length // Long division truncates toward zero, like the op
      })
    }
    out.foreach { r =>
      val (cell, pos) = (r.getAs[Long]("cell"), r.getAs[Long]("pos"))
      assert(r.getAs[Long]("n") == members.count(_._1 == cell))
      assert(r.getAs[Long]("c_new_micro") == expected(cell)(pos.toInt),
        s"cell $cell pos $pos")
    }
  }
}

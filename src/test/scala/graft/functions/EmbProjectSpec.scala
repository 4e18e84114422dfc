package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The projection must be the continuous refinement of the LSH bucket:
  * sign(component p) == bucket bit p for every vector, and the values
  * must equal a driver-side recomputation exactly.
  */
class EmbProjectSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("projection signs are the LSH bucket bits; values match recomputation") {
    val proj = AnnOps.embProject.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val buckets = e
      .withColumn("nrm", sqrt(AnnOps.dot(col("embedding"), col("embedding"))))
      .withColumn("bucket", AnnOps.bucketCol(col("embedding")))
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)

    assert(proj.size == vecs.length * AnnOps.ProjPlanes)
    vecs.foreach { case (vid, v) =>
      (0 until AnnOps.ProjPlanes).foreach { p =>
        val d = v.zip(AnnOps.projPlanes(p)).map { case (a, b) => a * b }.sum
        assert(proj((vid, p.toLong)) == math.floor(d * 1e6).toLong,
          s"vec $vid plane $p")
        // the first Planes components' signs ARE the LSH bucket bits
        // (projection exactly 0 sets no bit — bucketCol's strict >)
        if (p < 4) {
          val bit = (buckets(vid) >> p) & 1
          if (d > 0) assert(bit == 1, s"vec $vid plane $p: positive but bit 0")
          else assert(bit == 0, s"vec $vid plane $p: non-positive but bit 1")
        }
      }
    }
  }
}

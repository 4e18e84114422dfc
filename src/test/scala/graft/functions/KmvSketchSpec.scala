package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch properties the oracle rows can't isolate: exactness below
  * k, the bounded buffer, accuracy of the saturated estimator, and —
  * the property that makes it a sketch at all — MERGE invariance: the
  * final sketch must not depend on how rows were split across partial
  * aggregation buffers (which also drives the serde through the partial
  * → final shuffle).
  */
class KmvSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val K = 64
  private def sketch(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      KmvSketchAgg(org.apache.spark.sql.GraftSqlBridge.expression(c), K)
        .toAggregateExpression())

  private def sketchOf(values: Seq[Long], partitions: Int): Seq[Long] =
    values.toDF("v").repartition(partitions)
      .agg(sketch(SharedHash.h64(col("v").cast("string"))).as("sk"))
      .collect()(0).getSeq[Long](0)

  test("an unsaturated sketch IS the distinct hash set (duplicates collapse)") {
    val sk = sketchOf(Seq(1L, 2L, 3L, 2L, 1L, 3L, 3L), partitions = 4)
    assert(sk.length == 3)
    assert(sk == sk.sorted)
  }

  test("a saturated sketch holds exactly the k smallest distinct hashes") {
    val values = (1L to 1000L)
    val sk = sketchOf(values, partitions = 8)
    assert(sk.length == K)
    val expected = values.map(v => SharedHash.h64Jvm(v.toString.getBytes))
      .distinct.sorted.take(K)
    assert(sk == expected)
  }

  test("merge invariance: the sketch is independent of partitioning") {
    val values = (1L to 5000L).map(v => v % 1700) // duplicates across partitions
    val one = sketchOf(values, partitions = 1)
    val many = sketchOf(values, partitions = 32)
    assert(one == many, "partial-aggregation layout must not change the sketch")
  }

  test("saturated estimator lands within 20% of the true distinct count") {
    for (n <- Seq(2000L, 20000L)) {
      val sk = sketchOf(1L to n, partitions = 16)
      val est = (K - 1).toDouble * ((1L << 60).toDouble / sk.last)
      assert(math.abs(est - n) / n < 0.2,
        s"n=$n est=$est — outside the 1/sqrt(k-2) envelope by too much")
    }
  }
}

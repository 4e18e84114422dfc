package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native dot product must be BIT-identical to the zip_with/aggregate
  * fold (which the DuckDB oracle reproduces) — a physical swap only.
  */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def native(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  private def fold(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("native equals fold bit-for-bit on real float embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("b")).limit(3))
    val rows = pairs
      .select(fold(col("a"), col("b")).as("f"), native(col("a"), col("b")).as("n"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"fold=${r.getDouble(0)} native=${r.getDouble(1)}")
    }
  }

  test("null parity with zip_with: length mismatch and null element give NULL") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),          // mismatch
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),    // null elem
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)))     // clean
      .toDF("a", "b")
    val rows = df.select(fold(col("a"), col("b")).as("f"), native(col("a"), col("b")).as("n"))
      .collect()
    rows.foreach { r => assert(r.isNullAt(0) == r.isNullAt(1)) }
    assert(rows(2).getDouble(1) == 11.0)
  }
}

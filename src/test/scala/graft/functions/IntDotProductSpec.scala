package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The native integer dot kernel must be value-identical to the
  * interpreted fold it replaces, including zip_with's null semantics.
  */
class IntDotProductSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("int_dot_product equals the aggregate/zip_with fold") {
    val rows = spark.sql(
      """SELECT int_dot_product(a, b) AS native,
        |       aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS fold
        |FROM VALUES
        |  (array(1L, -2L, 3L), array(4L, 5L, -6L)),
        |  (array(127L, 127L), array(127L, 127L)),
        |  (array(0L), array(0L))
        |AS t(a, b)""".stripMargin).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(rows.map(_.getLong(0)).toSeq == Seq(-24L, 32258L, 0L))
  }

  test("null element and length mismatch yield NULL, matching zip_with") {
    val r = spark.sql(
      """SELECT int_dot_product(array(1L, NULL), array(1L, 1L)) AS n1,
        |       int_dot_product(array(1L, 2L), array(1L)) AS n2""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}

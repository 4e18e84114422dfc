package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The GraftExtensions SQL function surface: spark.sql users must reach
  * the native kernels by name, with results identical to the Column-API
  * forms.
  */
class SqlFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("dot_product is callable from SQL and matches the fold") {
    val got = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(got == 32.0)
    // fold equivalence on float arrays (the embeddings element type)
    val viaSql = spark.sql(
      "SELECT dot_product(array(CAST(0.1 AS FLOAT)), array(CAST(0.3 AS FLOAT))) AS d")
      .head().getDouble(0)
    val viaFold = spark.sql(
      """SELECT aggregate(zip_with(array(CAST(0.1 AS FLOAT)), array(CAST(0.3 AS FLOAT)),
        |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (a, v) -> a + v) AS d"""
        .stripMargin).head().getDouble(0)
    assert(viaSql == viaFold)
  }

  test("minhash_signature/simhash_signature callable from SQL, match the JVM kernels") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val words = Seq("spark", "scan", "join")
    val arrLit = words.map(w => s"'$w'").mkString("array(", ", ", ")")

    val mh = spark.sql(s"SELECT minhash_signature($arrLit, 8, 1000000007L) AS s")
      .head().getSeq[Long](0)
    val mhJvm = graft.functions.MinhashSignature.compute(
      ArrayData.toArrayData(words.map(UTF8String.fromString).toArray), 8, 1000000007L)
    assert(mh == mhJvm.toSeq)

    val sh = spark.sql(s"SELECT simhash_signature($arrLit) AS s").head().getLong(0)
    val shJvm = graft.functions.SimhashSignature.compute(
      ArrayData.toArrayData(words.map(UTF8String.fromString).toArray))
    assert(sh == shJvm)
  }

  test("kmv_sketch aggregates from SQL and matches the Column-API sketch") {
    spark.range(0, 500).createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      """SELECT kmv_sketch(
        |         CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT),
        |         32) AS sk
        |FROM kmv_in""".stripMargin)
      .head().getSeq[Long](0)
    val expected = (0L until 500L)
      .map(v => graft.functions.SharedHash.h64Jvm(v.toString.getBytes))
      .distinct.sorted.take(32)
    assert(viaSql == expected)
  }

  test("minhash_signature rejects non-literal k") {
    val err = intercept[Exception] {
      spark.range(1).selectExpr("minhash_signature(array('a'), id + 1, 7)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }
}

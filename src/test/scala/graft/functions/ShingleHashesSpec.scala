package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import SharedHash.h64

/** The native shingle-hash kernel must be BIT-identical to the
  * `array_distinct(transform(…, h64 % p))` Column form it replaces —
  * same hashes, same first-occurrence dedup order.
  */
class ShingleHashesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val P = 2147483647L

  test("native hashes equal the Column form on real document shingles") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = docs
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .withColumn("shingles", array_distinct(transform(
        sequence(lit(0), size(col("words")) - 3),
        i => concat_ws(" ", get(col("words"), i), get(col("words"), i + 1),
          get(col("words"), i + 2)))))
    val fold = array_distinct(transform(col("shingles"), s => h64(s) % P))
    val native = GraftSqlBridge.column(ShingleHashes(
      GraftSqlBridge.expression(col("shingles")), P))
    val gramMode = GraftSqlBridge.column(ShingleHashes(
      GraftSqlBridge.expression(col("words")), P, gram = 3))
    val rows = sh
      .select(col("doc_id"), fold.as("f"), native.as("n"), gramMode.as("g"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"doc ${r.getLong(0)}: fold=${r.getSeq[Long](1).take(5)}… native=${r.getSeq[Long](2).take(5)}…")
      assert(r.getSeq[Long](1) == r.getSeq[Long](3),
        s"doc ${r.getLong(0)}: fold=${r.getSeq[Long](1).take(5)}… gram=${r.getSeq[Long](3).take(5)}…")
    }
  }

  test("empty array and null input behave like the Column form") {
    import spark.implicits._
    val df = Seq((1L, Seq.empty[String]), (2L, null: Seq[String]))
      .toDF("id", "shingles")
    val out = df.select(col("id"), GraftSqlBridge.column(ShingleHashes(
      GraftSqlBridge.expression(col("shingles")), P)).as("hv")).collect()
    assert(out.find(_.getLong(0) == 1L).get.getSeq[Long](1).isEmpty)
    assert(out.find(_.getLong(0) == 2L).get.isNullAt(1))
  }
}

package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import SharedHash.h64

/** The native one-pass simhash must be BIT-identical to the explode +
  * per-bit-conditional-sum aggregation (the oracle-checked form), at the
  * full 60-bit width.
  */
class SimhashSignatureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("native signature equals the aggregation form on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val hashed = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", h64(col("w")))
    val bitAggs = (0 until SimhashSignature.Bits).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"b$j"))
    val aggForm = hashed.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"),
        (0 until SimhashSignature.Bits).map(j =>
          when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(0L):
            org.apache.spark.sql.Column)
          .reduce(_ + _).as("agg_sig"))
    val nativeForm = docs.select(col("doc_id"),
      GraftSqlBridge.column(SimhashSignature(
        GraftSqlBridge.expression(split(col("text"), " ")))).as("native_sig"))
    val joined = aggForm.join(nativeForm, "doc_id")
    assert(joined.count() == 50)
    assert(joined.filter(col("agg_sig") =!= col("native_sig")).count() == 0)
  }

  test("duplicate and empty-string words vote like any other element") {
    import spark.implicits._
    val df = Seq("a a b", "", "x").toDF("text")
    val sigs = df.select(GraftSqlBridge.column(SimhashSignature(
      GraftSqlBridge.expression(split(col("text"), " ")))).as("sig"))
      .collect().map(_.getLong(0))
    assert(sigs.length == 3)
    // independent driver-side recomputation of the "a a b" vote
    def expected(words: Seq[String]): Long = {
      val votes = new Array[Int](SimhashSignature.Bits)
      for (w <- words; h = SharedHash.h64Jvm(w.getBytes("UTF-8")); j <- 0 until SimhashSignature.Bits)
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
      (0 until SimhashSignature.Bits).foldLeft(0L)((s, j) => if (votes(j) > 0) s | (1L << j) else s)
    }
    assert(sigs(0) == expected(Seq("a", "a", "b")))
    assert(sigs(1) == expected(Seq(""))) // split("") = [""] — the empty string votes
    assert(sigs(2) == expected(Seq("x")))
  }
}

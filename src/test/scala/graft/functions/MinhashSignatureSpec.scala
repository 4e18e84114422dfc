package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import SharedHash.h64

/** The native codegen'd minhash expression must be BIT-IDENTICAL to the
  * built-in higher-order fold (which is itself oracle-checked against
  * DuckDB) — the native path is a physical swap, never a semantic one.
  */
class MinhashSignatureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val P = 2147483647L
  private val K = 16

  test("native signature equals the built-in fold on real document shingles") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "the quick brown fox jumps over the lazy cat",
      "ünïcödé shïnglés wörk töö with multi byte text here",
      "a b c").toDF("text")
    val sh = docs
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .withColumn("shingles", array_distinct(transform(
        sequence(lit(0), size(col("words")) - 3),
        i => concat_ws(" ", get(col("words"), i), get(col("words"), i + 1),
          get(col("words"), i + 2)))))
    val foldSig = aggregate(transform(col("shingles"), s => h64(s) % P),
      array_repeat(lit(P), K),
      (acc, h) => transform(sequence(lit(0), lit(K - 1)),
        k => least(element_at(acc, k + 1),
          ((lit(2L) * k + 1L) * h + k * lit(912367L) + 341L) % P)))
    val nativeSig = GraftSqlBridge.column(
      MinhashSignature(GraftSqlBridge.expression(col("shingles")), K, P))
    val rows = sh.select(foldSig.as("f"), nativeSig.as("n")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"fold=${r.getSeq[Long](0)} native=${r.getSeq[Long](1)}")
    }
  }

  test("hashed-input mode equals hashing the strings in the expression") {
    // array<bigint> input = h64 mod P computed upstream (the shared
    // verify checkpoint); permuting those hashes must give the exact
    // signature the string path computes
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "ünïcödé shïnglés wörk töö with multi byte text here").toDF("text")
    val sh = docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingles", array_distinct(transform(
        sequence(lit(0), size(col("words")) - 3),
        i => concat_ws(" ", get(col("words"), i), get(col("words"), i + 1),
          get(col("words"), i + 2)))))
      .withColumn("hv", array_distinct(transform(col("shingles"), s => h64(s) % P)))
    val fromStrings = GraftSqlBridge.column(
      MinhashSignature(GraftSqlBridge.expression(col("shingles")), K, P))
    val fromHashes = GraftSqlBridge.column(
      MinhashSignature(GraftSqlBridge.expression(col("hv")), K, P))
    sh.select(fromStrings.as("s"), fromHashes.as("h")).collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"strings=${r.getSeq[Long](0)} hashes=${r.getSeq[Long](1)}")
    }
  }

  test("empty shingle array yields the all-P identity signature") {
    import spark.implicits._
    val df = Seq(Seq.empty[String]).toDF("shingles")
    val out = df.select(GraftSqlBridge.column(
      MinhashSignature(GraftSqlBridge.expression(col("shingles")), K, P)).as("sig"))
      .collect().head.getSeq[Long](0)
    assert(out == Seq.fill(K)(P))
  }
}

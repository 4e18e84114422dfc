package graft.functions

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for temperature sampling and the discriminative
  * quality classifier — properties the DuckDB hash gate can't express
  * (it pins exact values; these pin WHY those values are right).
  */
class SamplingScoringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("temperature sampling keeps the rarest language whole") {
    val t = Tables(spark, sf)
    val counts = t.documents.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = counts.minBy { case (l, n) => (n, l) }._1
    val kept = TextOps.sampleTemperature.run(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("k"), max(col("keep_th")).as("th"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the min-count language's threshold is exactly 1e6 => every doc kept
    assert(kept(minLang)._2 == 1000000L,
      s"rarest language $minLang must have threshold 1e6, got ${kept(minLang)}")
    assert(kept(minLang)._1 == counts(minLang),
      s"rarest language must survive whole: kept ${kept(minLang)._1} of ${counts(minLang)}")
  }

  test("temperature thresholds decrease as language frequency increases") {
    val t = Tables(spark, sf)
    val counts = t.documents.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ths = TextOps.sampleTemperature.run(spark, sf)
      .select(col("lang"), col("keep_th")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((l1, th1) <- ths; (l2, th2) <- ths if counts(l1) < counts(l2))
      assert(th1 >= th2,
        s"$l1 (n=${counts(l1)}) th=$th1 must be >= $l2 (n=${counts(l2)}) th=$th2")
  }

  test("reservoir sample is the exact per-language weighted top-k, ranks gapless") {
    val t = Tables(spark, sf)
    val sample = PrepOps.sampleReservoir.run(spark, sf).cache()
    // exactly min(10, |lang|) rows per language, ranks a gapless 1..n
    val perLang = sample.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), min(col("rnk")).as("mn"), max(col("rnk")).as("mx"))
    assert(perLang.filter(col("mn") =!= 1 || col("mx") =!= col("n") ||
      col("n") > 10).count() == 0)
    // the k-bounded aggregate must equal the straight window form:
    // no unsampled doc may out-rank a sampled one (its priority must
    // not exceed the stratum's k-th priority; ties impossible — doc_id
    // is salted into the hash)
    val pri = t.documents.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("double").as("w"),
      SharedHash.h64(concat(lit("res|"), col("doc_id").cast("string"))).as("h"))
      .withColumn("priority",
        col("w") / ((col("h").cast("double") + 1) / lit(1152921504606846976.0)))
    val kth = sample.groupBy(col("lang")).agg(min(col("priority")).as("kth"),
      count(lit(1)).as("k"))
    val unsampled = pri.join(sample.select(col("doc_id"), lit(true).as("in_s")),
        Seq("doc_id"), "left")
      .filter(col("in_s").isNull)
      .join(kth, Seq("lang"))
    assert(unsampled.filter(col("priority") > col("kth")).count() == 0,
      "an unsampled doc out-ranks the sample — two-phase top-k lost a row")
    // determinism: a second evaluation is bit-identical
    val again = PrepOps.sampleReservoir.run(spark, sf)
    assert(sample.exceptAll(again).count() == 0 &&
      again.exceptAll(sample).count() == 0)
    sample.unpersist()
  }

  test("top-k priority aggregate == window form on adversarial ties, across partitions and merges") {
    // the hash makes priority ties impossible in the real row, so the
    // doc_id tiebreak and the TreeSet eviction-at-capacity path never
    // face equal keys there — force them here: many exact duplicate
    // priorities per group, 7 partitions so partial buffers serialize,
    // ship, and merge, plus a stratum smaller than k
    import spark.implicits._
    val K = 4
    val rows = (1L to 200L).map(i =>
      (i, "l" + (i % 3), (i % 5).toInt, (i % 7).toDouble)) ++
      Seq((900L, "rare", 1, 2.0), (901L, "rare", 2, 1.0))
    val df = rows.toDF("doc_id", "lang", "w", "priority").repartition(7)
    val item = struct(col("doc_id"), col("w"), col("priority"))
    val topk = org.apache.spark.sql.GraftSqlBridge.column(
      TopKPriorityAgg(
        org.apache.spark.sql.GraftSqlBridge.expression(item), K)
        .toAggregateExpression())
    val got = df.groupBy(col("lang")).agg(topk.as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).as("rnk"), col("col.doc_id"),
        col("col.w"), col("col.priority"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("priority").desc, col("doc_id"))
    val want = df
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= K)
      .select(col("lang"), col("rnk"), col("doc_id"), col("w"), col("priority"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "k-bounded aggregate diverges from the window form on tied priorities")
    // the undersized stratum returns all its rows, rank order intact
    assert(got.filter(col("lang") === "rare").count() == 2)
  }

  test("classifier score is exactly 1e6 for every doc when the tier is the whole corpus") {
    // with c_tr == c_all and N_tr == N_all every word ratio is exactly
    // 10^6, so every doc's integer mean is exactly 10^6 — the neutral
    // point the is_high_quality flag cuts at
    val t = Tables(spark, sf)
    val ws = t.documents
      .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("word"))
    val dict = ws.groupBy(col("word"))
      .agg(count(lit(1)).as("c_all"), count(lit(1)).as("c_tr"))
    val tot = dict.agg(sum(col("c_all")).as("n_all"), sum(col("c_tr")).as("n_tr"))
    val scored = ws.join(dict, Seq("word"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), expr("1000000 * c_tr * n_all div (c_all * n_tr)").as("r"))
      .groupBy(col("doc_id"))
      .agg(expr("sum(r) div count(1)").as("score"))
    assert(scored.filter(col("score") =!= 1000000L).count() == 0)
  }

  test("classifier flags are consistent with the score cut") {
    val df = TextOps.textClassifierScore.run(spark, sf)
    assert(df.filter(
      (col("is_high_quality") && col("classifier_score") <= 1000000L) ||
      (!col("is_high_quality") && col("classifier_score") > 1000000L)).count() == 0)
    // scores are nonnegative and bounded by the max possible ratio
    assert(df.filter(col("classifier_score") < 0).count() == 0)
  }
}

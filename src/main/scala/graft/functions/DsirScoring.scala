package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import SharedHash.h64

/** Shared core of DSIR importance scoring (Xie et al., "Data Selection
  * for Language Models via Importance Resampling", NeurIPS 2023) — ONE
  * definition of the feature/bucket/weight/score rules, used by the
  * batch oracle operator (`sample_dsir`, [[PrepOps]]) and the streamed
  * bucket-count maintenance + serving gate
  * (graft.streaming.DsirIngest). The streamed twin's parity pin
  * (streamed bucket statistics == batch-computed ones, score for
  * score) only means something if both sides call exactly this code —
  * the [[LmScoring]] discipline.
  *
  * All arithmetic is integer fixed-point (1/64-bit log2 units, exact
  * `length(bin(x))` msb + 6-bit linear mantissa) so scores are exact
  * across engines and independent of aggregation order — see the
  * operator scaladoc in [[PrepOps.sampleDsir]] for the full rationale
  * and the β = 1 Jelinek–Mercer zero-centering argument.
  */
private[graft] object DsirScoring {

  /** Feature-hash bucket count. */
  val B = 4096

  /** Fixed-point ⌊64·log2(x)⌋-style value from exact integer ops —
    * Spark rendering (`DIV` is integer division; `power(2, k)` is
    * exact in IEEE doubles for k < 63). [[mlogSql]] is the DuckDB
    * rendering of the same text.
    */
  def mlogCol(x: String): Column = {
    val m = s"(length(bin(CAST($x AS BIGINT))) - 1)"
    expr(s"($m * 64 + CASE WHEN $m <= 6 " +
      s"THEN CAST($x AS BIGINT) * CAST(power(2, 6 - $m) AS BIGINT) - 64 " +
      s"ELSE CAST($x AS BIGINT) DIV CAST(power(2, $m - 6) AS BIGINT) - 64 END)")
  }

  def mlogSql(x: String): String = {
    val m = s"(length(bin(CAST($x AS BIGINT))) - 1)"
    s"($m * 64 + CASE WHEN $m <= 6 " +
      s"THEN CAST($x AS BIGINT) * CAST(power(2, 6 - $m) AS BIGINT) - 64 " +
      s"ELSE CAST($x AS BIGINT) // CAST(power(2, $m - 6) AS BIGINT) - 64 END)"
  }

  /** `(doc_id, source, bk)` — one row per feature OCCURRENCE (word
    * unigrams + adjacent bigrams), bucketed by the salted content-free
    * hash. Pure codegen'd map: no shuffle.
    */
  def featureBuckets(docs: DataFrame): DataFrame = docs
    .filter(length(col("text")) > 0)
    .select(col("doc_id"), col("source"), split(col("text"), " ").as("arr"))
    .select(col("doc_id"), col("source"),
      explode(concat(
        expr("transform(arr, w -> concat('u|', w))"),
        expr("""CASE WHEN size(arr) >= 2
                THEN transform(sequence(0, size(arr) - 2),
                               i -> concat('b|', arr[i], ' ', arr[i + 1]))
                ELSE CAST(array() AS ARRAY<STRING>) END"""))).as("feat"))
    .select(col("doc_id"), col("source"),
      pmod(h64(concat(lit("dsir|"), col("feat"))), lit(B.toLong)).as("bk"))

  /** `(bk, cr, ct)` bucket statistics — PARTIAL AGGREGATES: raw and
    * target occurrence counts from disjoint doc sets add, so per-batch
    * tables merge by read-time SUM (the streamed maintenance story,
    * exactly [[LmScoring.unigramCounts]]'s property).
    */
  def bucketCounts(fb: DataFrame): DataFrame = fb
    .groupBy(col("bk"))
    .agg(count(lit(1)).as("cr"),
      sum(when(col("source").isin(LmScoring.TrainTier: _*), 1L)
        .otherwise(0L)).as("ct"))

  /** Merge per-batch partials to one row per bucket. */
  def mergedCounts(partials: DataFrame): DataFrame = partials
    .groupBy(col("bk"))
    .agg(sum(col("cr")).as("cr"), sum(col("ct")).as("ct"))

  /** `(bk, lam)` — the per-bucket fixed-point log-likelihood ratio
    * with β = 1 back-off smoothing (zero for a proportional bucket).
    * ≤ [[B]] rows; broadcast to the scoring pass.
    */
  def lambdaTable(stats: DataFrame): DataFrame = {
    val tot = stats.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    stats.crossJoin(broadcast(tot))
      .select(col("bk"),
        (mlogCol("ct * tr + cr * tt") - mlogCol("cr * tt") - 64)
          .cast("long").as("lam"))
  }

  /** Score every doc in `docs` against bucket statistics `stats`:
    * `(doc_id, source, n_feats, dsir_score, selected)`. Occurrence-
    * level, two passes when the caller derives `stats` from the same
    * corpus: each pass partial-aggregates map-side (the stats shuffle
    * carries ≤ [[B]] rows per task, the scoring shuffle ~1 row per
    * doc), so re-tokenizing is the cheaper currency. The r17
    * shared-histogram one-pass (`scoreSelf`) was REMOVED after a
    * 20×-corpus interleaved A/B measured it 1.61× slower
    * (tools/AB_BENCH_r18_dsir20x.json): its (doc, bk)-grain exchange
    * shuffled distinct-buckets-per-doc rows per doc — orders more
    * bytes than both partial-aggregated passes combined — and the
    * sf0.1 job floor had hidden that.
    */
  def score(docs: DataFrame, stats: DataFrame): DataFrame =
    featureBuckets(docs)
      .join(broadcast(lambdaTable(stats)), Seq("bk"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lam")).as("dsir_score"))
      .withColumn("selected", col("dsir_score") > 0)
}

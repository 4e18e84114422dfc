package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared core of the discriminative quality classifier — ONE definition
  * of the word-split/dictionary/ratio-score rules, used by the batch
  * oracle operator (`text_classifier_score`, [[TextOps]]) and the
  * streamed dictionary maintenance + serving gate
  * (graft.streaming.ClassifierIngest). As with [[LmScoring]], the
  * streamed twin's parity pin only means something if both sides call
  * exactly this code.
  *
  * The dictionary row `(word, c_all, c_tr)` is a pair of ADDITIVE
  * counts (occurrences in the whole corpus / in the trusted tier), so
  * per-batch dictionaries merge by read-time SUM. All scoring is
  * integer ppm arithmetic: r(w) = 10⁶·c_tr·N_all / (c_all·N_tr),
  * doc score = integer mean of its words' ratios. The ratio's
  * numerator is computed in 128-bit (Spark DECIMAL(38,0), DuckDB
  * HUGEINT) — in 64-bit it overflows once c_tr·N_all > 9.2×10¹²,
  * i.e. for every common word of a ~10⁷-token trusted tier, silently
  * in Spark and as a hard error in DuckDB. The QUOTIENT is bounded by
  * 10⁶·N_all/N_tr (the inverse trusted-tier fraction in ppm), so it
  * casts back to BIGINT for any corpus whose trusted tier is at least
  * ~10⁻¹⁰ of it.
  */
private[graft] object ClassifierScoring {

  /** `(doc_id, source, word)` stream with the shared word split. */
  def words(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), col("source"),
      explode(split(col("text"), " ")).as("word"))

  /** `(word, c_all, c_tr)` dictionary partial for a document set —
    * additive across disjoint doc sets, which is the whole streamed
    * maintenance story.
    */
  def dictionary(docs: DataFrame): DataFrame =
    words(docs).groupBy(col("word"))
      .agg(count(lit(1)).as("c_all"),
        sum(when(col("source").isin(LmScoring.TrainTier: _*), 1L).otherwise(0L))
          .as("c_tr"))

  /** Score every doc against dictionary `dict`:
    * `(doc_id, n_words, n_scored, classifier_score, is_high_quality)`.
    * The word stream hash-joins the dictionary (O(vocab), never
    * doc×doc); the two totals ride along as one broadcast row. The
    * dictionary join is LEFT: a word absent from the dictionary
    * contributes a NULL ratio (`n_scored` counts only covered words),
    * and a doc whose vocabulary is ENTIRELY unseen still emits a row —
    * with NULL score and NULL quality flag, so a downstream gate
    * decides deliberately instead of the doc silently bypassing it (the
    * serving-time case: ClassifierIngest scoring new docs against an
    * older dictionary). Irrelevant for the batch oracle, where the
    * dictionary covers the scored corpus and n_scored == n_words.
    */
  def score(docs: DataFrame, dict: DataFrame): DataFrame = {
    val tot = dict.agg(sum(col("c_all")).as("n_all"), sum(col("c_tr")).as("n_tr"))
    words(docs).join(dict, Seq("word"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("c_all"),
        // NULL dictionary counts propagate to a NULL ratio
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * c_tr * n_all)
                div (CAST(c_all AS DECIMAL(38,0)) * n_tr) AS BIGINT)""").as("r"))
      .groupBy(col("doc_id"))
      // n_scored counts MATCHED words (the dict-side column), exactly
      // like the SQL twin's count(dict.word) — counting `r` would
      // diverge on a matched word whose ratio is NULL (n_tr = 0, where
      // Spark's div NULLs and DuckDB's // errors)
      .agg(count(lit(1)).as("n_words"), count(col("c_all")).as("n_scored"),
        sum(col("r")).as("sr"))
      .select(col("doc_id"), col("n_words"), col("n_scored"),
        expr("CASE WHEN n_scored > 0 THEN sr div n_scored END").as("classifier_score"),
        expr("CASE WHEN n_scored > 0 THEN sr div n_scored > 1000000 END")
          .as("is_high_quality"))
  }
  // A histogram-shared one-pass form (dictionary + scores off one
  // (doc, word, c) exchange) was tried and REVERTED: the word explode
  // is a cheap split, words barely repeat within a doc, and the added
  // full-width exchange measured 1.12× on text_classifier_score
  // (tools/AB_BENCH_r17_batch1.json). The DSIR variant looked like the
  // counter-example at sf0.1 (0.88× in that A/B) but lost 1.61× at a
  // 20× corpus and was removed too (tools/AB_BENCH_r18_dsir20x.json):
  // the occurrence-level two-pass shape is right for all three.
}

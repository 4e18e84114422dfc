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
    * `(doc_id, n_words, classifier_score, is_high_quality)`. The word
    * stream hash-joins the dictionary (O(vocab), never doc×doc); the
    * two totals ride along as one broadcast row. Words absent from the
    * dictionary contribute nothing (inner join) — irrelevant when the
    * dictionary was built over the scored corpus, the serving-time
    * convention for unseen vocabulary.
    */
  def score(docs: DataFrame, dict: DataFrame): DataFrame = {
    val tot = dict.agg(sum(col("c_all")).as("n_all"), sum(col("c_tr")).as("n_tr"))
    words(docs).join(dict, Seq("word"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * c_tr * n_all)
                div (CAST(c_all AS DECIMAL(38,0)) * n_tr) AS BIGINT)""").as("r"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("r")).as("sr"))
      .select(col("doc_id"), col("n_words"),
        expr("sr div n_words").as("classifier_score"),
        expr("sr div n_words > 1000000").as("is_high_quality"))
  }
}

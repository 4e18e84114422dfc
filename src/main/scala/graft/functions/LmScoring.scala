package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared core of bigram stupid-backoff LM scoring — ONE definition of
  * the tokenize/transition/count/score rules, used by the batch oracle
  * operator (`text_lm_score`, [[TextOps]]) and the streamed dictionary
  * maintenance + serving gate (graft.streaming.LmIngest). The streamed
  * twin's parity pin (streamed dictionaries == batch-trained ones, row
  * for row) only means something if both sides call exactly this code.
  *
  * All arithmetic is integer-scaled so results are exact across
  * engines: seen bigram p = 1e6·c2/c1(w1), unseen p = 0.4e6·c1(w2)/N.
  */
private[graft] object LmScoring {

  /** Sources the LM trains on — the pipeline's trusted tier (the same
    * first tier `sample_weighted_mix` upweights): the CCNet pattern of
    * scoring the whole crawl with a model fit on curated text.
    */
  val TrainTier: Seq[String] = Seq("src0", "src1", "src2", "src3", "src4")

  /** `(doc_id, source, arr)` with the shared word split; docs with
    * fewer than two tokens have no transitions and are dropped from
    * BOTH training and scoring (so unigram counts see only docs that
    * can ever contribute a transition).
    */
  def tokenize(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), col("source"), split(col("text"), " ").as("arr"))
    .filter(size(col("arr")) >= 2)

  def trainSlice(tok: DataFrame): DataFrame =
    tok.filter(col("source").isin(TrainTier: _*))

  /** Adjacent word pairs as one codegen'd pure map — no posexplode
    * self-join.
    */
  def transitions(tok: DataFrame): DataFrame = tok
    .select(col("doc_id"),
      explode(expr(
        "transform(sequence(0, size(arr)-2), i -> struct(arr[i] AS w1, arr[i+1] AS w2))"))
        .as("pair"))
    .select(col("doc_id"), col("pair.w1").as("w1"), col("pair.w2").as("w2"))

  /** `(word, c1)` unigram occurrence counts — a partial aggregate:
    * counts from disjoint doc sets ADD, so per-batch tables merge by
    * read-time SUM (the streamed dictionary's whole maintenance story).
    */
  def unigramCounts(tok: DataFrame): DataFrame =
    tok.select(explode(col("arr")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c1"))

  /** `(w1, w2, c2)` bigram counts — additive across doc sets like
    * [[unigramCounts]] (a transition never spans documents).
    */
  def bigramCounts(tok: DataFrame): DataFrame =
    transitions(tok).groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))

  /** Score every doc in `tok` against dictionaries `uni`/`big`:
    * `(doc_id, n_bigrams, n_unseen, lm_score)`. The token stream
    * hash-joins the two dictionaries (O(train vocab), never doc×doc);
    * the train total N = Σc1 rides along as a broadcast single row.
    * (A (doc, w1, w2, c) histogram shared between scoring and the
    * self-trained dictionary was tried and REVERTED — bigrams barely
    * repeat within a document, so the histogram exchange carried the
    * full transition stream for no collapse: 1.10–1.23× on the lm rows,
    * tools/AB_BENCH_r17_batch1.json. The DSIR variant of the same
    * restructure was likewise removed in r18 after losing 1.61× at a
    * 20× corpus — tools/AB_BENCH_r18_dsir20x.json.)
    */
  def score(tok: DataFrame, uni: DataFrame, big: DataFrame): DataFrame = {
    val tot = uni.agg(sum(col("c1")).as("n"))
    transitions(tok)
      .join(big, Seq("w1", "w2"), "left")
      .join(uni.select(col("word").as("w1"), col("c1").as("c1w1")), Seq("w1"), "left")
      .join(uni.select(col("word").as("w2"), col("c1").as("c1w2")), Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("c2"),
        when(col("c2").isNotNull, expr("1000000 * c2 div c1w1"))
          .otherwise(expr("400000 * coalesce(c1w2, 0L) div n")).as("p"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c2").isNull, 1L).otherwise(0L)).as("n_unseen"),
        sum(col("p")).as("sp"))
      .select(col("doc_id"), col("n_bigrams"), col("n_unseen"),
        expr("sp div n_bigrams").as("lm_score"))
  }
}

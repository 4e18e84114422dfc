package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import SharedHash.h64

/** Shared core of α=1/2 temperature sampling — ONE definition of the
  * threshold derivation and the keep gate, used by the batch oracle
  * operator (`sample_temperature`, [[TextOps]]) and the streamed
  * rate maintenance (graft.streaming.TemperatureIngest). The
  * per-language count is an ADDITIVE partial, so the streamed form is
  * the same mergeable-partials design as the LM/classifier
  * dictionaries — and this shared core is what makes streamed-derived
  * rates provably identical to batch-derived ones.
  */
private[graft] object TemperatureSampling {

  /** `(lang, keep_th)` from `(lang, n_lang)` counts: isq = ⌊√(n·10⁶)⌋,
    * threshold = 10⁶·isq_min / isq (integer division) — the rarest
    * language keeps everything, larger ones downsample by √-excess.
    */
  def thresholds(counts: DataFrame): DataFrame = {
    val isq = counts.withColumn("isq",
      floor(sqrt(col("n_lang").cast("double") * 1000000L)).cast("long"))
    val minIsq = isq.agg(min(col("isq")).as("min_isq"))
    isq.crossJoin(broadcast(minIsq))
      .select(col("lang"), expr("1000000 * min_isq div isq").as("keep_th"))
  }

  /** The deterministic hash-Bernoulli keep gate against a threshold
    * table (broadcast — it is ≤|langs| rows at any corpus size). A
    * language ABSENT from the table keeps everything (threshold 10⁶):
    * in the batch operator the table always covers every language (it
    * is derived from the gated corpus itself), but a streamed serve
    * can meet a brand-new language before its counts land — and a
    * never-seen language is by definition the rarest, whose documented
    * rate is "survives whole". An inner join here would instead drop
    * it silently, the gate-disabling failure mode.
    */
  def gate(docs: DataFrame, th: DataFrame): DataFrame =
    docs.join(broadcast(th), Seq("lang"), "left")
      .withColumn("keep_th", coalesce(col("keep_th"), lit(1000000L)))
      .filter(h64(concat(lit("temp|"), col("doc_id").cast("string"))) % 1000000L
        < col("keep_th"))
      .select(col("doc_id"), col("lang"), col("source"), col("keep_th"))
}

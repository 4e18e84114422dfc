package graft.streaming

import graft.functions.{DedupOps, SearchOps, SketchOps}
import graft.tables.GraftTable
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The end-to-end training-data ingest pipeline as ONE streaming job —
  * the composition the individual pieces exist for:
  *
  *   arriving docs
  *     → quality gate   ([[CorpusIngest.enrich]]'s integer rules)
  *     → near-dup gate  (streamed LSH band index: drop a doc that
  *                       near-dups anything EVER indexed, or a
  *                       lower-id doc in its own batch)
  *     → index fan-out  (band index + postings + doc-length sidecar +
  *                       CM sketch, from one tokenize of the survivors)
  *
  * Everything downstream of the gates sees only surviving docs, so the
  * corpus the indexes describe IS the training corpus. One pass over
  * each micro-batch; per-table exactly-once markers, so a crash
  * mid-fan-out replays into fills.
  *
  * Replay determinism of the near-dup gate: on a partial-commit replay
  * the band table may ALREADY hold this batch's keys (its append
  * committed before the crash), so the index probe excludes the
  * batch's own doc ids — the probe then sees exactly the pre-batch
  * index state and the kept set is identical on every replay. The
  * within-batch rule (drop a doc whose candidate has a lower id) is a
  * pure function of the batch. Corpus ids are append-only-unique, the
  * standing ingestion contract.
  */
object TrainingIngest {

  /** Survivors of the two gates for one micro-batch, given the
    * PRE-batch band index. Pure — no writes.
    */
  private[streaming] def surviving(batch: DataFrame, bands: GraftTable): DataFrame = {
    val clean = CorpusIngest.enrich(batch)
      .filter(col("reject_reason").isNull)
      .select(col("doc_id"), col("text"))
    val ids = clean.select(col("doc_id").as("cand_id"))
    // vs the historical index — minus this batch's own ids (replay)
    val vsIndex = NearDupIngest.nearDupCandidates(bands, clean)
      .join(broadcast(ids), Seq("cand_id"), "left_anti")
      .select(col("probe_id").as("doc_id"))
    // within the batch: canonical pairs (a < b) drop the higher id
    val within = DedupOps.bandKeys(clean)
      .withColumnRenamed("doc_id", "a")
      .join(DedupOps.bandKeys(clean).withColumnRenamed("doc_id", "doc_id"),
        Seq("band", "key"))
      .filter(col("a") < col("doc_id"))
      .select(col("doc_id"))
    clean.join(vsIndex.union(within).distinct(), Seq("doc_id"), "left_anti")
  }

  def run(docs: DataFrame, bands: GraftTable, postings: GraftTable,
      docStats: GraftTable, cmTable: GraftTable,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.persist()
        // the gates read the band table, so survivors must be pinned
        // BEFORE the band append commits — localCheckpoint cuts the
        // lineage to the table's pre-batch snapshot
        val kept = surviving(batch.toDF(), bands).localCheckpoint()
        val tfB = SearchOps.tokenize(kept)
          .groupBy(col("term"), col("doc_id"))
          .agg(count(lit(1)).as("tf"))
          .persist()
        try {
          Sinks.exactlyOnce(bands, "lshBandAppend", batchId) {
            if (!batch.isEmpty) bands.append(DedupOps.bandKeys(kept))
          }
          Sinks.exactlyOnce(postings, "postingsAppend", batchId) {
            if (!batch.isEmpty) postings.append(tfB)
          }
          Sinks.exactlyOnce(cmTable, "cmSketchAppend", batchId) {
            if (!batch.isEmpty) {
              import SketchOps.{cmCellOf, CmD}
              cmTable.append(tfB
                .groupBy(col("term")).agg(sum(col("tf")).as("n"))
                .select(col("n"),
                  explode(sequence(lit(0), lit(CmD - 1))).as("i"), col("term"))
                .groupBy(col("i"), cmCellOf(col("i"), col("term")).as("cell"))
                .agg(sum(col("n")).as("cnt")))
            }
          }
          Sinks.exactlyOnce(docStats, "docStatsAppend", batchId) {
            if (!batch.isEmpty)
              docStats.append(kept.select(col("doc_id"),
                size(filter(split(lower(coalesce(col("text"), lit(""))), "[^a-z]+"),
                  t => length(t) >= 3)).cast("long").as("dl")))
          }
        } finally { tfB.unpersist(); batch.unpersist() }
        ()
      }
      .start()
}

package graft.streaming

import java.nio.file.Files

import graft.QueryDef
import graft.functions.TextOps
import graft.tables.GraftTable
import org.apache.spark.sql.functions.col

/** Driver-gate oracle rows for the streamed-index twins — the first
  * streaming-maintained state checked by the cross-engine hash gate,
  * not just by ScalaTest parity pins.
  *
  * `lm_ingest_scores` runs the REAL Structured Streaming maintenance
  * path end-to-end inside the query: the corpus is staged as a
  * multi-file parquet directory, read back as a file-source stream
  * (`maxFilesPerTrigger 1`, so the dictionaries accumulate over several
  * genuine micro-batches with exactly-once sink markers), compacted by
  * the maintenance cadence, and then served through
  * [[LmIngest.score]]. The DuckDB oracle is the UNCHANGED batch
  * `text_lm_score` SQL — the partial-aggregate design claim ("streamed
  * dictionaries are indistinguishable from batch training") stated as
  * a hash equality between a streamed Spark state and an independent
  * one-shot DuckDB recompute.
  *
  * Scale shape: identical to the batch operator's (the stream adds
  * only O(batch vocab) append work per micro-batch); the staging
  * directory is unique per call so concurrent verify/bench/test runs
  * never share state (the `s11` catalog-clobber lesson).
  */
object IngestOracleOps {

  val lmIngestScores: QueryDef = QueryDef(
    "lm_ingest_scores", TextOps.lmScoreSql) { t =>
    val spark = t.spark
    val stage = Files.createTempDirectory("graft_lm_ingest").toString
    val docs = t.documents.select(col("doc_id"), col("source"), col("text"))

    // stage the corpus as 4 files → 4 real micro-batches
    docs.repartition(4).write.mode("overwrite").parquet(s"$stage/corpus")

    val uni = new GraftTable(spark, LmIngest.unigramsDef, s"$stage/uni")
    val big = new GraftTable(spark, LmIngest.bigramsDef, s"$stage/big")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$stage/corpus")
    val q = LmIngest.dictionaryAppend(stream, uni, big, s"$stage/ck")
    try {
      q.processAllAvailable()
    } finally q.stop()

    // maintenance cadence on the accumulated partials, then serve —
    // the scores must be invariant under the pre-merge by construction
    LmIngest.compactDictionaries(uni, big)
    LmIngest.score(docs, uni, big)
  }

  val all: Seq[QueryDef] = Seq(lmIngestScores)
}

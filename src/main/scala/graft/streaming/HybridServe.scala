package graft.streaming

import graft.tables.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Serving-side hybrid retrieval: fuse the TOP-K LISTS of the two
  * streamed indexes — the term-partitioned BM25 postings table
  * ([[PostingsIngest]]) and the cell-partitioned IVF vector index
  * ([[VectorIngest]]) — with reciprocal-rank fusion. This is the
  * production form the `hybrid_rrf` oracle query's Scaladoc promises:
  * the oracle-checkable query ranks the full candidate set (so DuckDB
  * can rebuild it); serving fuses two ALREADY-BOUNDED lists, each
  * produced by its own pruned index read (query terms' partition dirs;
  * nprobe cells' partition dirs), so the fusion join touches at most
  * 2·k rows per query no matter the corpus size.
  *
  * RRF (integer, same constant as the oracle query):
  *   rrf_ppm = Σ_lists 10⁶ ∕ (60 + rank), missing from a list → 0.
  * A doc found by both retrievers outranks near-equals found by one —
  * the standard fusion property; ties break on doc id.
  */
object HybridServe {

  /** One query = a tokenized term set (lexical leg) + an embedding
    * (semantic leg, `queryVec` rows of (vec_id, embedding)). Returns
    * the fused top-`k` as (rnk, doc_id, r_lex, r_sem, rrf_ppm) with
    * NULL component ranks where a doc was absent from that list.
    */
  def hybridTopK(postings: GraftTable, docStats: GraftTable,
      vecIndex: GraftTable, codebook: DataFrame, queryVec: DataFrame,
      terms: Seq[String], nprobe: Int, kEach: Int, k: Int): DataFrame = {
    // ONE query per call: the lexical leg has a single term set, so the
    // doc_id-keyed fusion join below is only meaningful for a single
    // semantic query — a multi-row queryVec would silently sum RRF
    // contributions across unrelated queries. take(2) bounds the guard
    // at two rows via limit pushdown instead of a full distinct+count.
    require(queryVec.select("vec_id").distinct().take(2).length == 1,
      "hybridTopK serves exactly one query vector per call")
    val lex = PostingsIngest.bm25TopK(postings, docStats, terms, kEach)
      .select(col("doc_id"), col("rnk").as("r_lex"))
    val sem = VectorIngest.probeTopK(vecIndex, queryVec, codebook, nprobe, kEach)
      .select(col("vec_id").as("doc_id"), col("rnk").as("r_sem"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf_ppm",
        coalesce(expr("1000000 div (60 + r_lex)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + r_sem)"), lit(0L)))
      .orderBy(col("rrf_ppm").desc, col("doc_id")).limit(k)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rrf_ppm").desc, col("doc_id"))))
      .select(col("rnk"), col("doc_id"), col("r_lex"), col("r_sem"), col("rrf_ppm"))
  }
}

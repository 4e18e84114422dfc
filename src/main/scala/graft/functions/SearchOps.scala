package graft.functions

import graft.QueryDef
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval over the `documents`/`embeddings` corpus: lexical BM25
  * ranking and lexical+semantic reciprocal-rank fusion — the query-side
  * ops a training-data pipeline runs constantly (mining domain
  * exemplars, sourcing dedup/decontam candidates, building eval
  * retrieval sets). Reference scope: the reference engine's SQL surface
  * (Flink/Trino) has no retrieval operators; these extend the corpus
  * toolset the same way the dedup/ANN families do.
  *
  * Cross-engine discipline (same as [[PrepOps]]' TF-IDF): every score is
  * exact int64 arithmetic — BM25's floats are rationalized away by
  * folding k1=6/5, b=3/4 into one integer formula, and RRF is integer by
  * construction — so the DuckDB hash compare is bit-exact with no float
  * summation order anywhere. Only the semantic cosine inside the fusion
  * ranking is floating point, computed with the identical operand order
  * both engines (the `ann_brute_topk` discipline, hash-verified there).
  */
object SearchOps {

  /** Fixed query-term set for the BM25 oracle query (a runtime query
    * string tokenizes to exactly this shape).
    */
  private[graft] val QueryTerms = Seq("vector", "stream", "merge", "window", "hash")
  private[graft] val BmTopK     = 20
  private val NQueries   = 5  // fusion query docs: doc_id < 5, same ids as the ANN query set
  private val RrfK       = 60 // the standard RRF dampening constant
  private val FusedTopK  = 10

  private def sqlTermList: String =
    QueryTerms.map(t => s"'$t'").mkString("(", ", ", ")")

  /** The corpus tokenizer every lexical op shares (and the one the
    * streaming postings index must apply identically — see
    * [[graft.streaming.PostingsIngest]]): lowercase, split on non-letter
    * runs, keep tokens of length ≥ 3.
    */
  private[graft] def tokenize(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(length(col("term")) >= 3)

  /** Shared BM25 scoring core over pre-built postings inputs:
    * `tf(doc_id, term, tf)` already restricted to the query terms,
    * `dl(doc_id, dl)`, `tot` one row `(nn, ll)` = (doc count, total
    * token count). Exact int64 throughout (see [[bm25Topk]]); df is
    * derived from `tf` (rows per term = docs containing the term).
    * Both the raw-text query and the postings-table serving path rank
    * through this one body, so the two can never drift.
    *
    * The length normalization uses the TRUNCATED integer average doc
    * length `avg_r = max(1, L ∕ N)` rather than the exact rational L/N:
    * rationalizing against raw L would put 22000·L·tf in the numerator,
    * which overflows int64 at corpus scale (L ~ 10¹², tf > ~420 — the
    * exact serving regime this body exists for), and Spark wraps where
    * DuckDB errors. With avg_r the largest intermediate is
    * 22000·avg_r·tf — safe while avg_r·tf < 4·10¹⁴, i.e. any corpus
    * whose docs fit in memory. avg_r is identical in both engines
    * (truncating division), so ranking stays bit-exact.
    */
  private[graft] def bm25Rank(tf: org.apache.spark.sql.DataFrame,
      dl: org.apache.spark.sql.DataFrame, tot: org.apache.spark.sql.DataFrame,
      topK: Int): org.apache.spark.sql.DataFrame = {
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfT), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(tot))
      .withColumn("avg_r", expr("greatest(1L, ll div nn)"))
      .withColumn("idf_ppm", expr("(2 * (nn - df) + 1) * 1000000 div (2 * df + 1)"))
      .withColumn("t_ppt",
        expr("22000 * avg_r * tf div (10 * avg_r * tf + 3 * avg_r + 9 * dl)"))
      .groupBy(col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("n_terms"),
        sum(expr("idf_ppm * t_ppt div 1000")).as("score_ppm"))
      // top-k FIRST (TakeOrderedAndProject: per-partition heaps, one
      // k-row merge — no global sort), then rank the k survivors; the
      // single-partition window only ever sees k rows
      .orderBy(col("score_ppm").desc, col("doc_id")).limit(topK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score_ppm").desc, col("doc_id"))))
      .select(col("rnk"), col("doc_id"), col("dl"), col("n_terms"), col("score_ppm"))
  }

  /** BM25 top-k retrieval, exact-integer form. With k1 = 6/5 and
    * b = 3/4, and writing N = doc count, L = total token count,
    * avg_r = max(1, L ∕ N) (the integer average doc length), the
    * per-term score
    *
    *   idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * multiplies through by 10·avg_r into pure overflow-safe int64:
    *
    *   idf_ppm = (2·(N − df) + 1) · 10⁶ ∕ (2·df + 1)       [Robertson
    *             idf with the log dropped — rank-order preserving for a
    *             single-term contribution, and exactly representable]
    *   t_ppt   = 22000·avg_r·tf ∕ (10·avg_r·tf + 3·avg_r + 9·dl)
    *   score   = Σ_terms idf_ppm · t_ppt ∕ 1000
    *
    * (∕ = truncating integer division, identical in Spark `div` and
    * DuckDB `//`; see [[bm25Rank]] for why avg_r replaces raw L in the
    * rationalization.) Shape at scale: the inverted-index pattern — tokenize
    * is a pure map, tf/df/dl are map-side-combining hash aggregates, the
    * per-term join keys on `term` (df is |query terms| rows → broadcast),
    * and the final top-k is TakeOrderedAndProject, not a full sort.
    * Nothing downstream of the aggregates grows with N. The tf/dl/total
    * branches each re-tokenize here (Catalyst doesn't share subplans);
    * the 100 TB form tokenizes ONCE into a materialized postings table
    * (doc_id, term, tf) + doc-length sidecar — the classic inverted
    * index — and every BM25 query reads that, never the raw text.
    */
  val bm25Topk: QueryDef = QueryDef(
    "bm25_topk",
    s"""WITH w AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
       |           FROM documents),
       |tk AS (SELECT doc_id, term FROM w WHERE length(term) >= 3),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tk
       |       WHERE term IN $sqlTermList GROUP BY doc_id, term),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |tot AS (SELECT nn, greatest(1, ll // nn) AS avg_r
       |        FROM (SELECT (SELECT count(*) FROM documents) AS nn,
       |                     (SELECT CAST(sum(dl) AS BIGINT) FROM dl) AS ll)),
       |sc AS (SELECT tf.doc_id, dl.dl,
       |              (2 * (nn - df) + 1) * 1000000 // (2 * df + 1) AS idf_ppm,
       |              22000 * avg_r * tf.tf
       |                // (10 * avg_r * tf.tf + 3 * avg_r + 9 * dl.dl) AS t_ppt
       |       FROM tf JOIN df USING (term) JOIN dl ON dl.doc_id = tf.doc_id
       |       CROSS JOIN tot),
       |agg AS (SELECT doc_id, dl, CAST(count(*) AS BIGINT) AS n_terms,
       |               CAST(sum(idf_ppm * t_ppt // 1000) AS BIGINT) AS score_ppm
       |        FROM sc GROUP BY doc_id, dl),
       |rk AS (SELECT *, row_number() OVER (ORDER BY score_ppm DESC, doc_id) AS rnk
       |       FROM agg)
       |SELECT rnk, doc_id, dl, n_terms, score_ppm FROM rk WHERE rnk <= $BmTopK""".stripMargin) { t =>
    val toks = tokenize(t.documents)
    // dl feeds both the scoring join and the totals branch; measured
    // A/B: localCheckpoint-ing it costs MORE than the re-run tokenize
    // at bench scale (1.48 s vs 1.33 s warm), so the lineage stays lazy
    // — the materialize-once answer at real scale is the postings
    // table (PostingsIngest), not a per-query checkpoint
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("term").isin(QueryTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val tot = t.documents.agg(count(lit(1)).as("nn"))
      .crossJoin(broadcast(dl.agg(sum(col("dl")).as("ll"))))
    bm25Rank(tf, dl, tot, BmTopK)
  }

  /** Hybrid retrieval: reciprocal-rank fusion of a lexical ranking
    * (shared-distinct-term overlap with the query doc, exact integers)
    * and a semantic ranking (embedding cosine, the `ann_brute_topk`
    * operand-order discipline) over the same candidate universe, for
    * the same 5 query docs the ANN family uses (doc_id ≡ vec_id).
    *
    *   rrf_ppm = 10⁶ ∕ (60 + r_lex) + 10⁶ ∕ (60 + r_sem)
    *
    * — integer by construction, so fusion and final ordering are exact
    * cross-engine; ties break on doc id. The oracle-checkable form ranks
    * the full candidate set (both component rankings are total here);
    * the production form at 100 TB fuses the component retrievers'
    * top-k lists instead — each list already bounded by its own index
    * (inverted index / IVF cells), so the fusion join touches k rows
    * per query, never the corpus. Lexical overlap is an inverted-index
    * join on `term` (the 5-doc query side broadcast), not a text×text
    * cross join; the semantic side is the same broadcast scan the ANN
    * queries use.
    */
  val hybridRrf: QueryDef = QueryDef(
    "hybrid_rrf",
    s"""WITH e AS (${AnnOps.sqlNorms}),
       |w AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
       |      FROM documents),
       |dt AS (SELECT DISTINCT doc_id, term FROM w WHERE length(term) >= 3),
       |qt AS (SELECT doc_id AS query_id, term FROM dt WHERE doc_id < $NQueries),
       |ov AS (SELECT qt.query_id, dt.doc_id, count(*) AS overlap
       |       FROM qt JOIN dt USING (term) WHERE dt.doc_id <> qt.query_id
       |       GROUP BY qt.query_id, dt.doc_id),
       |p AS (SELECT q.vec_id AS query_id, e.vec_id,
       |             coalesce(ov.overlap, 0) AS overlap,
       |             ${AnnOps.sqlDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm) AS sim
       |      FROM e JOIN e q ON q.vec_id < $NQueries AND e.vec_id <> q.vec_id
       |      LEFT JOIN ov ON ov.query_id = q.vec_id AND ov.doc_id = e.vec_id),
       |r AS (SELECT query_id, vec_id, overlap,
       |             row_number() OVER (PARTITION BY query_id
       |                                ORDER BY overlap DESC, vec_id) AS r_lex,
       |             row_number() OVER (PARTITION BY query_id
       |                                ORDER BY sim DESC, vec_id) AS r_sem
       |      FROM p),
       |f AS (SELECT query_id, vec_id, overlap, r_lex, r_sem,
       |             1000000 // ($RrfK + r_lex) + 1000000 // ($RrfK + r_sem) AS rrf_ppm
       |      FROM r),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |                                    ORDER BY rrf_ppm DESC, vec_id) AS rnk
       |       FROM f)
       |SELECT query_id, rnk, vec_id, overlap, r_lex, r_sem, rrf_ppm
       |FROM rk WHERE rnk <= $FusedTopK""".stripMargin) { t =>
    val e = t.embeddings
      .withColumn("nrm", sqrt(AnnOps.dot(col("embedding"), col("embedding"))))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val dt = tokenize(t.documents).distinct()
    val qt = dt.filter(col("doc_id") < NQueries)
      .select(col("doc_id").as("query_id"), col("term"))
    val ov = dt.join(broadcast(qt), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id")).agg(count(lit(1)).as("overlap"))
      .withColumnRenamed("doc_id", "vec_id")
    val pairs = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim",
        AnnOps.dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
      .join(ov, Seq("query_id", "vec_id"), "left")
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
    val ranked = pairs
      .withColumn("r_lex", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("overlap").desc, col("vec_id"))))
      .withColumn("r_sem", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))))
      .withColumn("rrf_ppm",
        expr(s"1000000 div ($RrfK + r_lex) + 1000000 div ($RrfK + r_sem)"))
    ranked
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("rrf_ppm").desc, col("vec_id"))))
      .filter(col("rnk") <= FusedTopK)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("overlap"),
        col("r_lex"), col("r_sem"), col("rrf_ppm"))
  }

  val all: Seq[QueryDef] = Seq(bm25Topk, hybridRrf)
}

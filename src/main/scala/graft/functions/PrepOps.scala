package graft.functions

import graft.QueryDef
import org.apache.spark.sql.functions._
import SharedHash.{h64, h64Sql}

/** Corpus-preparation operators for a large-scale training-data pipeline:
  * RAG-style chunking, corpus vocabulary statistics, tf-idf keyword
  * extraction, domain-weighted mixture sampling, and PII scrubbing.
  * All over the `documents` table; all pure codegen'd expressions (no
  * UDFs).
  *
  * Scale notes (100 TB discipline):
  *  - chunking and scrubbing are per-row maps: no shuffle, parallelize
  *    embarrassingly, prune at the scan (only doc_id + text read);
  *  - topk_terms is partial-agg + TakeOrderedAndProject: the map-side
  *    combine collapses each partition to its local vocabulary before
  *    the shuffle, and only (term, count) pairs move — never documents;
  *  - tf-idf shuffles (doc_id, term, tf) pairs twice (term agg, then
  *    term join) — both keyed on term whose cardinality is vocabulary-
  *    not corpus-sized; AQE broadcast-converts the df side when small;
  *  - mixture sampling is a pure filter from a salted content-free hash:
  *    reproducible across engines/runs, keep decisions stable under
  *    incremental ingestion, prunes at the scan.
  */
object PrepOps {

  /** Fixed-size overlapping character chunking (RAG / context-window
    * prep): size 200, stride 150 (25% overlap). Chunk starts tile the
    * document at stride spacing; the final chunk may be short. substring
    * is character-based in both engines.
    */
  val textChunk: QueryDef = QueryDef(
    "text_chunk",
    """WITH k AS (
      |  SELECT doc_id, text,
      |         unnest(generate_series(0, (length(text) - 1) // 150)) AS chunk_idx
      |  FROM documents WHERE length(text) > 0)
      |SELECT doc_id, chunk_idx,
      |       substr(text, CAST(chunk_idx * 150 + 1 AS INT), 200) AS chunk_text,
      |       length(substr(text, CAST(chunk_idx * 150 + 1 AS INT), 200)) AS chunk_len
      |FROM k""".stripMargin) { t =>
    t.documents
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), expr("(length(text) - 1) div 150"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        expr("substring(text, CAST(chunk_idx * 150 + 1 AS INT), 200)").as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")))
  }

  /** Corpus-level top-k vocabulary: lowercase, split on non-letters,
    * terms of length >= 3, top 20 by count with an alphabetical
    * tie-break. Plans as partial agg -> TakeOrderedAndProject (top-k
    * heap per partition, never a global sort).
    */
  val topkTerms: QueryDef = QueryDef(
    "topk_terms",
    """WITH w AS (
      |  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
      |  FROM documents)
      |SELECT term, count(*) AS n FROM w WHERE length(term) >= 3
      |GROUP BY term ORDER BY n DESC, term LIMIT 20""".stripMargin) { t =>
    t.documents
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(length(col("term")) >= 3)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(20)
  }

  /** tf-idf keyword extraction: each document's top term by rarity-
    * weighted frequency. The idf factor is the INTEGER score
    * `tf * 1_000_000 div df` — monotone in tf/df exactly like
    * tf*log(N/df) for ranking within a document, but integer-exact so
    * both engines agree bit-for-bit (no cross-engine log/double drift).
    * Deterministic (score desc, term asc) tie-break.
    */
  val textTfidf: QueryDef = QueryDef(
    "text_tfidf",
    """WITH w AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM w WHERE length(term) >= 3
      |       GROUP BY doc_id, term),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df, tf.tf * 1000000 // df.df AS score
      |       FROM tf JOIN df USING (term)),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |                                    ORDER BY score DESC, term) AS rn FROM sc)
      |SELECT doc_id, term AS top_term, tf, df, score FROM rk WHERE rn = 1""".stripMargin) { t =>
    val terms = t.documents
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(length(col("term")) >= 3)
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .withColumn("score", expr("tf * 1000000 div df"))
    // top term per doc via a lexicographic min(struct) hash aggregate:
    // (-score, term) ascending == (score desc, term asc), the oracle's
    // window order — but as a partial-aggregating agg (each map task
    // collapses to one candidate per doc before the shuffle) instead of
    // a sort-based row_number window over every (doc, term) pair
    scored
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("score")).as("ns"), col("term"), col("tf"),
        col("df"), col("score"))).as("top"))
      .select(col("doc_id"), col("top.term").as("top_term"),
        col("top.tf").as("tf"), col("top.df").as("df"),
        col("top.score").as("score"))
  }

  /** Domain-weighted mixture sampling: per-source keep rates (the
    * training-mix weights — 90% of the first source tier down to 10% of
    * the tail) decided by a salted content-free hash. Same reproducible-
    * Bernoulli machinery as sample_stratified, keyed on the mix salt so
    * the two samples are independent.
    */
  val sampleWeightedMix: QueryDef = {
    def tier(lo: Int, hi: Int): Seq[String] = (lo to hi).map("src" + _)
    val t1 = tier(0, 4); val t2 = tier(5, 9); val t3 = tier(10, 14)
    def inList(xs: Seq[String]) = xs.map("'" + _ + "'").mkString(", ")
    QueryDef(
      "sample_weighted_mix",
      s"""SELECT doc_id, source, lang
         |FROM documents
         |WHERE ${h64Sql("concat('mix|', CAST(doc_id AS VARCHAR))")} % 10000 <
         |      CASE WHEN source IN (${inList(t1)}) THEN 9000
         |           WHEN source IN (${inList(t2)}) THEN 5000
         |           WHEN source IN (${inList(t3)}) THEN 2500
         |           ELSE 1000 END""".stripMargin) { t =>
      t.documents
        .filter(h64(concat(lit("mix|"), col("doc_id").cast("string"))) % 10000 <
          when(col("source").isin(t1: _*), 9000)
            .when(col("source").isin(t2: _*), 5000)
            .when(col("source").isin(t3: _*), 2500)
            .otherwise(1000))
        .select(col("doc_id"), col("source"), col("lang"))
    }
  }

  /** Deterministic weighted WITHOUT-replacement sampling, k docs per
    * language with inclusion probability ∝ token count — priority
    * sampling (Duffield/Lund/Thorup), the batch twin of the
    * Efraimidis–Spirakis weighted reservoir: each doc gets priority
    * p = w / u with u = (h+1)/2⁶⁰ from the salted content-free
    * [[SharedHash.h64]], and the k highest priorities per stratum win.
    * Completes the sampling family's gap: stratified/temperature/mix
    * are RATE samplers (keep-probability per row), this one returns a
    * FIXED-SIZE sample per stratum — the eval-set / ablation-slice
    * primitive. Deterministic across engines, runs, and incremental
    * ingestion (a doc's priority never changes as the corpus grows).
    *
    * Cross-engine exactness of the double priority: unlike `pow`
    * (whose rounding is implementation-defined — why A-ES's u^(1/w)
    * key can never be oracle-exact), every op here is IEEE
    * correctly-rounded and identically sequenced in both engines:
    * int→double casts, +1, an EXACT power-of-two scale (2⁻⁶⁰ shifts
    * the exponent only), and one division — so the priority doubles
    * are bit-identical and the top-k set and ranks hash-match.
    *
    * Scale shape: the oracle states the textbook per-stratum
    * row_number window; the Spark side is one [[TopKPriorityAgg]]
    * aggregation — a k-bounded TypedImperativeAggregate (the
    * [[KmvSketchAgg]] partial/merge discipline), so every map task
    * ships at most k items per language across the single exchange,
    * no stratum is ever globally sorted, and the buffer stays k-bounded
    * at ANY skew (a whole corpus in one language still aggregates in
    * O(k) memory per task). A `slice(sort_array(collect_list ...))`
    * two-phase form was rejected: top-k-correct, but its partial
    * buffer is the whole group pre-slice — corpus-sized shuffle and
    * unbounded task memory, the two things this row exists to bound.
    */
  val sampleReservoir: QueryDef = {
    val K = 10
    val Scale = "1152921504606846976.0" // 2^60 as a double literal
    QueryDef(
      "sample_reservoir",
      s"""WITH a AS (
         |  SELECT doc_id, lang,
         |         len(string_split(text, ' ')) AS w,
         |         ${h64Sql("concat('res|', CAST(doc_id AS VARCHAR))")} AS h
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, lang, w,
         |         CAST(w AS DOUBLE) / ((CAST(h AS DOUBLE) + 1) / $Scale)
         |           AS priority
         |  FROM a),
         |r AS (
         |  SELECT doc_id, lang, w, priority,
         |         row_number() OVER (PARTITION BY lang
         |                            ORDER BY priority DESC, doc_id) AS rnk
         |  FROM p)
         |SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id,
         |       CAST(w AS BIGINT) AS n_tokens, priority
         |FROM r WHERE rnk <= $K""".stripMargin) { t =>
      val p = t.documents.select(
        col("doc_id"), col("lang"),
        size(split(col("text"), " ")).as("w"),
        h64(concat(lit("res|"), col("doc_id").cast("string"))).as("h"))
        .withColumn("priority",
          col("w").cast("double") /
            ((col("h").cast("double") + 1) / lit(1152921504606846976.0)))
      val item = struct(col("doc_id"), col("w"), col("priority"))
      val topk = org.apache.spark.sql.GraftSqlBridge.column(
        TopKPriorityAgg(
          org.apache.spark.sql.GraftSqlBridge.expression(item), K)
          .toAggregateExpression())
      p.groupBy(col("lang"))
        .agg(topk.as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.doc_id").as("doc_id"),
          col("col.w").cast("long").as("n_tokens"),
          col("col.priority").as("priority"))
    }
  }

  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val phoneRe = "\\+?\\d[\\d-]{6,}\\d"

  /** PII scrubbing: redact emails and phone-shaped digit runs. The
    * fixture injects one deterministic email + phone per document (the
    * corpus itself is synthetic word salad) so the redaction regexes are
    * genuinely exercised; counts come from regexp_extract_all so the
    * oracle verifies match semantics, not just the rewrite.
    */
  val textPiiScrub: QueryDef = QueryDef(
    "text_pii_scrub",
    s"""WITH s AS (
       |  SELECT doc_id,
       |         text || ' contact user' || doc_id || '@example.com or +1-555-' ||
       |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
       |  FROM documents)
       |SELECT doc_id,
       |       len(regexp_extract_all(raw, '$emailRe')) AS n_emails,
       |       len(regexp_extract_all(raw, '$phoneRe')) AS n_phones,
       |       regexp_replace(regexp_replace(raw, '$emailRe', '<EMAIL>', 'g'),
       |                      '$phoneRe', '<PHONE>', 'g') AS scrubbed
       |FROM s""".stripMargin) { t =>
    val raw = concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    t.documents
      .select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("raw"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("raw"), lit(phoneRe), lit(0))).as("n_phones"),
        regexp_replace(regexp_replace(col("raw"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("scrubbed"))
  }

  /** DSIR-style importance scoring for target-domain data selection
    * (Xie et al., "Data Selection for Language Models via Importance
    * Resampling", NeurIPS 2023 — public method): hashed n-gram features
    * (word unigrams + adjacent bigrams, 4096 buckets via the salted
    * content-free [[SharedHash.h64]]), per-bucket occurrence counts
    * under the TARGET distribution (the trusted source tier —
    * [[LmScoring.TrainTier]], the CCNet pattern the LM rows share) and
    * the RAW distribution (the whole corpus), and a per-doc importance
    * score Σ over feature occurrences of the bucket's log-likelihood
    * ratio log2( p̂_target(b) / p_raw(b) ).
    *
    * The target estimate is back-off smoothed AGAINST the raw
    * distribution (β = 1 Jelinek–Mercer):
    * p̂_t(b) = (ct/Tt + cr/Tr) / 2, so the per-feature weight is
    * log2((ct·Tr + cr·Tt) / (cr·Tt)) − 1 — EXACTLY zero for a bucket
    * whose target share matches its corpus share, which makes
    * `selected = score > 0` the principled "reads more target-like
    * than corpus-average" cut (the same natural threshold the
    * classifier row uses at ratio 10⁶). Unsmoothed add-one was
    * measured to push every score negative (the ε/Tt prior shift) —
    * the back-off form selects 96% of the trusted tier and ~16% of
    * the tail at sf0.01, the DSIR-expected shape. Classic DSIR then
    * samples ∝ weight (Gumbel top-k); the score column is emitted so
    * a downstream sampler can apply the reproducible-Bernoulli
    * machinery at any rate.
    *
    * Cross-engine exactness: float log2 is neither
    * correctly-rounded-guaranteed across libms nor order-stable under
    * parallel summation, so the log is computed in fixed point from
    * exact integer ops — `length(bin(x)) − 1` bits plus a 6-bit
    * linear-mantissa fraction (division by an exact power of two) —
    * making every per-bucket weight an integer (units of 1/64 bit)
    * and the doc score an order-independent integer sum. `ct·Tr` is
    * the one product that can overflow at extreme corpus scale
    * (Tt·Tr > 2⁶³ at ~10¹² occurrences/side); the fix is the
    * [[sampleTemperature]] sqrt note's: right-shift all four counters
    * by a common 2^k on the tiny ≤B-row table before forming λ.
    *
    * Scale shape (100 TB): two scans of the corpus (bucket statistics,
    * then scoring — the LM rows' train/score shape); the statistics
    * aggregate is a 4096-key partial agg (map tasks collapse to ≤B
    * rows before the one exchange); the λ table is ≤B rows and
    * BROADCAST to the scoring pass, so feature occurrences are scored
    * in place — the only occurrence-level shuffle is the final
    * per-doc sum, keyed by doc_id and partially aggregated.
    */
  /** [[DsirScoring]] is the shared feature/bucket/weight/score core —
    * the streamed twin (`dsir_ingest_scores`, DsirIngest) calls exactly
    * the same code, so this SQL is both rows' oracle.
    */
  val dsirSql: String = {
    val B = DsirScoring.B
    def inList(xs: Seq[String]) = xs.map("'" + _ + "'").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS arr
       |  FROM documents WHERE length(text) > 0),
       |f AS (
       |  SELECT doc_id, source, 'u|' || unnest(arr) AS feat FROM w
       |  UNION ALL
       |  SELECT doc_id, source, 'b|' || arr[i] || ' ' || arr[i + 1] AS feat
       |  FROM w, unnest(generate_series(1, len(arr) - 1)) AS t(i)
       |  WHERE len(arr) >= 2),
       |fb AS (
       |  SELECT doc_id, source,
       |         ${h64Sql("'dsir|' || feat")} % $B AS bk
       |  FROM f),
       |s AS (
       |  SELECT bk, count(*) AS cr,
       |         sum(CASE WHEN source IN (${inList(LmScoring.TrainTier)})
       |                  THEN 1 ELSE 0 END) AS ct
       |  FROM fb GROUP BY bk),
       |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS tr,
       |               CAST(sum(ct) AS BIGINT) AS tt FROM s),
       |lam AS (
       |  SELECT bk,
       |         ${DsirScoring.mlogSql("ct * tr + cr * tt")} - ${DsirScoring.mlogSql("cr * tt")} - 64 AS lam
       |  FROM s, tot)
       |SELECT fb.doc_id, fb.source,
       |       count(*) AS n_feats,
       |       CAST(sum(lam) AS BIGINT) AS dsir_score,
       |       CAST(sum(lam) AS BIGINT) > 0 AS selected
       |FROM fb JOIN lam USING (bk)
       |GROUP BY fb.doc_id, fb.source""".stripMargin
  }

  val sampleDsir: QueryDef =
    QueryDef("sample_dsir", dsirSql) { t =>
      val docs = t.documents.select(col("doc_id"), col("source"), col("text"))
      // two-pass occurrence-level form, NOT the r17 shared-histogram
      // one-pass (scoreSelf, removed): at a 20× corpus the histogram's
      // (doc, bk)-grain exchange shuffled ~distinct-buckets-per-doc
      // rows per doc where these two passes partial-aggregate map-side
      // to ≤B rows (stats) and ~1 row per doc (scores) — measured 1.61×
      // SLOWER one-pass (tools/AB_BENCH_r18_dsir20x.json, reps 4
      // interleaved); the sf0.1 reading that justified it was flat
      // because the job floor hid the shuffle delta. Guide §2.3: fewer
      // shuffled bytes beats fewer passes when partial aggregation
      // collapses map-side.
      DsirScoring.score(docs,
        DsirScoring.bucketCounts(DsirScoring.featureBuckets(docs)))
    }

  val all: Seq[QueryDef] =
    Seq(textChunk, topkTerms, textTfidf, sampleWeightedMix, sampleReservoir,
      textPiiScrub, sampleDsir)
}

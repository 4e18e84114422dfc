package graft.functions

import graft.QueryDef
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import SharedHash.{h64, h64Sql}

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language-ID heuristic, and document
  * fingerprinting. All are built from codegen'd higher-order functions
  * (transform/aggregate/filter) over the `documents` table — no UDFs, so
  * the whole stage compiles to a single WholeStageCodegen span and
  * parallelizes embarrassingly (pure map, no shuffle).
  */
object TextOps {

  /** Token counting: whitespace tokens + a BPE-ish regex token count. */
  val textTokens: QueryDef = QueryDef(
    "text_tokens",
    """SELECT doc_id,
      |       len(regexp_split_to_array(trim(text), '\s+'))  AS n_ws_tokens,
      |       len(regexp_extract_all(text, '[a-z0-9]+'))     AS n_re_tokens,
      |       length(text)                                   AS n_chars_actual
      |FROM documents""".stripMargin) { t =>
    t.documents.select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).as("n_re_tokens"),
      length(col("text")).as("n_chars_actual"))
  }

  private val stopwords = Seq("the", "a", "of", "to", "and", "in", "is")

  /** Quality scoring: word count, mean word length, stopword ratio, and a
    * bounded composite score (all ratios guarded / deterministic).
    */
  val textQuality: QueryDef = QueryDef(
    "text_quality",
    s"""WITH w AS (SELECT doc_id, length(text) AS n_chars, string_split(text, ' ') AS words
       |           FROM documents)
       |SELECT doc_id,
       |       len(words) AS n_words,
       |       round(list_reduce(list_transform(words, w -> length(w)), (a, b) -> a + b)
       |             / CAST(len(words) AS DOUBLE), 4) AS avg_word_len,
       |       round(CAST(len(list_filter(words, w -> w IN (${stopwords.map("'" + _ + "'").mkString(",")})))
       |             AS DOUBLE) / len(words), 4) AS stopword_ratio,
       |       round(CAST(n_chars AS DOUBLE) / len(words), 4) AS chars_per_word
       |FROM w WHERE len(words) > 0""".stripMargin) { t =>
    val words = split(col("text"), " ")
    t.documents
      .select(col("doc_id"), length(col("text")).as("n_chars"), words.as("words"))
      .filter(size(col("words")) > 0)
      .select(
        col("doc_id"),
        size(col("words")).as("n_words"),
        round(
          aggregate(transform(col("words"), w => length(w)), lit(0), (a, b) => a + b)
            / size(col("words")).cast("double"), 4).as("avg_word_len"),
        round(
          size(filter(col("words"), w => w.isin(stopwords: _*))).cast("double")
            / size(col("words")), 4).as("stopword_ratio"),
        round(col("n_chars").cast("double") / size(col("words")), 4).as("chars_per_word"))
  }

  private val markers: Seq[(String, Seq[String])] = Seq(
    "fr" -> Seq("le", "les", "et", "est", "un"),
    "es" -> Seq("el", "los", "las", "y", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist"))
  // 'en' is the fallback; cascade order fr > es > de > en, strict wins only.

  /** Language-ID via stopword-marker counting (n-gram heuristic family):
    * score each language by marker hits, deterministic cascade pick.
    */
  val textLangId: QueryDef = QueryDef(
    "text_lang_id", {
      val scores = markers.map { case (l, ws) =>
        s"len(list_filter(words, w -> w IN (${ws.map("'" + _ + "'").mkString(",")}))) AS s_$l"
      }.mkString(",\n       ")
      s"""WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
         |s AS (SELECT doc_id, lang,
         |       len(list_filter(words, w -> w IN ('the','a','of','to','and'))) AS s_en,
         |       $scores
         |FROM w)
         |SELECT doc_id, lang,
         |       CASE WHEN s_fr > s_en AND s_fr > s_es AND s_fr > s_de THEN 'fr'
         |            WHEN s_es > s_en AND s_es > s_de THEN 'es'
         |            WHEN s_de > s_en THEN 'de'
         |            ELSE 'en' END AS predicted_lang
         |FROM s""".stripMargin
    }) { t =>
    val words = split(col("text"), " ")
    def score(ws: Seq[String]): Column =
      size(filter(col("words"), w => w.isin(ws: _*)))
    val scored = t.documents
      .select(col("doc_id"), col("lang"), words.as("words"))
      .select(col("doc_id"), col("lang"),
        score(Seq("the", "a", "of", "to", "and")).as("s_en"),
        score(markers(0)._2).as("s_fr"),
        score(markers(1)._2).as("s_es"),
        score(markers(2)._2).as("s_de"))
    scored.select(col("doc_id"), col("lang"),
      when(col("s_fr") > col("s_en") && col("s_fr") > col("s_es") && col("s_fr") > col("s_de"), "fr")
        .when(col("s_es") > col("s_en") && col("s_es") > col("s_de"), "es")
        .when(col("s_de") > col("s_en"), "de")
        .otherwise("en").as("predicted_lang"))
  }

  /** Document fingerprinting: order-sensitive rolling polynomial hash over
    * word hashes (mod 1e9+7). Reordering words changes the fingerprint;
    * near-identical prefixes don't collide. The fold starts from the first
    * word-hash so Spark's aggregate(init) and DuckDB's init-less
    * list_reduce agree exactly.
    */
  val textFingerprint: QueryDef = QueryDef(
    "text_fingerprint",
    s"""WITH h AS (SELECT doc_id,
       |  list_transform(string_split(text, ' '), w -> ${h64Sql("w")} % 1000000007) AS hs
       |  FROM documents)
       |SELECT doc_id,
       |       list_reduce(hs, (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
       |FROM h WHERE len(hs) > 0""".stripMargin) { t =>
    val hs = transform(split(col("text"), " "), w => h64(w) % 1000000007L)
    t.documents
      .select(col("doc_id"), hs.as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"),
        aggregate(
          slice(col("hs"), lit(2), size(col("hs")) - 1),
          element_at(col("hs"), 1),
          (acc, x) => (acc * 31 + x) % 1000000007L).as("fingerprint"))
  }

  /** Sequence packing: assign documents to fixed token-budget chunks —
    * the corpus-assembly step that batches documents into training
    * context windows. Documents are ordered by doc_id within each lang
    * and cut at a 4096-token running budget: `chunk_id = floor(prefix_sum
    * / budget)` is the streaming bin-packing approximation (a chunk may
    * overflow by at most one document, which the training loader
    * truncates) — the exact first-fit packing is inherently sequential,
    * while this shape is one window per lang partition. At 100 TB:
    * range-partition by (lang, doc_id) so each partition sorts locally;
    * a single dominant language is split by salting the order key into
    * doc_id ranges and offsetting chunk ids per range.
    */
  val textPack: QueryDef = QueryDef(
    "text_pack",
    """WITH tk AS (SELECT doc_id, lang,
      |              len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
      |            FROM documents),
      |c AS (SELECT doc_id, lang, n_tokens,
      |        CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |      FROM tk),
      |p AS (SELECT doc_id, lang, n_tokens, (cum - n_tokens) // 4096 AS chunk_id FROM c)
      |SELECT doc_id, lang, n_tokens, chunk_id,
      |       CAST(row_number() OVER (PARTITION BY lang, chunk_id ORDER BY doc_id)
      |            AS BIGINT) AS chunk_pos
      |FROM p""".stripMargin) { t =>
    import org.apache.spark.sql.expressions.Window
    val cumW = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = t.documents
      .select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(cumW))
      // both engines floor here: operands are non-negative, so DuckDB's
      // flooring // and Spark's truncating div agree
      .withColumn("chunk_id", expr("(cum - n_tokens) div 4096"))
    packed.select(col("doc_id"), col("lang"), col("n_tokens"), col("chunk_id"),
      row_number().over(
        Window.partitionBy(col("lang"), col("chunk_id")).orderBy(col("doc_id")))
        .cast("long").as("chunk_pos"))
  }

  /** Token-budget mixing: keep each source's documents in doc_id order
    * until the source's token budget is spent — the "N tokens per
    * domain" step of assembling a training mix (the quota is on TOKENS,
    * not documents, which is what the loss actually sees). The window
    * partitions by source, so sources fill their budgets in parallel
    * and the greedy prefix is deterministic (doc_id order). Past a
    * single task per source, the 100 TB form is the standard two-pass
    * distributed prefix sum (per-range partial sums, then offsets);
    * the greedy-prefix semantics are unchanged.
    */
  val sampleTokenBudget: QueryDef = QueryDef(
    "sample_token_budget",
    """WITH tk AS (SELECT doc_id, source,
      |              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |            FROM documents),
      |c AS (SELECT doc_id, source, n_tokens,
      |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
      |      FROM tk)
      |SELECT doc_id, source, n_tokens, cum_tokens
      |FROM c WHERE cum_tokens <= 700""".stripMargin) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.documents
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= 700)
  }

  /** Deterministic stratified sampling: per-language Bernoulli keep
    * decision from a salted content-free hash of the doc id — 10% of
    * 'en', 50% of everything else. Hash-based sampling is reproducible
    * across engines and runs (no RNG state), composes with incremental
    * ingestion (a document's keep decision never changes), and is a pure
    * codegen'd filter — no shuffle, prunes at the scan.
    */
  val sampleStratified: QueryDef = QueryDef(
    "sample_stratified",
    s"""SELECT doc_id, lang, source
       |FROM documents
       |WHERE ${h64Sql("concat('smpl|', CAST(doc_id AS VARCHAR))")} % 1000 <
       |      CASE WHEN lang = 'en' THEN 100 ELSE 500 END""".stripMargin) { t =>
    t.documents
      .filter(h64(concat(lit("smpl|"), col("doc_id").cast("string"))) % 1000 <
        when(col("lang") === "en", 100).otherwise(500))
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Vocabulary size for [[textOovRate]]. A deployment sizes this to its
    * tokenizer/LM vocabulary (CCNet's KenLM models carry ~2^16 words);
    * pinned to 24 here because the synthetic corpus draws from ~31
    * distinct words — the cut has to land INSIDE the observed vocabulary
    * for the gate to ever fire at test scale.
    */
  private val OovVocabK = 24

  /** Corpus-vocabulary OOV-rate scoring — the cheap stand-in for
    * LM-perplexity quality filtering (CCNet trains KenLM; the proxy both
    * it and Gopher fall back to is "how much of the document is made of
    * words the corpus itself considers common"). Pass 1 builds the
    * vocabulary: the top-[[OovVocabK]] words by corpus frequency — one
    * hash-shuffle groupBy with map-side partial counts, then a
    * TakeOrderedAndProject over the (already tiny) distinct-word set,
    * tie-broken by word so the cut is deterministic cross-engine. Pass 2
    * scores every document against it: the vocabulary is BROADCAST
    * (fixed K regardless of corpus size — at 100 TB the corpus grows,
    * the vocab does not), so the corpus side never shuffles; the per-doc
    * count is a map-side-combinable agg keyed by doc_id. Flags docs
    * whose OOV share exceeds 20%, integer cross-multiplied so the
    * decision is exact cross-engine.
    */
  val textOovRate: QueryDef = QueryDef(
    "text_oov_rate",
    s"""WITH ws AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |            FROM documents),
       |v AS (SELECT word FROM ws GROUP BY word
       |      ORDER BY count(*) DESC, word LIMIT $OovVocabK)
       |SELECT ws.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |       CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) * 5
       |         > count(*) AS is_high_oov
       |FROM ws LEFT JOIN v ON v.word = ws.word
       |GROUP BY ws.doc_id""".stripMargin) { t =>
    val ws = t.documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val vocab = ws.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(OovVocabK)
      .select(col("word"), lit(true).as("in_vocab"))
    ws.join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_words"), col("n_oov"),
        (col("n_oov") * 5 > col("n_words")).as("is_high_oov"))
  }

  /** Bigram stupid-backoff language-model scoring — the LM-based quality
    * signal (CCNet-style perplexity filtering, Wenzek et al. 2020) with
    * all-integer arithmetic so the oracle compare is exact:
    *
    *   seen bigram:   p = 1e6·c2(w1,w2) / c1(w1)        (scaled MLE)
    *   unseen bigram: p = 0.4·1e6·c1(w2) / N            (backoff)
    *
    * `lm_score` = integer mean of p over a doc's transitions; low score
    * or high `n_unseen` = disfluent/cross-domain text. Scale shape: the
    * corpus-side token stream joins two corpus-level DICTIONARIES
    * (bigram counts keyed (w1,w2), unigram counts keyed word) — hash
    * joins on the dictionary keys, never doc×doc; the train-tier total
    * is a broadcast single row. Dictionary size is O(train vocab),
    * independent of the scored corpus.
    */
  /** The `text_lm_score` oracle SQL — also the scores CTE of
    * `text_lm_buckets`, so the two queries cannot drift apart.
    */
  private[graft] val lmScoreSql: String = {
    val tierIn = LmScoring.TrainTier.map("'" + _ + "'").mkString(", ")
    s"""WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS arr
         |             FROM documents
         |             WHERE len(string_split(text, ' ')) >= 2),
         |train_w AS (SELECT unnest(arr) AS word FROM tok
         |            WHERE source IN ($tierIn)),
         |uni AS (SELECT word, count(*) AS c1 FROM train_w GROUP BY word),
         |tot AS (SELECT count(*) AS n FROM train_w),
         |train_b AS (SELECT p[1] AS w1, p[2] AS w2
         |            FROM (SELECT unnest(list_zip(arr, arr[2:])) AS p FROM tok
         |                  WHERE source IN ($tierIn))
         |            WHERE p[2] IS NOT NULL),
         |big AS (SELECT w1, w2, count(*) AS c2 FROM train_b GROUP BY w1, w2),
         |tr AS (SELECT doc_id, p[1] AS w1, p[2] AS w2
         |       FROM (SELECT doc_id, unnest(list_zip(arr, arr[2:])) AS p FROM tok)
         |       WHERE p[2] IS NOT NULL),
         |sc AS (SELECT tr.doc_id, big.c2,
         |              CASE WHEN big.c2 IS NOT NULL
         |                   THEN 1000000 * big.c2 // u1.c1
         |                   ELSE 400000 * COALESCE(u2.c1, 0) // tot.n END AS p
         |       FROM tr
         |       LEFT JOIN big ON big.w1 = tr.w1 AND big.w2 = tr.w2
         |       LEFT JOIN uni u1 ON u1.word = tr.w1
         |       LEFT JOIN uni u2 ON u2.word = tr.w2
         |       CROSS JOIN tot)
         |SELECT doc_id, count(*) AS n_bigrams,
         |       CAST(sum(CASE WHEN c2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
         |       CAST(sum(p) // count(*) AS BIGINT) AS lm_score
         |FROM sc GROUP BY doc_id""".stripMargin
  }

  /** The Spark side of [[lmScoreSql]] — shared by score and buckets. */
  private def lmScores(t: graft.Tables): org.apache.spark.sql.DataFrame = {
    val tok = LmScoring.tokenize(t.documents)
    val train = LmScoring.trainSlice(tok)
    LmScoring.score(tok,
      LmScoring.unigramCounts(train), LmScoring.bigramCounts(train))
  }

  val textLmScore: QueryDef =
    QueryDef("text_lm_score", lmScoreSql)(lmScores)

  /** The `text_lm_buckets` oracle SQL — also the LM-tail gate CTE of
    * `corpus_curation_e2e` ([[CorpusOps]]), one definition for both.
    */
  private[functions] val lmBucketsSql: String =
    s"""WITH scores AS ($lmScoreSql),
       |hist AS (SELECT lm_score, count(*) AS c FROM scores GROUP BY lm_score),
       |cum AS (SELECT lm_score, sum(c) OVER (ORDER BY lm_score) AS cum FROM hist),
       |tot AS (SELECT sum(c) AS n FROM hist),
       |cuts AS (SELECT min(CASE WHEN cum * 3 >= n THEN lm_score END) AS t1,
       |                min(CASE WHEN cum * 3 >= 2 * n THEN lm_score END) AS t2
       |         FROM cum CROSS JOIN tot)
       |SELECT doc_id, lm_score,
       |       CASE WHEN lm_score < t1 THEN 'tail'
       |            WHEN lm_score < t2 THEN 'middle'
       |            ELSE 'head' END AS bucket
       |FROM scores CROSS JOIN cuts""".stripMargin

  /** The Spark side of [[lmBucketsSql]] — shared with the e2e gate. */
  private[functions] def lmBuckets(t: graft.Tables): org.apache.spark.sql.DataFrame = {
    val scores = lmScores(t)
    val hist = scores.groupBy(col("lm_score")).agg(count(lit(1)).as("c"))
    // single-partition window over the HISTOGRAM only — bounded rows
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("lm_score"))
    val cum = hist.withColumn("cum", sum(col("c")).over(w))
    val tot = hist.agg(sum(col("c")).as("n"))
    val cuts = cum.crossJoin(broadcast(tot))
      .agg(min(when(col("cum") * 3 >= col("n"), col("lm_score"))).as("t1"),
        min(when(col("cum") * 3 >= col("n") * 2, col("lm_score"))).as("t2"))
    scores.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("lm_score"),
        when(col("lm_score") < col("t1"), "tail")
          .when(col("lm_score") < col("t2"), "middle")
          .otherwise("head").as("bucket"))
  }

  /** CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): docs
    * bucketed by LM-score terciles — `tail` is what perplexity
    * filtering drops. The cuts are EXACT without any global sort of
    * the corpus: scores are bounded integers (0..1e6), so the tercile
    * thresholds come from a cumulative window over the score HISTOGRAM
    * — O(distinct scores) rows, independent of corpus size — and docs
    * with equal scores always share a bucket (no row_number over the
    * corpus, which would drag N rows onto one task).
    */
  val textLmBuckets: QueryDef =
    QueryDef("text_lm_buckets", lmBucketsSql)(lmBuckets)

  /** Temperature-scaled multilingual sampling (the α-sampling of
    * multilingual LM training, α = 1/2): the kept corpus follows
    * p(lang) ∝ √n(lang), flattening the head language's dominance
    * without discarding it. Each language keeps docs at rate
    * √(n_min/n_lang) — the rarest language survives whole, every
    * larger one is hash-downsampled by its √-excess. All integer:
    * isq = ⌊√(n·10⁶)⌋ (exact in IEEE double for n·10⁶ < 2⁵², which
    * holds through the gate scales; at larger n swap in an exact
    * integer Newton √ over the SAME tiny per-language table), the
    * per-million threshold is an integer division of two isq values,
    * and the keep decision is a salted content-free hash — so the
    * sample is reproducible across engines, runs, and incremental
    * ingestion (a doc's fate never changes as the corpus grows only
    * if rates are pinned per release, which is how deployments run
    * it). Scale shape: the per-language count is a map-side-combined
    * agg to ≤|langs| rows, the threshold table BROADCASTS, and the
    * corpus side is a pure codegen'd filter — no corpus shuffle.
    */
  val sampleTemperature: QueryDef = QueryDef(
    "sample_temperature",
    s"""WITH n AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
       |isq AS (SELECT lang, n_lang,
       |          CAST(floor(sqrt(CAST(n_lang AS DOUBLE) * 1000000)) AS BIGINT) AS isq
       |        FROM n),
       |th AS (SELECT lang, n_lang,
       |         (1000000 * (SELECT min(isq) FROM isq)) // isq AS keep_th
       |       FROM isq)
       |SELECT d.doc_id, d.lang, d.source,
       |       COALESCE(th.keep_th, 1000000) AS keep_th
       |FROM documents d LEFT JOIN th ON th.lang = d.lang
       |WHERE ${h64Sql("concat('temp|', CAST(d.doc_id AS VARCHAR))")} % 1000000
       |      < COALESCE(th.keep_th, 1000000)""".stripMargin) { t =>
    // ONE shared threshold/gate definition with the streamed twin
    // (TemperatureIngest): counts here come from an in-query groupBy
    val n = t.documents.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    TemperatureSampling.gate(t.documents, TemperatureSampling.thresholds(n))
  }

  /** Discriminative quality classifier (the GPT-3/LLaMA "trusted-vs-web"
    * filter, Brown et al. 2020 App. A) in integer-exact form: every
    * word carries the ppm-scaled likelihood ratio of appearing in the
    * trusted tier vs the whole corpus,
    *
    *   r(w) = 10⁶ · c_trusted(w)·N_all / (c_all(w)·N_trusted)
    *
    * and a document scores the integer mean of its words' ratios —
    * above 10⁶ means "reads more like the curated tier than the
    * average document". Complementary to [[textLmScore]]: the LM
    * grades FLUENCY (bigram transitions), this grades VOCABULARY
    * affinity (unigram discrimination); CCNet-style pipelines run
    * both. Scale shape identical to the LM: the word stream
    * hash-joins one corpus-level dictionary keyed by word (O(vocab),
    * never doc×doc); the two totals ride along as a broadcast single
    * row. The dictionary is a pair of additive counts, so the
    * streamed-partials maintenance story of the LM dictionaries
    * (graft.streaming.LmIngest) applies unchanged.
    */
  /** The `text_classifier_score` oracle SQL — also the low-quality gate
    * CTE of `corpus_curation_e2e` ([[CorpusOps]]), one definition for
    * both.
    */
  private[functions] val classifierScoreSql: String = {
    val tierIn = LmScoring.TrainTier.map("'" + _ + "'").mkString(", ")
    s"""WITH ws AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
       |            FROM documents),
       |dict AS (SELECT word, count(*) AS c_all,
       |                sum(CASE WHEN source IN ($tierIn) THEN 1 ELSE 0 END) AS c_tr
       |         FROM ws GROUP BY word),
       |tot AS (SELECT sum(c_all) AS n_all, sum(c_tr) AS n_tr FROM dict)
       |SELECT ws.doc_id, count(*) AS n_words,
       |       CAST(count(dict.word) AS BIGINT) AS n_scored,
       |       CAST(CASE WHEN count(dict.word) > 0 THEN
       |         sum(CAST((1000000::HUGEINT * dict.c_tr * tot.n_all)
       |                  // (dict.c_all::HUGEINT * tot.n_tr) AS BIGINT))
       |           // count(dict.word) END AS BIGINT) AS classifier_score,
       |       CASE WHEN count(dict.word) > 0 THEN
       |         sum(CAST((1000000::HUGEINT * dict.c_tr * tot.n_all)
       |                  // (dict.c_all::HUGEINT * tot.n_tr) AS BIGINT))
       |           // count(dict.word) > 1000000 END AS is_high_quality
       |FROM ws LEFT JOIN dict ON dict.word = ws.word CROSS JOIN tot
       |GROUP BY ws.doc_id""".stripMargin
  }

  /** The Spark side of [[classifierScoreSql]] — shared with the e2e
    * gate (and, through [[ClassifierScoring]], with the streamed twin).
    */
  private[functions] def classifierScores(t: graft.Tables): org.apache.spark.sql.DataFrame =
    ClassifierScoring.score(t.documents, ClassifierScoring.dictionary(t.documents))

  val textClassifierScore: QueryDef = QueryDef(
    "text_classifier_score", classifierScoreSql)(classifierScores)

  val all: Seq[QueryDef] =
    Seq(textTokens, textQuality, textLangId, textFingerprint, textPack,
      sampleStratified, sampleTokenBudget, sampleTemperature,
      textOovRate, textLmScore, textLmBuckets, textClassifierScore)
}

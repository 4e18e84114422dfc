package graft.functions

import graft.QueryDef
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import SharedHash.{h64, h64Sql}

/** Corpus-preparation operators a large-scale training-data pipeline
  * runs after dedup: repetition-based quality filtering (the Gopher
  * family of filters — Rae et al. 2021, §A1.1), benchmark
  * decontamination (n-gram overlap against an eval set), and
  * deterministic train/validation/test assignment with a sharded
  * training shuffle.
  *
  * All ratios are expressed as exact integer comparisons (numerator ×
  * scale vs denominator) instead of rounded doubles — cross-engine
  * `round(x, 4)` diverges on exact half-ties (Spark HALF_UPs the
  * decimal string, DuckDB rounds the double), so the oracle-safe form
  * keeps counts and derives flags with integer cross-multiplication.
  */
object CorpusOps {

  /** Hashed 5-grams as a generator column over a split-words array —
    * ONE definition shared by the stage queries ([[textDecontam]]) and
    * the composed pipeline ([[corpusCurationE2e]]), so the e2e row
    * provably runs the same gram construction as the stages it
    * composes.
    */
  private def fiveGramHashes(ws: Column): Column =
    explode(transform(sequence(lit(1), size(ws) - 4),
      i => h64(array_join(slice(ws, i, lit(5)), " "))))

  /** Per-document repetition statistics as ONE codegen'd expression:
    * `struct(top_bigram_count, n_bigrams)`. The bigram mode count is a
    * strictly per-document quantity, so it never needs the corpus-wide
    * explode → histogram shuffle the obvious formulation uses (and the
    * oracle SQL still states): sort the doc's bigram array and take the
    * longest equal RUN — identical to the max multiplicity, because
    * sorting makes equal grams adjacent. One `array_sort` + one
    * `aggregate` fold per row, all inside the scan's codegen stage —
    * the 100 TB shape is a pure map with ZERO shuffled bytes, where the
    * histogram form shuffled one row per corpus bigram (≈ the token
    * count of the corpus) through two hash aggregations. Shared by
    * [[textRepetition]] and [[corpusCurationE2e]]'s Gopher gate, which
    * therefore also drops its per-document stats join.
    */
  private def topRunCount(ws: Column): Column = {
    // bigrams as concatenated strings — measured FASTER than sorting
    // struct(w1, w2) pairs (array_sort's struct comparator is
    // interpreted, the UTF8String comparator is not), and equality is
    // identical because split-words carry no spaces
    val bg = array_sort(transform(sequence(lit(1), size(ws) - 1),
      i => concat(element_at(ws, i), lit(" "), element_at(ws, i + 1))))
    val fold = aggregate(
      bg,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc("prev").isNotNull && x === acc("prev"),
          acc("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    // structural guard, not a caller contract: on a 1-word document
    // sequence(1, 0) generates DESCENDING [1, 0] and the transform
    // would index element_at(ws, 0) — a runtime error. CaseWhen
    // evaluates branches conditionally, so short documents never reach
    // the fold regardless of how a call site orders its conjuncts.
    when(size(ws) >= 2, fold).otherwise(lit(0L))
  }

  private[functions] def repStats(ws: Column): Column =
    struct(topRunCount(ws).as("top_bigram_count"),
      size(ws).cast("long").minus(1L).as("n_bigrams"))

  /** The Gopher gate as ONE boolean expression referencing the fold
    * exactly once — a Filter condition gets expressions INLINED through
    * project boundaries by predicate pushdown and FilterExec does no
    * subexpression elimination, so a two-field struct reference there
    * would evaluate the whole sort+fold twice per row.
    */
  private[functions] def repGateOk(ws: Column): Column =
    topRunCount(ws) * 5 <= size(ws).cast("long") - 1L

  /** Repetition metrics per document: word-level bigram mode count and
    * distinct-word count, with a Gopher-style "top 2-gram fraction >
    * 20%" rejection flag. The oracle states the textbook explode →
    * per-(doc, gram) histogram → per-doc max; the Spark side computes
    * the same numbers per-row via [[repStats]] (sorted-run = mode
    * multiplicity), so the operator is a single scan-projection with no
    * shuffle at any corpus size.
    */
  val textRepetition: QueryDef = QueryDef(
    "text_repetition",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |           WHERE len(string_split(text, ' ')) >= 2),
      |g AS (SELECT doc_id,
      |             unnest(list_transform(range(1, len(ws)),
      |               i -> ws[i] || ' ' || ws[i + 1])) AS gram
      |      FROM w),
      |c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram),
      |s AS (SELECT doc_id, max(cnt) AS top_bigram_count,
      |             CAST(sum(cnt) AS BIGINT) AS n_bigrams
      |      FROM c GROUP BY doc_id)
      |SELECT w.doc_id,
      |       CAST(len(ws) AS BIGINT) AS n_words,
      |       CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
      |       s.n_bigrams,
      |       s.top_bigram_count,
      |       s.top_bigram_count * 5 > s.n_bigrams AS is_repetitive
      |FROM w JOIN s ON s.doc_id = w.doc_id""".stripMargin) { t =>
    t.documents
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct_words"),
        repStats(col("ws")).as("s"))
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
        col("s.n_bigrams").as("n_bigrams"),
        col("s.top_bigram_count").as("top_bigram_count"),
        (col("s.top_bigram_count") * 5 > col("s.n_bigrams"))
          .as("is_repetitive"))
  }

  /** Benchmark decontamination: flag corpus documents sharing any 5-word
    * gram with the "benchmark" set (here: `doc_id % 97 = 0`, standing in
    * for an eval suite). Grams are 60-bit hashes, never strings, so the
    * probe side is fixed-width; the benchmark gram set is broadcast —
    * eval suites are megabytes against a corpus of terabytes, so the
    * contamination check must never shuffle the corpus. Output keeps
    * every non-benchmark document with its matching-gram count, the
    * decision input for drop-vs-keep.
    */
  val textDecontam: QueryDef = QueryDef(
    "text_decontam",
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |g AS (SELECT doc_id,
       |             unnest(list_transform(range(1, len(ws) - 3),
       |               i -> ${h64Sql("array_to_string(ws[i:i+4], ' ')")})) AS gh
       |      FROM w),
       |b AS (SELECT DISTINCT gh FROM g WHERE doc_id % 97 = 0),
       |h AS (SELECT g.doc_id, count(DISTINCT g.gh) AS n_hits
       |      FROM g JOIN b ON b.gh = g.gh
       |      WHERE g.doc_id % 97 <> 0
       |      GROUP BY g.doc_id)
       |SELECT d.doc_id,
       |       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_contaminated_grams,
       |       coalesce(h.n_hits, 0) > 0 AS is_contaminated
       |FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id
       |WHERE d.doc_id % 97 <> 0""".stripMargin) { t =>
    val g = t.documents
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(col("doc_id"), fiveGramHashes(col("ws")).as("gh"))
    val bench = g.filter(col("doc_id") % 97 === 0).select("gh").distinct()
    val hits = g.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), Seq("gh"))
      .groupBy(col("doc_id")).agg(countDistinct(col("gh")).as("n_hits"))
    t.documents.filter(col("doc_id") % 97 =!= 0).select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_contaminated_grams"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("is_contaminated"))
  }

  /** Deterministic train/validation/test assignment (80/10/10 by salted
    * id hash — a document's split never changes as the corpus grows) plus
    * the training shuffle: order by a second independent hash WITHIN one
    * of 8 hash shards. Sharding is what makes the shuffle scale — each
    * (split, shard) window sorts independently, so there is no global
    * single-partition sort; the training loader interleaves shards to
    * recover a full shuffle. At 100 TB the shard count rises to
    * O(corpus/executor-memory) — the shape is unchanged.
    */
  val textTrainSplit: QueryDef = QueryDef(
    "text_train_split",
    s"""WITH a AS (SELECT doc_id,
       |                  ${h64Sql("'split|' || CAST(doc_id AS VARCHAR)")} % 100 AS sb,
       |                  ${h64Sql("'shuf|' || CAST(doc_id AS VARCHAR)")} AS sh
       |           FROM documents),
       |s AS (SELECT doc_id,
       |             CASE WHEN sb < 80 THEN 'train'
       |                  WHEN sb < 90 THEN 'validation'
       |                  ELSE 'test' END AS split,
       |             sh % 8 AS shard, sh
       |      FROM a)
       |SELECT doc_id, split, CAST(shard AS BIGINT) AS shard,
       |       CAST(row_number() OVER (PARTITION BY split, shard
       |                               ORDER BY sh, doc_id) AS BIGINT) AS shard_pos
       |FROM s""".stripMargin) { t =>
    val sb = h64(concat(lit("split|"), col("doc_id").cast("string"))) % 100
    val sh = h64(concat(lit("shuf|"), col("doc_id").cast("string")))
    t.documents
      .select(col("doc_id"),
        when(sb < 80, "train").when(sb < 90, "validation")
          .otherwise("test").as("split"),
        (sh % 8).as("shard"), sh.as("sh"))
      .select(col("doc_id"), col("split"), col("shard"),
        row_number().over(
          Window.partitionBy(col("split"), col("shard"))
            .orderBy(col("sh"), col("doc_id")))
          .cast("long").as("shard_pos"))
  }

  /** Classifier gate for the composed pipeline: docs scoring this far
    * below the 10⁶ neutral point read markedly more web-like than the
    * trusted tier. A deployment tunes this against labeled data; the
    * pinned value fires at every gate scale on the synthetic corpus
    * (73 / 74 / 2 docs at sf0.001 / 0.01 / 0.1) without emptying it.
    */
  private val ClfGateCut = 990000L

  private val BloomM = 1L << 20 // bloom bits — 16384 packed words, 128 KB
  private val BloomK = 4        // hash functions per shingle

  /** Per-hash-function multipliers/offsets for the bloom positions —
    * classic full-period LCG multipliers, all < 2^31 so every modular
    * product below stays under 2^62 in a signed 64-bit value in either
    * engine (DuckDB ERRORS on BIGINT overflow rather than wrapping).
    */
  private val BloomA = Seq(1103515245L, 766245317L, 69621L, 48271L)
  private val BloomB = Seq(12345L, 1013904223L, 0L, 11L)
  private val BloomC = Seq(2027107999L, 1181783497L, 630360016L, 397204094L)
  private val BloomP = 2147483647L // 2^31 - 1, Mersenne prime

  /** Position j of a shingle hash in the bloom bit space — a
    * Kirsch-Mitzenmacher-style double hash over TWO independent
    * residues of the 60-bit gram hash (low: gh mod P, high: gh >> 31),
    * combined affinely mod a Mersenne prime. Deliberately NOT a fresh
    * salted md5 per position: k new digests per corpus gram made the
    * bloom probe 2× the cost of the exact broadcast form it exists to
    * beat; integer ops keep the probe a cheap codegen'd map. Two
    * residues matter: positions affine in ONE residue would make any
    * gram pair colliding mod P collide on ALL k bloom bits — a
    * precision floor no m/k sizing could reduce; with independent
    * (A_j, C_j) coefficients an all-bits collision needs both residues
    * equal (~2^-60). Identical formula both engines; every
    * intermediate < 2^62.
    */
  private def bloomPos(j: Int): Column =
    pmod(
      pmod(pmod(col("gh"), lit(BloomP)) * lit(BloomA(j)), lit(BloomP)) +
        pmod(shiftright(col("gh"), 31) * lit(BloomC(j)), lit(BloomP)) +
        lit(BloomB(j)),
      lit(BloomP)) % BloomM

  private def bloomPosSql(j: Int): String =
    s"(((gh % $BloomP) * ${BloomA(j)} % $BloomP + (gh >> 31) * ${BloomC(j)} % $BloomP + ${BloomB(j)}) % $BloomP) % $BloomM"

  /** Bloom-filter decontamination — the scale twin of [[textDecontam]].
    * The exact form broadcasts the eval set's distinct gram hashes,
    * which grows with the eval suite; this form folds them into a
    * FIXED-size bloom filter ([[BloomM]] bits = 128 KB packed into
    * 64-bit words, [[BloomK]] salted positions per gram), so the
    * broadcast is constant no matter how many benchmarks land in the
    * eval set. The corpus side stays a pure map — each shingle probes
    * a DENSE 16384-long array constant with k O(1) codegen'd lookups,
    * and the only corpus shuffle is the final per-document count. Error is
    * one-sided: a bloom can only over-flag (false positives), which for
    * decontamination means dropping a clean document, never keeping a
    * contaminated one. The oracle encodes the bloom's position-set
    * semantics exactly (a bit is set iff some eval gram hashes to it),
    * so the check is bit-faithful rather than relying on a measured
    * zero-FP corpus; CorpusOpsSpec measures the actual FP count against
    * the exact form.
    */
  val textDecontamBloom: QueryDef = QueryDef(
    "decontam_bloom",
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |g AS (SELECT doc_id,
       |             unnest(list_transform(range(1, len(ws) - 3),
       |               i -> ${h64Sql("array_to_string(ws[i:i+4], ' ')")})) AS gh
       |      FROM w),
       |ev AS (SELECT DISTINCT gh FROM g WHERE doc_id % 97 = 0),
       |pos AS (SELECT DISTINCT unnest([${(0 until BloomK).map(bloomPosSql).mkString(", ")}]) AS p
       |        FROM ev),
       |cg AS (SELECT DISTINCT doc_id, gh FROM g WHERE doc_id % 97 <> 0),
       |cp AS (SELECT doc_id, gh,
       |              ${(0 until BloomK).map(j => s"${bloomPosSql(j)} AS p$j").mkString(", ")}
       |       FROM cg),
       |hit AS (SELECT doc_id, count(*) AS n_hit_grams FROM cp
       |        WHERE ${(0 until BloomK).map(j => s"p$j IN (SELECT p FROM pos)").mkString(" AND ")}
       |        GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CAST(coalesce(h.n_hit_grams, 0) AS BIGINT) AS n_hit_grams,
       |       coalesce(h.n_hit_grams, 0) > 0 AS is_flagged
       |FROM documents d LEFT JOIN hit h ON h.doc_id = d.doc_id
       |WHERE d.doc_id % 97 <> 0""".stripMargin) { t =>
    val g = t.documents
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("ws")) - 4),
          i => h64(array_join(slice(col("ws"), i, lit(5)), " ")))).as("gh"))
    // pack set positions into a DENSE BloomM/64-long array — the size
    // is a layout CONSTANT (128 KB) regardless of eval-set size, so the
    // bounded collect here is the codebook pattern, not a corpus
    // collect. Dense beats the previous one-row map: Catalyst's
    // GetMapValue is a LINEAR scan of the map's entries, which made
    // every probe O(set words) — ~16k comparisons × k probes × every
    // corpus gram; element_at on an array is O(1). Measured 23% faster
    // at sf0.1 (isolated same-window A/B: 7.4/6.2 s → 5.7/4.8 s).
    // Eagerness note: the collect runs the eval-slice gram job at
    // DataFrame-CONSTRUCTION time — the same trade the ANN codebook
    // collects already make; the lazy alternative (a one-row broadcast
    // carrying the packed words) is exactly the map probe this replaced.
    val nWords = (BloomM / 64).toInt
    val dense = new Array[Long](nWords)
    g.filter(col("doc_id") % 97 === 0)
      .select(explode(array((0 until BloomK).map(bloomPos): _*)).as("p"))
      .select(floor(col("p") / 64).cast("int").as("w"),
        expr("shiftleft(1L, cast(p % 64 as int))").as("b"))
      .groupBy(col("w")).agg(bit_or(col("b")).as("bits"))
      .collect()
      .foreach(r => dense(r.getAs[Int]("w")) = r.getAs[Long]("bits"))
    val bloom = lit(dense)
    // probe BEFORE any dedup: the bloom test is a pure map, so running
    // it on raw gram occurrences keeps the whole probe inside one
    // codegen stage, and the per-doc distinct moves into the aggregate
    // over HIT grams only — the shuffle carries the (rare) hits, not
    // every (doc, gram) pair in the corpus
    val cg = g.filter(col("doc_id") % 97 =!= 0)
    val withPos = cg.select(
      col("doc_id") +: col("gh") +:
        (0 until BloomK).map(j => bloomPos(j).as(s"p$j")): _*)
    val hitCol = (0 until BloomK).map { j =>
      element_at(bloom, floor(col(s"p$j") / 64).cast("int") + 1)
        .bitwiseAND(expr(s"shiftleft(1L, cast(p$j % 64 as int))")) =!= lit(0L)
    }.reduce(_ && _)
    val hits = withPos
      .filter(hitCol)
      .select(col("doc_id"), col("gh")).distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit_grams"))
    t.documents.filter(col("doc_id") % 97 =!= 0).select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        (coalesce(col("n_hit_grams"), lit(0L)) > 0).as("is_flagged"))
  }

  /** The curation pipeline COMPOSED as one plan — what a training-data
    * user actually runs, not the stages in isolation: length gate →
    * Gopher repetition gate → benchmark decontamination (broadcast gram
    * hashes) → CCNet LM-tail gate (bottom score tercile dropped, one
    * shared definition with `text_lm_buckets`) → discriminative
    * classifier gate (strongly web-flavored docs dropped, one shared
    * definition with `text_classifier_score`) → cross-source keep-best
    * dedup → per-(source, lang) corpus accounting. One documents scan
    * feeds the word/gram derivations; the Gopher gate is a per-row
    * [[repStats]] filter (no histogram shuffle, no stats join), so the
    * corpus-wide shuffles are only the LM and classifier dictionary
    * joins (O(vocab) build sides), the keep-best hash `groupBy`, and
    * the final rollup — the
    * benchmark side stays broadcast, so composing the stages adds NO
    * join of corpus against corpus. All-integer output (doc/token/char
    * counts), so the cross-engine compare is exact. A wrong gate order,
    * a dedup that sees pre-filter rows, or a contamination check
    * applied after dedup all change the counts and fail the hash.
    */
  val corpusCurationE2e: QueryDef = QueryDef(
    "corpus_curation_e2e",
    s"""WITH w AS (SELECT doc_id, text, lang, source, string_split(text, ' ') AS ws
       |           FROM documents),
       |rep AS (SELECT doc_id, max(cnt) AS topc, CAST(sum(cnt) AS BIGINT) AS nb
       |        FROM (SELECT doc_id, gram, count(*) AS cnt
       |              FROM (SELECT doc_id,
       |                           unnest(list_transform(range(1, len(ws)),
       |                             i -> ws[i] || ' ' || ws[i + 1])) AS gram
       |                    FROM w WHERE len(ws) >= 2) g
       |              GROUP BY doc_id, gram) c
       |        GROUP BY doc_id),
       |g AS (SELECT doc_id,
       |             unnest(list_transform(range(1, len(ws) - 3),
       |               i -> ${h64Sql("array_to_string(ws[i:i+4], ' ')")})) AS gh
       |      FROM w),
       |b AS (SELECT DISTINCT gh FROM g WHERE doc_id % 97 = 0),
       |contaminated AS (SELECT DISTINCT g.doc_id
       |                 FROM g JOIN b ON b.gh = g.gh WHERE g.doc_id % 97 <> 0),
       |lmtail AS (SELECT doc_id FROM (${TextOps.lmBucketsSql})
       |           WHERE bucket = 'tail'),
       |clflow AS (SELECT doc_id FROM (${TextOps.classifierScoreSql})
       |           WHERE classifier_score < $ClfGateCut),
       |eligible AS (
       |  SELECT w.* FROM w
       |  JOIN rep ON rep.doc_id = w.doc_id
       |  LEFT JOIN contaminated c ON c.doc_id = w.doc_id
       |  LEFT JOIN lmtail lt ON lt.doc_id = w.doc_id
       |  LEFT JOIN clflow cf ON cf.doc_id = w.doc_id
       |  WHERE len(w.ws) >= 50
       |    AND rep.topc * 5 <= rep.nb
       |    AND w.doc_id % 97 <> 0
       |    AND c.doc_id IS NULL
       |    AND lt.doc_id IS NULL
       |    AND cf.doc_id IS NULL),
       |kept AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY md5(text)
       |                ORDER BY CAST(substr(source, 4) AS BIGINT), doc_id) AS rn
       |    FROM eligible)
       |  WHERE rn = 1)
       |SELECT source, lang,
       |       count(*) AS n_docs,
       |       CAST(sum(len(ws)) AS BIGINT) AS n_tokens,
       |       CAST(sum(length(text)) AS BIGINT) AS n_chars
       |FROM kept GROUP BY 1, 2""".stripMargin) { t =>
    val w = t.documents
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        split(col("text"), " ").as("ws"))
    // Gopher gate: top bigram must account for <= 1/5 of all bigrams —
    // a per-row repStats filter (see repStats: sorted-run = mode
    // multiplicity), so the composed plan carries NO bigram histogram
    // shuffle and NO per-document stats join; the oracle's rep CTE
    // still states the histogram form. The length-50 gate subsumes the
    // histogram join's implicit >= 2-words requirement.
    // contamination: any 5-gram hash shared with the benchmark slice
    val g = w.filter(size(col("ws")) >= 5)
      .select(col("doc_id"), fiveGramHashes(col("ws")).as("gh"))
    val bench = g.filter(col("doc_id") % 97 === 0).select("gh").distinct()
    val contaminated = g.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), Seq("gh")).select("doc_id").distinct()
    // CCNet LM-tail gate: the bottom score tercile (computed over the
    // whole corpus, one shared definition with text_lm_buckets) is
    // dropped before keep-best dedup, like the other gates
    val lmTail = TextOps.lmBuckets(t)
      .filter(col("bucket") === "tail").select("doc_id")
    // discriminative-classifier gate (the GPT-3 pipeline's second
    // quality signal, stacked with the LM tercile the way modern
    // curation stacks filters): docs scoring far below the neutral
    // point are dropped; one shared definition with
    // text_classifier_score, and another O(vocab) dictionary join —
    // still no corpus-vs-corpus join anywhere in the composed plan
    val clfLow = TextOps.classifierScores(t)
      .filter(col("classifier_score") < ClfGateCut).select("doc_id")
    val eligible = w
      .join(contaminated, Seq("doc_id"), "left_anti")
      .join(lmTail, Seq("doc_id"), "left_anti")
      .join(clfLow, Seq("doc_id"), "left_anti")
      .filter(size(col("ws")) >= 50 &&
        repGateOk(col("ws")) &&
        col("doc_id") % 97 =!= 0)
    // cross-source keep-best over the eligible set (filter THEN dedup);
    // same keep-rule ordering as dedup_keep_best, by construction
    val ord = DedupOps.srcRankOrd
    val kept = eligible
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min_by(struct(col("source"), col("lang"), col("ws"), col("text")), ord)
        .as("win"))
      .select(col("win.source").as("source"), col("win.lang").as("lang"),
        col("win.ws").as("ws"), col("win.text").as("text"))
    kept.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("ws"))).cast("long").as("n_tokens"),
        sum(length(col("text"))).cast("long").as("n_chars"))
  }

  val all: Seq[QueryDef] =
    Seq(textRepetition, textDecontam, textDecontamBloom, textTrainSplit,
      corpusCurationE2e)
}

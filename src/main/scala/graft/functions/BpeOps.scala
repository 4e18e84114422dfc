package graft.functions

import graft.QueryDef
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer training over the corpus — the byte-pair-encoding
  * merge loop (Sennrich et al. 2016) every LLM data pipeline runs to
  * fit its tokenizer.
  *
  * The scale decomposition is the whole design: the CORPUS-sized job is
  * only the word-frequency count (one map-side-combined `groupBy` —
  * the same shape as `topk_terms`); the merge loop then runs over the
  * O(distinct words) frequency dictionary, never touching the corpus
  * again. Each round is: weighted adjacent-pair count over the vocab
  * (a few aggregate rows), a 1-row argmax collect (constant, like the
  * `kmeans_refine` centroid collect), and a leftmost-greedy merge
  * applied as a codegen'd fold over each word's symbol array — no UDF,
  * no corpus rescan, rounds ∝ target vocab size.
  *
  * `bpe_pair_counts` is the oracle-checked single step (exactly as
  * `kmeans_refine` oracle-checks one Lloyd step); [[train]] is the
  * iterated trainer, pinned against a reference implementation by
  * BpeSpec.
  */
object BpeOps {

  /** `(word, freq)` — the corpus-sized job, everything after is O(vocab). */
  private[functions] def wordFreq(docs: DataFrame): DataFrame = docs
    .select(explode(split(col("text"), " ")).as("word"))
    .filter(length(col("word")) > 0)
    .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Adjacent symbol pairs of the column named `colName` (an
    * array<string>), one row per position — overlapping occurrences
    * each count ("aaa" yields (a,a) twice), which both engines compute
    * identically. Takes the NAME, not a Column: the expression is
    * built as SQL text, where a qualified/derived Column's rendering
    * would not parse back.
    */
  private def pairsOf(colName: String): Column =
    expr(s"transform(sequence(1, size($colName) - 1), " +
      s"i -> struct(element_at($colName, i) AS a, element_at($colName, i + 1) AS b))")

  /** Weighted pair counts over a `(syms, freq)` vocabulary. */
  private[functions] def pairCounts(vocab: DataFrame): DataFrame = vocab
    .filter(size(col("syms")) >= 2)
    .select(col("freq"), explode(pairsOf("syms")).as("p"))
    .groupBy(col("p.a").as("a"), col("p.b").as("b"))
    .agg(sum(col("freq")).as("cnt"))

  /** Character symbols of a word column — Spark's regex split can emit
    * a trailing empty string where DuckDB's `string_split(w, '')` never
    * does, so empties are filtered on this side to keep the two
    * engines' symbol sequences identical.
    */
  private[functions] def charSyms(word: Column): Column =
    filter(split(word, ""), x => x =!= "")

  /** The first BPE merge step, oracle-checked: character-level symbol
    * sequences per distinct word, pair counts weighted by word
    * frequency, top-20 by (count desc, pair asc). The single-partition
    * ranking window only ever sees the 20 survivors of a
    * TakeOrderedAndProject — the aggregate itself carries O(distinct
    * pairs) rows, bounded by the symbol alphabet squared.
    */
  val bpePairCounts: QueryDef = QueryDef(
    "bpe_pair_counts",
    """WITH wf AS (SELECT word, count(*) AS freq
      |            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |            WHERE length(word) > 0 GROUP BY word),
      |cs AS (SELECT string_split(word, '') AS syms, freq FROM wf),
      |pc AS (SELECT p[1] AS a, p[2] AS b, CAST(sum(freq) AS BIGINT) AS cnt
      |       FROM (SELECT unnest(list_transform(range(1, len(syms)),
      |                      i -> [syms[i], syms[i + 1]])) AS p, freq
      |             FROM cs WHERE len(syms) >= 2)
      |       GROUP BY 1, 2)
      |SELECT a, b, cnt,
      |       row_number() OVER (ORDER BY cnt DESC, a, b) AS rank
      |FROM pc ORDER BY cnt DESC, a, b LIMIT 20""".stripMargin) { t =>
    val vocab = wordFreq(t.documents)
      .select(charSyms(col("word")).as("syms"), col("freq"))
    import org.apache.spark.sql.expressions.Window
    pairCounts(vocab)
      .orderBy(col("cnt").desc, col("a"), col("b")).limit(20)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("a"), col("b"))))
      .select(col("a"), col("b"), col("cnt"), col("rank"))
  }

  /** Apply one merge (a, b) → "ab" leftmost-greedily to a symbol
    * array, as a pure codegen'd fold: "aaa" under (a,a) becomes
    * ["aa", "a"], exactly the reference algorithm's scan order.
    */
  private[functions] def mergeExpr(a: String, b: String): Column = {
    def q(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    expr(
      s"""aggregate(syms, cast(array() as array<string>), (acc, x) ->
         |  CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '${q(a)}' AND x = '${q(b)}'
         |       THEN concat(slice(acc, 1, size(acc) - 1), array('${q(a)}${q(b)}'))
         |       ELSE concat(acc, array(x)) END)""".stripMargin)
  }

  /** The production trainer: ONE corpus-sized Spark job (the word-
    * frequency aggregate, map-side combined), one bounded collect of
    * the O(distinct words) dictionary, then the whole merge loop runs
    * DRIVER-LOCAL with indexed incremental pair counts — train(50k)
    * issues 2 Spark jobs total, not 50k (the round-8 design note,
    * graduated). Ties break (count desc, pair asc) exactly like the
    * per-round argmax of [[trainDistributed]], which BpeSpec pins
    * merge-for-merge identical.
    *
    * Scale shape: the collect is the trainer's working set — the same
    * dictionary every BPE implementation must hold somewhere. At 100 TB
    * corpus scale set `minFreq` ≥ 2 to prune the long singleton tail
    * (URLs, typos) before it ships to the driver; the merge loop itself
    * is O(rounds × affected-words) because each merge re-counts ONLY
    * the words containing the merged pair (a pair→word-id index), never
    * the full vocabulary.
    *
    * Returns the learned merges in order plus the final
    * `(word, syms, freq)` vocabulary as a DataFrame (rebuilt from the
    * driver-local result — bounded, same size as the collect).
    */
  def train(docs: DataFrame, n: Int, minFreq: Long = 1L): (Seq[(String, String)], DataFrame) = {
    val spark = docs.sparkSession
    val words = wordFreq(docs)
      .filter(col("freq") >= minFreq)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val (merges, vocab) = trainLocal(words, n)
    import spark.implicits._
    val vocabDf = vocab.toSeq.toDF("word", "syms", "freq")
    (merges, vocabDf)
  }

  /** Driver-side leftmost-greedy merge — the JVM twin of [[mergeExpr]].
    * Iterative: a recursive cons-chain would overflow the driver stack
    * on a single pathologically long unbroken token (the data-URI /
    * minified-blob long tail real web corpora carry).
    */
  private def localMerge(s: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var rest = s
    while (rest.nonEmpty) rest match {
      case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
      case x :: tail                          => out += x; rest = tail
      case Nil                                => ()
    }
    out.toList
  }

  /** Spark's string ordering is UTF8String BINARY order (unsigned
    * UTF-8 bytes), which differs from Java's UTF-16 `compareTo` for
    * supplementary-plane code points (a surrogate pair's 0xD8xx units
    * sort BELOW U+E000.. in UTF-16 but its UTF-8 bytes sort above) —
    * the driver-local argmax must break count ties exactly like the
    * distributed `orderBy`. UTF-8 byte order equals CODE-POINT order,
    * so the comparison steps code points in place — no per-call byte
    * array in what is the argmax hot loop (called O(distinct pairs)
    * times per merge round).
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    a.length - i < b.length - j
  }

  /** Code-point symbol split — the driver-side twin of [[charSyms]]
    * (surrogate-pair safe, like Spark's codepoint-stepping empty-regex
    * split; a code-UNIT split would cut astral chars into lone
    * surrogates that no longer survive a UTF-8 parquet round trip).
    */
  private[functions] def localSyms(w: String): List[String] =
    w.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp)))

  /** Driver-local BPE merge loop over a collected `(word, freq)`
    * dictionary (Sennrich et al. 2016, the indexed variant): maintain
    * global pair counts plus a pair→word-id index; each round takes the
    * argmax pair ((cnt desc, a, b) — same total order as the
    * distributed argmax and BpeSpec's reference) and re-counts only the
    * indexed words. Exposed for the spec's job-count pin.
    */
  private[functions] def trainLocal(
      words: Array[(String, Long)], n: Int): (Seq[(String, String)], Array[(String, List[String], Long)]) = {
    import scala.collection.mutable
    val syms = words.map { case (w, _) => localSyms(w) }
    val freq = words.map(_._2)
    val counts = mutable.Map.empty[(String, String), Long]
    val index = mutable.Map.empty[(String, String), mutable.Set[Int]]

    def addWord(i: Int, sign: Long): Unit = {
      val s = syms(i)
      if (s.size >= 2) s.zip(s.tail).foreach { p =>
        val c = counts.getOrElse(p, 0L) + sign * freq(i)
        if (c == 0L) { counts.remove(p); index.get(p).foreach(_.remove(i)) }
        else {
          counts(p) = c
          if (sign > 0) index.getOrElseUpdate(p, mutable.Set.empty) += i
        }
      }
    }
    syms.indices.foreach(addWord(_, 1L))

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (merges.size < n && continue) {
      // argmax scan over the live pair map — O(distinct pairs), the
      // same bound as one distributed pair-count aggregate's result
      val live = counts.iterator.filter(_._2 > 0L)
      if (!live.hasNext) continue = false
      else {
        // argmax with ties broken (count desc, a asc, b asc) under
        // UTF-8 byte order — the same total order as the distributed
        // orderBy (see utf8Lt)
        val (pair @ (a, b), _) = live.reduceLeft { (best, cand) =>
          val ((ba, bb), bc) = best
          val ((ca, cb), cc) = cand
          val candWins = cc > bc ||
            (cc == bc && (utf8Lt(ca, ba) ||
              (ca == ba && utf8Lt(cb, bb))))
          if (candWins) cand else best
        }
        merges += pair
        // re-count ONLY the words that contain the merged pair
        val affected = index.getOrElse(pair, mutable.Set.empty).toArray
        affected.foreach { i =>
          addWord(i, -1L)
          syms(i) = localMerge(syms(i), a, b)
          addWord(i, 1L)
        }
        counts.remove(pair); index.remove(pair)
      }
    }
    (merges.toSeq, words.indices.map(i => (words(i)._1, syms(i), freq(i))).toArray)
  }

  /** The original all-on-cluster loop — one O(vocab) pair-count
    * aggregate + 1-row argmax collect + fold-merge projection PER
    * ROUND (`localCheckpoint` truncating lineage every few rounds).
    * Kept as the cross-check twin: BpeSpec pins [[train]] ==
    * [[trainDistributed]] merge-for-merge and symbol-for-symbol. Use
    * [[train]] — round-per-job does not survive a 50k-merge vocabulary.
    */
  private[functions] def trainDistributed(docs: DataFrame, n: Int): (Seq[(String, String)], DataFrame) = {
    var vocab = wordFreq(docs)
      .select(col("word"), charSyms(col("word")).as("syms"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    var round = 0
    while (round < n && continue) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) continue = false
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        vocab = vocab.withColumn("syms", mergeExpr(a, b))
        if ((round + 1) % 4 == 0) vocab = vocab.localCheckpoint()
        round += 1
      }
    }
    (merges.toSeq, vocab)
  }

  /** Apply a trained merge list to a document set: per-word symbol
    * split, then the merges folded IN TRAINING ORDER — each merge is
    * one codegen'd array fold, so the whole encoder is a pure map over
    * the corpus with the merge list baked into the plan (the broadcast
    * is the expression tree itself — no join, no shuffle, no UDF).
    * Returns `(doc_id, n_words, n_tokens)` plus the tokens per doc;
    * compression = n_tokens / n_chars is the quality signal trainers
    * track. Plan depth grows with the merge count — fine for the
    * hundreds-of-merges regime this targets; a production tokenizer
    * with 50k merges would swap the fold chain for one generated
    * expression, same shape.
    */
  def encode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    // posexplode keeps the word position: collect_list gives no order
    // guarantee after a shuffle, so the token stream is reassembled by
    // an explicit sort on the in-doc position
    val words = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
      .withColumn("syms", charSyms(col("word")))
    val encoded = merges.foldLeft(words) { case (df, (a, b)) =>
      df.withColumn("syms", mergeExpr(a, b))
    }
    encoded
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("syms"))).as("n_tokens"),
        flatten(expr("transform(sort_array(collect_list(struct(pos, syms))), s -> s.syms)"))
          .as("tokens"))
  }

  /** The production encoder: a WORD→TOKENS dictionary computed
    * driver-local over the corpus's distinct words (the same bounded
    * collect the trainer pays — and the memoization every real BPE
    * tokenizer keeps), broadcast-joined back to the word stream. Plan
    * depth is O(1) at ANY merge count, where [[encode]]'s fold chain
    * nests one `aggregate` expression per merge — fine at hundreds,
    * codegen-hostile at a production 50k. Same output contract as
    * [[encode]] (BpeSpec pins them token-identical); `minFreq`-style
    * pruning is deliberately absent — an unseen word must still encode,
    * so the dictionary covers every distinct word of the TARGET corpus,
    * not the training one.
    */
  def encodeViaDictionary(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mergeList = merges.toList
    def encodeWord(w: String): List[String] =
      mergeList.foldLeft(localSyms(w)) { case (s, (a, b)) => localMerge(s, a, b) }
    val dict = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .distinct().collect().map(r => r.getString(0))
      .map(w => (w, encodeWord(w))).toSeq.toDF("word", "toks")
    docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
      .join(broadcast(dict), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("toks"))).as("n_tokens"),
        flatten(expr("transform(sort_array(collect_list(struct(pos, toks))), s -> s.toks)"))
          .as("tokens"))
  }

  val all: Seq[QueryDef] = Seq(bpePairCounts)
}

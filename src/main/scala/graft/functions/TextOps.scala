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

  val all: Seq[QueryDef] = Seq(textTokens, textQuality, textLangId, textFingerprint)
}

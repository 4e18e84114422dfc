package graft.functions

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The iterated BPE trainer against a from-first-principles reference
  * implementation: the learned merge sequence and the final vocabulary
  * must match exactly (ties broken (count desc, pair asc) on both
  * sides), and merged symbols must always concatenate back to their
  * word. The oracle row `bpe_pair_counts` pins the single-step counts
  * cross-engine; this spec pins the loop.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  // ---- reference implementation (independent of the Spark code) ----

  private def refMerge(syms: List[String], a: String, b: String): List[String] =
    syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: refMerge(rest, a, b)
      case x :: rest                          => x :: refMerge(rest, a, b)
      case Nil                                => Nil
    }

  private def refTrain(words: Map[String, Long], n: Int): (Seq[(String, String)], Map[String, List[String]]) = {
    var vocab: Map[String, (List[String], Long)] =
      words.map { case (w, f) => w -> (w.toList.map(_.toString), f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (merges.size < n && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (syms, f)) <- vocab; Seq(a, b) <- syms.sliding(2).toSeq if syms.size >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + f
      if (counts.isEmpty) continue = false
      else {
        val ((a, b), _) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((a, b))
        vocab = vocab.map { case (w, (syms, f)) => w -> (refMerge(syms, a, b), f) }
      }
    }
    (merges.toSeq, vocab.map { case (w, (syms, _)) => w -> syms })
  }

  // ---- specs ----

  test("trainer matches the reference merge-for-merge and symbol-for-symbol") {
    import spark.implicits._
    val docs = Seq(
      "low lower lowest low low",
      "new newer newest new wide wider",
      "low newer low wide").toDF("text")
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val (refMerges, refVocab) = refTrain(words, 12)
    val (gotMerges, gotVocabDf) = BpeOps.train(docs, 12)
    assert(gotMerges == refMerges,
      s"merge sequences diverge:\n got $gotMerges\n ref $refMerges")
    val gotVocab = gotVocabDf.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(gotVocab == refVocab,
      s"vocabularies diverge: ${gotVocab.toSeq.diff(refVocab.toSeq).take(3)}")
  }

  test("trainer matches the reference on random small-alphabet corpora") {
    // a 4-letter alphabet makes pair-count TIES the common case, so the
    // (count desc, a, b) total order is stressed on every round; seeds
    // fixed — failures reproduce exactly
    import spark.implicits._
    for (seed <- Seq(11L, 12L, 13L)) {
      val rnd = new scala.util.Random(seed)
      def word() = (1 to 1 + rnd.nextInt(6))
        .map(_ => "abcd"(rnd.nextInt(4))).mkString
      val docs = (1 to 20)
        .map(_ => (1 to 3 + rnd.nextInt(10)).map(_ => word()).mkString(" "))
        .toDF("text")
      val words = docs.select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val (refMerges, refVocab) = refTrain(words, 25)
      val (gotMerges, gotVocabDf) = BpeOps.train(docs, 25)
      assert(gotMerges == refMerges, s"seed=$seed merge sequences diverge")
      val gotVocab = gotVocabDf.select("word", "syms").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      assert(gotVocab == refVocab, s"seed=$seed vocabularies diverge")
    }
  }

  test("driver-local trainer matches the distributed twin merge-for-merge") {
    import spark.implicits._
    val docs = Seq(
      "low lower lowest low low",
      "new newer newest new wide wider",
      "low newer low wide").toDF("text")
    val (localMerges, localVocabDf) = BpeOps.train(docs, 15)
    val (distMerges, distVocabDf) = BpeOps.trainDistributed(docs, 15)
    assert(localMerges == distMerges,
      s"merge sequences diverge:\n local $localMerges\n dist  $distMerges")
    def vocabOf(df: org.apache.spark.sql.DataFrame) =
      df.select("word", "syms").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(vocabOf(localVocabDf) == vocabOf(distVocabDf))
  }

  test("tie-breaking matches Spark's UTF-8 binary order on astral symbols") {
    import spark.implicits._
    // U+1F600 (astral, UTF-16 lead surrogate 0xD83D) vs U+E000 (BMP
    // private use): Java's UTF-16 compareTo orders the emoji FIRST
    // while UTF-8 bytes order U+E000 first — an equal-count tie on the
    // two pairs forces the argmax down exactly that divergence
    val docs = Seq("😀a", "a").toDF("text")
    val (localM, _) = BpeOps.train(docs, 1)
    val (distM, _) = BpeOps.trainDistributed(docs, 1)
    assert(localM == distM,
      s"driver-local tie order diverged from the distributed orderBy: $localM vs $distM")
  }

  test("train issues a bounded job count regardless of merge count") {
    import spark.implicits._
    val docs = Seq(
      "aa bb aa cc dd ee aa bb cc",
      "ff gg hh ff gg aa bb").toDF("text").localCheckpoint()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (merges, _) = BpeOps.train(docs, 50)
      // listener delivery is async — poll until the count is stable
      var prev = -1
      var stable = 0
      var iters = 0
      while (stable < 3 && iters < 50) {
        Thread.sleep(100)
        val c = jobs.get()
        if (c == prev) stable += 1 else { stable = 0; prev = c }
        iters += 1
      }
      assert(merges.nonEmpty)
      // one word-frequency collect — NOT one job per merge round (the
      // round-per-job shape would be 50+ here)
      assert(jobs.get() <= 4, s"train(50) ran ${jobs.get()} Spark jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("merged symbols always concatenate back to the word") {
    val t = Tables(spark, sf)
    val (_, vocab) = BpeOps.train(t.documents, 8)
    val broken = vocab
      .filter(concat_ws("", col("syms")) =!= col("word")).count()
    assert(broken == 0, s"$broken words no longer reconstruct from their symbols")
  }

  test("encoding applies merges in training order and preserves the word stream") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new wide wider")).toDF("doc_id", "text")
    val (merges, _) = BpeOps.train(docs, 10)
    val enc = BpeOps.encode(docs, merges).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getSeq[String](3).toList)).toMap

    // reference: tokenize each word with the same merges, same order
    def refEncode(w: String): List[String] =
      merges.foldLeft(w.toList.map(_.toString)) { case (s, (a, b)) => refMerge(s, a, b) }
    for ((id, text) <- Seq(1L -> "low lower lowest low low",
                           2L -> "new newer newest new wide wider")) {
      val words = text.split(" ").toList
      val refTokens = words.flatMap(refEncode)
      val (nWords, nTokens, tokens) = enc(id)
      assert(nWords == words.size)
      assert(tokens == refTokens, s"doc $id: $tokens vs $refTokens")
      assert(nTokens == refTokens.size.toLong)
      // tokens concatenate back to the original character stream
      assert(tokens.mkString == words.mkString)
    }
  }

  test("dictionary encoder is token-identical to the fold-chain encoder") {
    val t = Tables(spark, sf)
    val docs = t.documents.select(col("doc_id"), col("text"))
    val (merges, _) = BpeOps.train(docs, 12)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getSeq[String](3).toList))).toMap
    val fold = rows(BpeOps.encode(docs, merges))
    val dict = rows(BpeOps.encodeViaDictionary(docs, merges))
    assert(dict == fold,
      s"encoders diverge on ${dict.keySet.union(fold.keySet).count(k => dict.get(k) != fold.get(k))} docs")
  }

  test("overlapping pairs count with multiplicity and rank 1 is the max") {
    val rows = BpeOps.bpePairCounts.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val cnts = rows.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (x, y) => x >= y },
      "top-20 must be count-descending")
    assert(rows.head.get(3).toString == "1")
  }
}

package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Property-style randomized check of the exact-substring family: for
  * random corpora drawn from a deliberately tiny alphabet (so window
  * collisions are dense) the distributed report and cut must equal a
  * sequential brute-force reference computed in plain Scala — span
  * merging, within-doc repeats, keep-first ordering, md5 of the rebuilt
  * text, everything. Seeds are fixed — failures reproduce exactly.
  */
class SubstringPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def randomDocs(seed: Long, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val alphabet = Seq("a", "b", "c", "d")
    (1 to n).map { i =>
      val len = 1 + rnd.nextInt(14)
      (i.toLong, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }
  }

  /** Brute-force span report: per doc (n_words, n_dup_spans,
    * n_dup_windows, dup_words, flag).
    */
  private def refSpans(docs: Seq[(Long, String)], w: Int): Map[Long, (Long, Long, Long, Long, Boolean)] = {
    val occ = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val wins = docs.map { case (id, text) =>
      val ws = text.split(' ')
      val ps = (0 to ws.length - w).map(i => (i + 1, ws.slice(i, i + w).mkString(" ")))
      ps.foreach { case (_, k) => occ(k) += 1 }
      id -> (ws.length.toLong, ps)
    }.toMap
    wins.map { case (id, (nw, ps)) =>
      val dup = ps.collect { case (p, k) if occ(k) >= 2 => p.toLong }
      var islands = List.empty[(Long, Long)]
      var prevMax = Option.empty[Long]
      for (p <- dup) {
        if (prevMax.forall(m => p > m + (w - 1))) islands ::= (p, p)
        else islands = (islands.head._1, math.max(islands.head._2, p)) :: islands.tail
        prevMax = Some(prevMax.fold(p)(math.max(_, p)))
      }
      val dw = islands.map { case (a, b) => b - a + w }.sum
      id -> (nw, islands.size.toLong, dup.size.toLong, dw, dw * 5 > nw)
    }
  }

  /** Brute-force keep-first cut: per doc (n_words, n_words_kept,
    * cut_text_hash, is_modified).
    */
  private def refCut(docs: Seq[(Long, String)], w: Int): Map[Long, (Long, Long, String, Boolean)] = {
    val first = scala.collection.mutable.Map[String, (Long, Long)]()
    val all = docs.sortBy(_._1).map { case (id, text) =>
      val ws = text.split(' ')
      val ps = (0 to ws.length - w).map(i => (i + 1L, ws.slice(i, i + w).mkString(" ")))
      ps.foreach { case (p, k) => if (!first.contains(k)) first(k) = (id, p) }
      (id, ws, ps)
    }
    all.map { case (id, ws, ps) =>
      val cut = ps.collect { case (p, k) if first(k) != ((id, p)) =>
        (p until p + w).toSet
      }.foldLeft(Set.empty[Long])(_ ++ _)
      val kept = ws.zipWithIndex.collect { case (word, i) if !cut(i + 1L) => word }
      (id, (ws.length.toLong, kept.length.toLong, md5Hex(kept.mkString(" ")),
        kept.length < ws.length))
    }.toMap
  }

  test("random corpora: distributed span report == sequential reference") {
    import spark.implicits._
    for (seed <- Seq(7L, 23L, 91L); w <- Seq(2, 3)) {
      val docs = randomDocs(seed, 40)
      val got = DedupOps.substringDupSpans(docs.toDF("doc_id", "text"), w)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
        .toMap
      val want = refSpans(docs, w)
      assert(got == want, s"seed=$seed w=$w: " +
        s"diff=${(got.toSet diff want.toSet).take(3)} / ${(want.toSet diff got.toSet).take(3)}")
      assert(want.values.exists(_._3 > 0), s"seed=$seed w=$w produced no dups — vacuous")
    }
  }

  test("random corpora: distributed keep-first cut == sequential reference") {
    import spark.implicits._
    for (seed <- Seq(7L, 23L, 91L); w <- Seq(2, 3)) {
      val docs = randomDocs(seed, 40)
      val got = DedupOps.substringDupCut(docs.toDF("doc_id", "text"), w)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getBoolean(4)))
        .toMap
      val want = refCut(docs, w)
      assert(got == want, s"seed=$seed w=$w: " +
        s"diff=${(got.toSet diff want.toSet).take(3)} / ${(want.toSet diff got.toSet).take(3)}")
      assert(want.values.exists(_._4), s"seed=$seed w=$w cut nothing — vacuous")
    }
  }
}

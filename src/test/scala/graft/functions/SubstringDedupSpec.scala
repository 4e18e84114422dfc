package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Span semantics of [[DedupOps.substringDupSpans]] on shapes the oracle
  * data doesn't isolate: overlapping duplicated windows merging into one
  * maximal span, WITHIN-document repeats (a phrase repeated inside one
  * doc is a duplicate even with no partner doc), non-overlapping repeats
  * staying separate islands, and documents shorter than the window.
  */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(docs: Seq[(Long, String)], w: Int): Map[Long, (Long, Long, Long, Long, Boolean)] = {
    import spark.implicits._
    DedupOps.substringDupSpans(docs.toDF("doc_id", "text"), w)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
  }

  test("a shared 4-word run with w=3 merges its two windows into one span") {
    val out = run(Seq(
      1L -> "x1 x2 x3 x4 z1",
      2L -> "y0 x1 x2 x3 x4",
      3L -> "u1 u2 u3 u4 u5"), w = 3)
    // both docs: 2 duplicated windows (x1x2x3, x2x3x4) -> 1 island of 4 words
    assert(out(1L) == ((5L, 1L, 2L, 4L, true)))
    assert(out(2L) == ((5L, 1L, 2L, 4L, true)))
    // unique doc: zero everything, still emitted
    assert(out(3L) == ((5L, 0L, 0L, 0L, false)))
  }

  test("a phrase repeated within ONE document is a duplicate with two islands") {
    val out = run(Seq(10L -> "a b c q1 q2 a b c"), w = 3)
    // "a b c" at pos 1 and pos 6: 6 > 1 + (w-1) so the islands stay apart
    assert(out(10L) == ((8L, 2L, 2L, 6L, true)))
  }

  test("windows separated by less than w words fuse into one island") {
    // duplicated windows at pos 1 and pos 3 (gap 2 < w): one island of
    // max(3)-min(1)+w = 5 covered words
    val out = run(Seq(
      20L -> "p1 p2 p3 m1 p4 p5 p6 t1 t2 t3 t4 t5",
      21L -> "p1 p2 p3 z9 z8 z7 p3 m1 p4 w0 w1 w2"), w = 3)
    val (n, spans, wins, dup, _) = out(20L)
    assert(n == 12L && spans == 1L && wins == 2L && dup == 5L)
  }

  private def runCut(docs: Seq[(Long, String)], w: Int): Map[Long, (Long, Long, String, Boolean)] = {
    import spark.implicits._
    DedupOps.substringDupCut(docs.toDF("doc_id", "text"), w)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getBoolean(4)))
      .toMap
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("cut keeps the corpus-wide first occurrence and removes the rest") {
    val out = runCut(Seq(
      1L -> "x1 x2 x3 z1 z2",  // first occurrence of x1x2x3: kept whole
      2L -> "y0 x1 x2 x3 y1",  // second occurrence: words 2-4 cut
      3L -> "u1 u2 u3"), w = 3)
    assert(out(1L) == ((5L, 5L, md5Hex("x1 x2 x3 z1 z2"), false)))
    assert(out(2L) == ((5L, 2L, md5Hex("y0 y1"), true)))
    assert(out(3L) == ((3L, 3L, md5Hex("u1 u2 u3"), false)))
  }

  test("within-doc repeat keeps the first copy; an exact dup doc is cut to empty") {
    val out = runCut(Seq(
      10L -> "a b c t1 a b c",   // internal repeat at pos 5: cut 5-7
      20L -> "m1 m2 m3 m4",      // exact duplicate pair: doc 20 keeps,
      21L -> "m1 m2 m3 m4"), w = 3) //                    doc 21 fully cut
    assert(out(10L) == ((7L, 4L, md5Hex("a b c t1"), true)))
    assert(out(20L) == ((4L, 4L, md5Hex("m1 m2 m3 m4"), false)))
    assert(out(21L) == ((4L, 0L, md5Hex(""), true)))
  }

  test("documents shorter than the window emit zero counts, not nothing") {
    val out = run(Seq(30L -> "s1 s2", 31L -> "s1 s2 s3 s1 s2 s3"), w = 3)
    assert(out(30L) == ((2L, 0L, 0L, 0L, false)))
    // 6-word doc repeating its own 3-word half: windows at pos 1 and 4
    // share content but abut without overlap (4 > 1 + w - 1), so they
    // stay two islands that together cover the whole doc
    assert(out(31L) == ((6L, 2L, 2L, 6L, true)))
  }
}

package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantic-dedup (SemDeDup) invariants the oracle's cell-by-cell hash
  * can't articulate: the keep/drop decision must be exactly "dropped iff
  * a lower-id vector in the same cell has cosine ≥ τ", with `dup_of`
  * the minimum such neighbor. Verified against an independent in-test
  * recomputation of every within-cell cosine at sf0.001 (500 vectors —
  * 125k pairs, trivial on the driver; the operator itself never does
  * this all-pairs pass).
  */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val Tau = 0.4

  private lazy val out =
    DedupOps.dedupSemantic.run(spark, sf).collect().map { r =>
      (r.getLong(r.fieldIndex("vec_id")), r.getLong(r.fieldIndex("cell")),
        r.getBoolean(r.fieldIndex("is_kept")),
        if (r.isNullAt(r.fieldIndex("dup_of"))) None
        else Some(r.getLong(r.fieldIndex("dup_of"))))
    }

  private lazy val embs: Map[Long, Array[Double]] =
    spark.read.parquet(s"$sf/embeddings.parquet").collect().map { r =>
      r.getLong(r.fieldIndex("vec_id")) ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
    }.toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("every vector appears exactly once and dup_of is a lower id in the same cell") {
    assert(out.length == embs.size)
    assert(out.map(_._1).distinct.length == out.length)
    val cellOf = out.map(r => r._1 -> r._2).toMap
    for ((id, cell, kept, dupOf) <- out) {
      assert(kept == dupOf.isEmpty, s"vec $id: is_kept must mirror dup_of nullity")
      for (d <- dupOf) {
        assert(d < id, s"vec $id: dup_of $d must be a lower id")
        assert(cellOf(d) == cell, s"vec $id: dup_of $d must share cell $cell")
      }
    }
  }

  test("dropped iff some lower-id same-cell neighbor has cosine >= tau; dup_of is the min one") {
    val byCell = out.groupBy(_._2)
    for ((_, members) <- byCell; (id, _, kept, dupOf) <- members) {
      val lowerNbrs = members.filter(_._1 < id)
        .map(_._1).filter(o => cos(embs(o), embs(id)) >= Tau).sorted
      if (kept) assert(lowerNbrs.isEmpty,
        s"vec $id kept but has near neighbors $lowerNbrs")
      else assert(dupOf.contains(lowerNbrs.head),
        s"vec $id: dup_of ${dupOf} != min near neighbor ${lowerNbrs.headOption}")
    }
  }

  test("the dedup is effective on this corpus: some vectors drop, most survive") {
    val dropped = out.count(!_._3)
    assert(dropped > 0, "corpus has near-duplicate vectors; none dropped")
    assert(dropped < out.length / 2, "more than half dropped — tau miscalibrated")
  }
}

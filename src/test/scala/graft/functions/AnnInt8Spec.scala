package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Int8-domain search quality: the quantized ranking must stay close to
  * the float-32 brute force it approximates — recall is the whole
  * question for a 4× memory trade, and nothing in the oracle row
  * measures it (the oracle checks the int8 computation itself).
  */
class AnnInt8Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")), r.getLong(r.fieldIndex("vec_id"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("int8 top-k recall@5 vs the float brute force") {
    val exact = topSets(AnnOps.annBruteTopk.run(spark, sf))
    val int8 = topSets(AnnOps.annInt8Topk.run(spark, sf))
    assert(int8.keySet == exact.keySet)
    val recalls = exact.map { case (q, ex) => int8(q).intersect(ex).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@5 = $mean%.2f (per query: ${recalls.map(r => f"$r%.1f").mkString(", ")})")
    assert(mean >= 0.6, f"int8 quantization lost too much ranking signal: recall $mean%.2f")
  }

  test("quantized cosine tracks float cosine on the returned pairs") {
    val f = AnnOps.annBruteTopk.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val bad = AnnOps.annInt8Topk.run(spark, sf).collect().flatMap { r =>
      f.get((r.getLong(0), r.getLong(2))).map(fv => (r.getDouble(3), fv))
    }.filter { case (qv, fv) => math.abs(qv - fv) > 0.05 }
    assert(bad.isEmpty, s"quantized cosine drifted >0.05 from float: ${bad.take(3).toSeq}")
  }
}

package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the multiset semantics of the k-bounded top-k buffer (ADVICE
  * r9 #1: the original TreeSet buffer silently collapsed rows that
  * compared equal, so a caller whose priority is not injective per row
  * would lose items). Every physical input row must occupy a slot.
  */
class TopKPriorityAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def topk(df: DataFrame, k: Int): Seq[(Long, Int, Double)] = {
    val item = struct(col("doc_id"), col("w"), col("priority"))
    val agg = GraftSqlBridge.column(
      TopKPriorityAgg(GraftSqlBridge.expression(item), k)
        .toAggregateExpression())
    df.agg(agg.as("top"))
      .select(explode(col("top")).as("e"))
      .select($"e.doc_id", $"e.w", $"e.priority")
      .as[(Long, Int, Double)].collect().toSeq
  }

  test("physically identical rows each keep a top-k slot") {
    val df = Seq.fill(5)((7L, 3, 2.0)).toDF("doc_id", "w", "priority")
    val out = topk(df, 3)
    assert(out == Seq.fill(3)((7L, 3, 2.0)),
      s"5 identical rows through k=3 must yield 3 copies, got $out")
  }

  test("rows equal on (priority, doc_id) but differing in w are distinct items") {
    val df = Seq((7L, 1, 2.0), (7L, 2, 2.0)).toDF("doc_id", "w", "priority")
    assert(topk(df, 10).toSet == Set((7L, 1, 2.0), (7L, 2, 2.0)))
  }

  test("eviction keeps the k highest priorities in rank order") {
    val df = (1L to 100L).map(i => (i, 1, i.toDouble))
      .toDF("doc_id", "w", "priority")
    val out = topk(df.repartition(8), 4)
    assert(out == Seq((100L, 1, 100.0), (99L, 1, 99.0), (98L, 1, 98.0), (97L, 1, 97.0)))
  }

  test("multiplicity survives the partial/merge shuffle (serialize round-trip)") {
    // 8 partitions force partial buffers + a final merge through the
    // serialized form; the duplicate counts must survive both
    val dup = Seq.fill(6)((1L, 1, 9.0)) ++ (2L to 40L).map(i => (i, 1, i.toDouble / 100))
    val out = topk(dup.toDF("doc_id", "w", "priority").repartition(8), 6)
    assert(out == Seq.fill(6)((1L, 1, 9.0)), s"got $out")
  }
}

package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components semantics on shapes the oracle data doesn't
  * guarantee to exercise: long chains (worst case for plain label
  * propagation — pointer doubling must converge in O(log n) rounds,
  * bounded by the loop's round cap), multiple components, and
  * singletons-by-absence.
  */
class DedupClusterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    DedupOps.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a 40-vertex chain collapses to its minimum id within the round cap") {
    // chain 1-2-3-…-40: diameter 39 ≫ the 30-round cap, so this only
    // converges if pointer doubling actually halves label paths
    val chain = (1L until 40L).map(i => (i, i + 1))
    val labels = cc(chain)
    assert(labels.size == 40)
    assert(labels.values.forall(_ == 1L), s"all labels must be 1, got ${labels.values.toSet}")
  }

  test("disjoint components keep distinct minimum labels") {
    val labels = cc(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 32L), (30L, 32L)))
    assert(labels(10L) == 10L && labels(11L) == 10L && labels(12L) == 10L)
    assert(labels(20L) == 20L && labels(21L) == 20L)
    assert(labels(30L) == 30L && labels(31L) == 30L && labels(32L) == 30L)
  }
}

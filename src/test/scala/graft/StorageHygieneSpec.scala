package graft

import org.scalatest.funsuite.AnyFunSuite

/** The s11 bounded-footprint contract: per-call unique catalog names
  * (no cross-run clobber), with each call dropping the PREVIOUS call's
  * table pair and scratch dir — so a long-lived JVM (bench + verify +
  * suites) never accumulates more than one pair.
  */
class StorageHygieneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("s11 keeps at most one catalog pair and drops the previous call's") {
    def s11Tables: Set[String] = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_b_")).toSet

    SparkEntry.queries("s11_bucketed_join")(spark, sf).collect()
    val afterFirst = s11Tables
    assert(afterFirst.size == 2,
      s"expected exactly the current pair after a call, got $afterFirst")

    SparkEntry.queries("s11_bucketed_join")(spark, sf).collect()
    val afterSecond = s11Tables
    assert(afterSecond.size == 2,
      s"expected exactly the current pair after a repeat call, got $afterSecond")
    assert(afterFirst.intersect(afterSecond).isEmpty,
      s"previous call's pair survived: ${afterFirst.intersect(afterSecond)}")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The s11 bounded-footprint contract after the ADVICE r9 #3 race fix:
  * per-call unique catalog names (no cross-run clobber), LAGGED
  * reclamation — a prior call's tables survive until they are s11Lag
  * generations stale, so a frame held across later calls (or built by a
  * concurrent suite) is never yanked mid-read — and a hard bound of
  * s11Lag live pairs per JVM.
  */
class StorageHygieneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def s11Tables: Set[String] = spark.catalog.listTables().collect()
    .map(_.name).filter(_.startsWith("graft_b_")).toSet

  test("a prior call's frame stays consumable across a subsequent call") {
    val df1 = SparkEntry.queries("s11_bucketed_join")(spark, sf)
    val n1 = df1.count()
    SparkEntry.queries("s11_bucketed_join")(spark, sf).collect()
    // the old single-slot cleanup dropped call 1's tables HERE — this
    // re-read is exactly the concurrent-caller race, made deterministic
    assert(df1.count() == n1,
      "call 1's bucketed tables were reclaimed while its frame was still live")
  }

  test("footprint stays bounded: at most s11Lag live pairs after many calls") {
    for (_ <- 1 to 6)
      SparkEntry.queries("s11_bucketed_join")(spark, sf).collect()
    assert(graft.operators.StorageOps.s11LiveCount <= 4,
      s"lagged reclamation is not draining: ${graft.operators.StorageOps.s11LiveCount} live")
    val live = s11Tables
    assert(live.size <= 8, s"expected <= 4 pairs in the catalog, got $live")
  }
}

package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pins the staging-dir reclamation protocol (ADVICE r9 #2): every twin
  * row's staging dir is registered with the ONE JVM-exit reclaimer —
  * not one shutdown hook per invocation — so a long bench/suite JVM
  * neither leaks hook threads nor loses track of a dir.
  */
class StageHygieneSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  test("a twin-row run registers its staging dir with the shared reclaimer") {
    val before = IngestOracleOps.stagedDirCount
    graft.SparkEntry.queries("temp_ingest_sample")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(IngestOracleOps.stagedDirCount == before + 1,
      "the staging dir must be queued for the single JVM-exit reclaimer")
  }
}

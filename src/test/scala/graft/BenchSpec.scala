package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-artifact safety rules (ADVICE r10: a CWD-relative
  * silently-overwriting write lost full per-query records twice):
  * the committed artifact resolves against the repo root, and a slower
  * (throttled-window) run must never replace the clean record.
  */
class BenchSpec extends AnyFunSuite {

  private def rec(qs: (String, Double)*): String = recAt("x", qs: _*)

  private def recAt(sf: String, qs: (String, Double)*): String = {
    val body = qs.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    s"""{"metric":"total","value":1,"unit":"sec","queries":{$body},"sf":"$sf","failed":[]}"""
  }

  test("repoRoot walks up to the dir holding build.sbt") {
    val root = Files.createTempDirectory("benchspec_root")
    val nested = Files.createDirectories(root.resolve("a/b/c"))
    Files.createFile(root.resolve("build.sbt"))
    try assert(Bench.repoRoot(nested) == root.toAbsolutePath.normalize())
    finally FsUtil.deleteRecursively(root)
  }

  test("repoRoot falls back to the start dir when no build.sbt exists above") {
    // /tmp has no build.sbt on this host; a bare dir must resolve to itself
    val dir = Files.createTempDirectory("benchspec_bare")
    try assert(Bench.repoRoot(dir) == dir.toAbsolutePath.normalize())
    finally FsUtil.deleteRecursively(dir)
  }

  test("a different-harness run never promotes, even when 'faster'") {
    def at(harness: String, qs: (String, Double)*): String = {
      val body = qs.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      s"""{"metric":"total","value":1,"unit":"sec","harness":"$harness","queries":{$body},"sf":"x","failed":[]}"""
    }
    val old = at("noop-sink", "q1" -> 10.0)
    // count() is trivially faster (the tail gets pruned) — not comparable
    assert(!Bench.shouldPromote(at("count", "q1" -> 1.0), Some(old)))
    assert(Bench.shouldPromote(at("noop-sink", "q1" -> 1.0), Some(old)))
  }

  test("comparable-or-faster run promotes; >1.1x slower run does not") {
    val old = rec("q1" -> 10.0, "q2" -> 10.0)
    assert(Bench.shouldPromote(rec("q1" -> 9.0, "q2" -> 9.0), Some(old)))
    assert(Bench.shouldPromote(rec("q1" -> 11.0, "q2" -> 10.9), Some(old)))
    assert(!Bench.shouldPromote(rec("q1" -> 15.0, "q2" -> 15.0), Some(old)),
      "a 1.5x (throttled-window) run must not clobber the clean artifact")
  }

  test("the promote comparison uses only the SHARED queries") {
    // new run added a heavy query — its time must not count against it
    val old = rec("q1" -> 10.0)
    assert(Bench.shouldPromote(rec("q1" -> 10.0, "q_new" -> 100.0), Some(old)))
  }

  test("a run that does not COVER the committed query set never promotes") {
    // a SPARK_GRAFT_ONLY-narrowed run is trivially fast on its subset —
    // promoting it would replace the full per-query record with a
    // fragment (the round-8 truncation loss, self-inflicted)
    val old = rec("q1" -> 10.0, "q2" -> 10.0)
    assert(!Bench.shouldPromote(rec("q1" -> 0.1), Some(old)),
      "a subset run must never clobber the full committed record")
    assert(!Bench.shouldPromote(rec("q1" -> 20.0), Some(old)))
  }

  test("a run at a DIFFERENT scale factor never promotes") {
    // the trap that motivated this guard: an sf0.001 dev-loop run is
    // trivially faster per query than the committed sf0.1 record
    val old = recAt("/root/testdata/sf0.1", "q1" -> 10.0)
    assert(!Bench.shouldPromote(recAt("/root/testdata/sf0.001", "q1" -> 0.5), Some(old)))
    assert(Bench.shouldPromote(recAt("/root/testdata/sf0.1", "q1" -> 9.0), Some(old)))
  }

  test("missing or corrupt prior artifact always promotes") {
    assert(Bench.shouldPromote(rec("q1" -> 1.0), None))
    assert(Bench.shouldPromote(rec("q1" -> 1.0), Some("not json {{{")))
    assert(Bench.shouldPromote(rec("q1" -> 1.0), Some("""{"metric":"total"}""")))
  }

  test("queryTimes round-trips the bench JSON shape") {
    val t = Bench.queryTimes(rec("a" -> 1.5, "b" -> 2.25))
    assert(t.contains(Map("a" -> 1.5, "b" -> 2.25)))
    assert(Bench.queryTimes("garbage").isEmpty)
  }
}

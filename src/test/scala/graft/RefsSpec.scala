package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Tags + branches (write-audit-publish) on the snapshot log: a branch
  * stages commits invisible to main, fast-forward publishes them
  * atomically (oldest first, so any crash prefix is a valid table),
  * a failed audit drops the branch and orphan cleanup reclaims exactly
  * its files, a diverged main refuses to fast-forward, and tagged
  * snapshots are retention-exempt until the tag drops.
  */
class RefsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_refs_wh", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("grp", StringType),
    StructField("v", DoubleType)))

  private def df(ids: Range, grp: String, v: Double) = {
    import spark.implicits._
    ids.map(i => (i.toLong, grp, v)).toDF("id", "grp", "v")
  }

  test("WAP happy path: stage on branch, main blind until fast-forward publishes") {
    val t = new GraftTable(spark, TableDef("r1", schema), freshRoot("r1"))
    t.append(df(0 until 10, "a", 1.0)) // main v1
    val b = t.createBranch("audit")
    b.append(df(10 until 15, "b", 2.0)) // branch v2
    b.append(df(15 until 18, "c", 3.0)) // branch v3
    // audit sees staged rows; main does not
    assert(b.readLogical().count() == 18)
    assert(t.readLogical().count() == 10)
    assert(t.currentVersion == 1)
    val published = t.fastForward("audit")
    assert(published == 2)
    assert(t.currentVersion == 3)
    assert(t.readLogical().count() == 18)
    assert(t.branches.isEmpty)
    // the published log is a first-class main log: changelog works over it
    assert(t.readChanges(1, 3).count() == 8)
  }

  test("failed audit: dropBranch leaves main untouched; removeOrphans reclaims exactly the staged files") {
    val t = new GraftTable(spark, TableDef("r2", schema), freshRoot("r2"))
    t.append(df(0 until 10, "a", 1.0))
    val b = t.createBranch("audit")
    b.append(df(10 until 20, "bad", -1.0))
    // while the branch lives, its files are NOT orphans
    assert(t.removeOrphans() == 0)
    assert(b.readLogical().count() == 20)
    t.dropBranch("audit")
    val reclaimed = t.removeOrphans()
    assert(reclaimed > 0)
    assert(t.readLogical().count() == 10)
    assert(t.readLogical().filter(col("grp") === "bad").count() == 0)
  }

  test("diverged main refuses fast-forward") {
    val t = new GraftTable(spark, TableDef("r3", schema), freshRoot("r3"))
    t.append(df(0 until 5, "a", 1.0))
    val b = t.createBranch("audit")
    b.append(df(5 until 8, "b", 2.0))
    t.append(df(8 until 9, "c", 3.0)) // main advances past the fork
    val e = intercept[IllegalArgumentException] { t.fastForward("audit") }
    assert(e.getMessage.contains("cannot fast-forward"))
    t.dropBranch("audit")
  }

  test("crashed mid-publish fast-forward RESUMES: remaining suffix moves, nothing orphans") {
    val root = freshRoot("r6")
    val t = new GraftTable(spark, TableDef("r6", schema), root)
    t.append(df(0 until 5, "a", 1.0)) // main v1 (fork)
    val b = t.createBranch("audit")
    b.append(df(5 until 8, "b", 2.0)) // branch v2
    b.append(df(8 until 10, "c", 3.0)) // branch v3
    // simulate a crash after the first move of the oldest-first publish:
    // branch commit-2.json is already on main, commit-3.json still staged
    Files.move(
      Paths.get(s"$root/r6/_commits/branch-audit/commit-2.json"),
      Paths.get(s"$root/r6/_commits/commit-2.json"))
    assert(t.currentVersion == 2, "main sits on a valid publish prefix")
    // a retry must RESUME (move only the remaining suffix), not refuse —
    // the old refusal's documented recovery (dropBranch) would have
    // deleted still-staged commit-3.json and orphaned its data files
    val published = t.fastForward("audit")
    assert(published == 1)
    assert(t.currentVersion == 3)
    assert(t.readLogical().count() == 10)
    assert(t.branches.isEmpty)
    assert(t.removeOrphans() == 0, "nothing orphaned by the resumed publish")
  }

  test("genuinely diverged main still refuses even when head is past the fork") {
    val t = new GraftTable(spark, TableDef("r7", schema), freshRoot("r7"))
    t.append(df(0 until 5, "a", 1.0)) // v1 (fork)
    val b = t.createBranch("audit")
    b.append(df(5 until 8, "b", 2.0)) // branch v2 (still staged)
    t.append(df(8 until 9, "c", 3.0)) // main's OWN v2 — divergence
    t.append(df(9 until 10, "d", 4.0)) // main v3
    // branch's remaining staged set starts at fork+1=2 ≤ head=3, so
    // this is NOT a contiguous continuation — refuse, never merge
    val e = intercept[IllegalArgumentException] { t.fastForward("audit") }
    assert(e.getMessage.contains("cannot fast-forward"))
    t.dropBranch("audit")
  }

  test("diverged main + branch with NO staged commits self-heals as a no-op publish") {
    val t = new GraftTable(spark, TableDef("r8", schema), freshRoot("r8"))
    t.append(df(0 until 5, "a", 1.0)) // v1 (fork)
    t.createBranch("audit") // nothing ever staged
    t.append(df(5 until 8, "b", 2.0)) // main's OWN v2 — advanced past the fork
    // a drained branch (no staged jsons past the fork) is exactly what a
    // publish crash leaves between its last staged-commit move and
    // dropBranch — and also what a never-staged branch looks like once
    // main moves on. Both are safe to finish: every branch json already
    // exists on main, so the only remaining work IS the dropBranch.
    // (The pre-r16 refusal forced a manual dropBranch; ADVICE r15.)
    assert(t.fastForward("audit") == 0)
    assert(t.branches.isEmpty, "the drained branch was dropped")
    assert(t.currentVersion == 2, "main untouched by the no-op publish")
    assert(t.readLogical().count() == 8)
    // an UN-diverged empty branch still publishes as a clean zero
    val b2 = t.createBranch("audit2")
    assert(t.fastForward("audit2") == 0)
    assert(b2 != null)
  }

  test("branch of a merge-on-read table keeps latest-wins ordering across the fork") {
    val t = new GraftTable(spark,
      TableDef("r4", schema, keys = Seq("id"), mergeOnRead = true), freshRoot("r4"))
    t.upsert(df(0 until 10, "a", 1.0)) // main v1
    val b = t.createBranch("audit")
    b.upsert(df(5 until 12, "b", 2.0)) // branch v2 revises 5..9
    assert(b.readLogical().count() == 12)
    assert(b.readLogical().filter(col("grp") === "b").count() == 7)
    t.fastForward("audit")
    val out = t.readLogical()
    assert(out.count() == 12)
    assert(out.filter(col("id") >= 5 && col("grp") === "b").count() == 7)
  }

  test("renames and position deletes staged on a branch publish intact") {
    val t = new GraftTable(spark, TableDef("r8", schema), freshRoot("r8"))
    t.append(df(0 until 10, "a", 1.0)) // main v1
    val b = t.createBranch("audit")
    b.renameColumn("v", "amount") // branch v2 (provenance log entry)
    b.deleteWhere(org.apache.spark.sql.functions.col("id") < 3) // branch v3 (tombstones)
    b.append(df(10 until 12, "b", 2.0).withColumnRenamed("v", "amount")) // branch v4
    // main is blind to all of it
    assert(t.readLogical().columns.contains("v") && t.currentVersion == 1)
    t.fastForward("audit")
    val out = t.readLogical()
    assert(out.columns.contains("amount") && !out.columns.contains("v"))
    assert(out.count() == 9)
    assert(out.filter(col("id") < 3).count() == 0)
    assert(out.filter(col("amount") === 1.0).count() == 7,
      "pre-rename files must serve under the new name after the publish")
    // the published log carries the provenance + tombstones: compact
    // materializes both and the read is unchanged
    t.compact()
    assert(t.readLogical().count() == 9)
    assert(t.read().columns.contains("amount"))
  }

  test("tags pin snapshots, exempt them from expiry, and read with the tag-time schema") {
    val t = new GraftTable(spark, TableDef("r5", schema), freshRoot("r5"))
    t.append(df(0 until 4, "a", 1.0)) // v1
    t.createTag("train-set")
    t.addColumns(StructField("w", DoubleType)) // v2
    t.append(df(4 until 6, "b", 2.0).withColumn("w", lit(9.0))) // v3
    // tag reads v1 with v1's 3-column schema
    val tagRead = t.readTagLogical("train-set")
    assert(tagRead.count() == 4)
    assert(tagRead.schema.fieldNames.toSeq == Seq("id", "grp", "v"))
    // expiry keeps the tagged snapshot, drops the untagged evolve commit
    assert(t.expireSnapshots(olderThanMs = -1L) == 1)
    assert(t.readTagLogical("train-set").count() == 4)
    t.dropTag("train-set")
    assert(t.expireSnapshots(olderThanMs = -1L) == 1)
    intercept[IllegalArgumentException] { t.readTagLogical("train-set") }
  }

  test("refusals: dup refs, bad names, main-only ops on a branch view") {
    val t = new GraftTable(spark, TableDef("r6", schema), freshRoot("r6"))
    t.append(df(0 until 3, "a", 1.0))
    t.createTag("pin")
    intercept[IllegalArgumentException] { t.createTag("pin") }
    intercept[IllegalArgumentException] { t.createTag("bad/name") }
    intercept[IllegalArgumentException] { t.createTag("v9", Some(99)) }
    val b = t.createBranch("audit")
    intercept[IllegalArgumentException] { t.createBranch("audit") }
    intercept[IllegalArgumentException] { t.createBranch("pin") } // tag name taken
    intercept[IllegalArgumentException] { b.expireSnapshots(0L) }
    intercept[IllegalArgumentException] { b.removeOrphans() }
    intercept[IllegalArgumentException] { b.createBranch("nested") }
    t.dropBranch("audit")
    intercept[IllegalArgumentException] { t.dropBranch("audit") }
  }
}

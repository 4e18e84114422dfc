package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.materialize.CdcAggConsumer
import graft.tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The changelog-maintained aggregate (M10): groups folded to zero
  * leave the view, replayed polls no-op (exactly-once via the sink
  * mark), non-foldable source commits and changelog gaps refuse with
  * rebuild() as the recovery, and random op histories folded at random
  * poll boundaries converge to the direct aggregate.
  */
class CdcConsumerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_cdc_wh", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private val srcSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("typ", StringType),
    StructField("value", DoubleType)))

  private val aggSchema = StructType(Seq(
    StructField("typ", StringType),
    StructField("n", LongType),
    StructField("cents", LongType)))

  private def rig(name: String): (GraftTable, GraftTable, CdcAggConsumer) = {
    val cat = new TableCatalog(spark, freshRoot(name), Seq(
      TableDef("src", srcSchema),
      TableDef("agg", aggSchema, keys = Seq("typ"))))
    val src = cat.table("src")
    val mv = cat.table("agg")
    (src, mv, new CdcAggConsumer(spark, src, mv, Seq("typ"), "value"))
  }

  private def rows(xs: (Long, String, Double)*) = {
    import spark.implicits._
    xs.toDF("id", "typ", "value")
  }

  private def snapshot(mv: GraftTable): Map[String, (Long, Long)] =
    mv.readLogical().collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("deletes subtract; a group folded to zero leaves the view") {
    val (src, mv, c) = rig("zero")
    src.append(rows((1, "x", 1.0), (2, "x", 2.5), (3, "y", 4.0)))
    c.poll()
    assert(snapshot(mv) == Map("x" -> (2L, 350L), "y" -> (1L, 400L)))
    // change-tracked delete of ALL x rows (empty replacement)
    src.replaceWhere(col("typ") === "x", rows().limit(0), trackChanges = true)
    c.poll()
    assert(snapshot(mv) == Map("y" -> (1L, 400L)))
  }

  test("caught-up poll is a no-op; mark rides the merge commit") {
    val (src, mv, c) = rig("replay")
    src.append(rows((1, "x", 1.0)))
    assert(c.poll() == 1)
    assert(c.consumedVersion == 1L)
    assert(c.poll() == 0) // replay must not double-apply
    assert(snapshot(mv) == Map("x" -> (1L, 100L)))
    // the mark is IN the merge commit, not a side effect after it
    assert(mv.commits.last.sinkBatchesOrEmpty.get("cdc:src").contains(1L))
  }

  test("non-foldable source commit refuses; rebuild() recovers and polling resumes") {
    val (src, mv, c) = rig("refuse")
    src.append(rows((1, "x", 1.0), (2, "y", 2.0)))
    c.poll()
    src.replaceWhere(col("typ") === "x", rows((1, "x", 9.0))) // UNTRACKED repair
    val e = intercept[IllegalArgumentException] { c.poll() }
    assert(e.getMessage.contains("not incrementally foldable"))
    c.rebuild()
    assert(snapshot(mv) == Map("x" -> (1L, 900L), "y" -> (1L, 200L)))
    src.append(rows((3, "y", 3.0))) // incremental service resumes post-rebuild
    c.poll()
    assert(snapshot(mv) == Map("x" -> (1L, 900L), "y" -> (2L, 500L)))
  }

  test("untracked COW upsert: one merged write, changelog refuses that commit") {
    // a KEYED source this time — upsert needs identifier keys
    val cat = new TableCatalog(spark, freshRoot("untracked"), Seq(
      TableDef("src", srcSchema, keys = Seq("id")),
      TableDef("agg", aggSchema, keys = Seq("typ"))))
    val src = cat.table("src")
    val mv = cat.table("agg")
    val c = new CdcAggConsumer(spark, src, mv, Seq("typ"), "value")
    src.append(rows((1, "x", 1.0), (2, "y", 2.0)))
    c.poll()
    src.upsert(rows((1, "x", 9.0)), trackChanges = false)
    // same logical result as the tracked form...
    assert(src.readLogical().filter(col("typ") === "x")
      .collect().map(_.getDouble(2)).toSeq == Seq(9.0))
    // ...but no change set: the single merged file is the whole commit
    assert(src.commits.last.changeFilesOrEmpty.isEmpty)
    intercept[IllegalArgumentException] { src.readChanges(1, 2) }
    val e = intercept[IllegalArgumentException] { c.poll() }
    assert(e.getMessage.contains("not incrementally foldable"))
    c.rebuild()
    assert(snapshot(mv) == Map("x" -> (1L, 900L), "y" -> (1L, 200L)))
  }

  test("changelog gap refuses loudly; rebuild() is the resync") {
    val (src, mv, c) = rig("gap")
    src.append(rows((1, "x", 1.0)))
    c.poll()
    src.append(rows((2, "x", 2.0)))
    src.append(rows((3, "x", 3.0)))
    src.expireSnapshots(olderThanMs = -1L) // v1/v2 gone — (1, 3] now has a gap
    intercept[IllegalStateException] { c.poll() }
    c.rebuild()
    assert(snapshot(mv) == Map("x" -> (3L, 600L)))
  }

  test("property: random append/tracked-replace histories at random poll boundaries converge") {
    for (seed <- Seq(7, 23)) {
      val rnd = new Random(seed)
      val (src, mv, c) = rig(s"prop$seed")
      val types = Vector("a", "b", "c")
      var nextId = 0L
      for (_ <- 0 until 8) {
        if (rnd.nextDouble() < 0.7 || src.currentVersion == 0) {
          val batch = (0 until (1 + rnd.nextInt(4))).map { _ =>
            nextId += 1
            (nextId, types(rnd.nextInt(types.size)), rnd.nextInt(1000) / 100.0)
          }
          src.append(rows(batch: _*))
        } else {
          val t = types(rnd.nextInt(types.size))
          val repl = if (rnd.nextBoolean()) rows((nextId + 1, t, 5.0)) else rows().limit(0)
          if (!repl.isEmpty) nextId += 1
          src.replaceWhere(col("typ") === t, repl, trackChanges = true)
        }
        if (rnd.nextDouble() < 0.5) c.poll()
      }
      c.poll()
      val direct = src.readLogical().groupBy("typ").agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(snapshot(mv) == direct, s"seed $seed diverged")
    }
  }
}

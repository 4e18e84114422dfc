package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-spec evolution: a metadata-only commit switches the layout
  * for future writes, old files keep their generation (explicit
  * per-file provenance, expiry-proof), logical reads union generations,
  * physical reads refuse while mixed, compaction migrates, and the
  * refusal set fails loudly.
  */
class PartitionEvolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_pevo_wh", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("ts", TimestampType),
    StructField("v", DoubleType)))

  private def df(ids: Range, day: Int, v: Double) = {
    import spark.implicits._
    ids.map(i => (i.toLong,
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d ${i % 24}%02d:00:00"), v))
      .toDF("id", "ts", "v")
  }

  test("day→hour evolution: metadata-only, logical reads union generations, physical read refuses") {
    val t = new GraftTable(spark,
      TableDef("p1", schema, partitions = Seq(DayTransform("ts"))), freshRoot("p1"))
    t.append(df(0 until 10, 1, 1.0)) // day layout
    val filesBefore = t.commits.last.files.toSet
    t.evolvePartitioning(Seq(HourTransform("ts")))
    assert(t.commits.last.op == "evolve-partition")
    assert(t.commits.last.files.toSet == filesBefore, "evolution must not touch data")
    t.append(df(10 until 16, 2, 2.0)) // hour layout
    assert(t.readLogical().count() == 16)
    assert(t.readLogical().filter(col("v") === 2.0).count() == 6)
    val e = intercept[IllegalArgumentException] { t.read() }
    assert(e.getMessage.contains("partition-spec generations"))
    // pre-evolution snapshot still reads physically, with the day column
    assert(t.read(Some(1)).columns.contains("p_ts_day"))
    // new files actually landed under the hour layout
    val hourDirs = new java.io.File(t.dataPath).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("p_ts_hour="))
    assert(hourDirs.nonEmpty)
  }

  test("compaction migrates old generations; physical reads resume; orphans reclaim old dirs") {
    val t = new GraftTable(spark,
      TableDef("p2", schema, partitions = Seq(DayTransform("ts"))), freshRoot("p2"))
    t.append(df(0 until 8, 1, 1.0))
    t.evolvePartitioning(Seq(HourTransform("ts")))
    t.append(df(8 until 12, 2, 2.0))
    assert(t.needsCompaction(), "stale generation must flag compaction")
    t.compact()
    assert(!t.needsCompaction(targetBytes = 1L), "all files on the current spec now")
    assert(t.read().columns.contains("p_ts_hour"))
    assert(t.readLogical().count() == 12)
    t.expireSnapshots(olderThanMs = -1L)
    assert(t.removeOrphans() > 0)
    // dir skeletons may keep .crc residue; the DATA must be gone
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    val dayData = walk(new java.io.File(t.dataPath))
      .filter(f => f.getPath.contains("p_ts_day=") && f.getName.endsWith(".parquet"))
    assert(dayData.isEmpty, "migrated day-generation data files must be reclaimed")
  }

  test("per-file provenance survives expiry of the evolve commit (firstSeen would misread this)") {
    val t = new GraftTable(spark,
      TableDef("p3", schema, partitions = Seq(DayTransform("ts"))), freshRoot("p3"))
    t.append(df(0 until 6, 1, 1.0)) // v1: day files
    t.evolvePartitioning(Seq(HourTransform("ts"))) // v2
    t.append(df(6 until 9, 2, 2.0)) // v3: hour files
    t.append(df(9 until 11, 3, 3.0)) // v4: hour files
    // expire v1-v3: the day files' earliest surviving lister is v4,
    // whose carried spec is HOUR — only explicit per-file provenance
    // reads them correctly
    assert(t.expireSnapshots(olderThanMs = -1L) == 3)
    assert(t.readLogical().count() == 11)
    assert(t.readLogical().filter(col("v") === 1.0).count() == 6)
  }

  test("unpartitioned→partitioned and back; changelog spans evolutions") {
    val t = new GraftTable(spark, TableDef("p4", schema), freshRoot("p4"))
    t.append(df(0 until 4, 1, 1.0)) // flat layout
    t.evolvePartitioning(Seq(DayTransform("ts")))
    t.append(df(4 until 7, 2, 2.0)) // day layout
    val ch = t.readChanges(0, 3)
    assert(ch.count() == 7)
    assert(ch.filter(col("_change_type") =!= "insert").count() == 0)
    t.evolvePartitioning(Nil.padTo(0, DayTransform("ts"))) // back to unpartitioned
    t.append(df(7 until 9, 3, 3.0))
    assert(t.readLogical().count() == 9)
  }

  test("merge-on-read latest-wins spans spec generations") {
    val t = new GraftTable(spark,
      TableDef("p5", schema, keys = Seq("id"), mergeOnRead = true,
        partitions = Seq(DayTransform("ts"))), freshRoot("p5"))
    t.upsert(df(0 until 6, 1, 1.0))
    t.evolvePartitioning(Seq(HourTransform("ts")))
    t.upsert(df(3 until 8, 2, 2.0)) // revises 3..5 across the generation line
    val out = t.readLogical()
    assert(out.count() == 8)
    assert(out.filter(col("id") >= 3 && col("v") === 2.0).count() == 5)
    t.compact()
    assert(t.readLogical().filter(col("v") === 2.0).count() == 5)
  }

  test("refusals: unknown source, name collision, duplicate names, identical spec") {
    val t = new GraftTable(spark,
      TableDef("p6", schema, partitions = Seq(DayTransform("ts"))), freshRoot("p6"))
    t.append(df(0 until 3, 1, 1.0))
    intercept[IllegalArgumentException] {
      t.evolvePartitioning(Seq(DayTransform("nope")))
    }
    intercept[IllegalArgumentException] {
      t.evolvePartitioning(Seq(IdentityTransform("id"), IdentityTransform("id")))
    }
    intercept[IllegalArgumentException] {
      t.evolvePartitioning(Seq(DayTransform("ts")))
    }
    // drift check stays clean across generations
    val root = freshRoot("p7")
    val cat = new TableCatalog(spark, root,
      Seq(TableDef("p7", schema, partitions = Seq(DayTransform("ts")))))
    val t7 = cat.table("p7")
    t7.append(df(0 until 4, 1, 1.0))
    t7.evolvePartitioning(Seq(HourTransform("ts")))
    t7.append(df(4 until 6, 2, 2.0))
    cat.checkDrift()
  }
}

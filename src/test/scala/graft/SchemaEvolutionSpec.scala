package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution (S7 made query-shaped, see s18_schema_evolution):
  * ADD/DROP COLUMN are metadata-only commits; old files null-fill added
  * columns, dropped columns stay readable through time travel, the
  * schema survives expiry of the evolve commit itself, MOR latest-wins
  * resolution and the changelog read both span an evolution, and the
  * refusal set (non-nullable add, dup add, key drop, partition-source
  * drop) fails loudly.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_evo_wh", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private val base = StructType(Seq(
    StructField("id", LongType),
    StructField("grp", StringType)))

  private def df2(ids: Range, grp: String) = {
    import spark.implicits._
    ids.map(i => (i.toLong, grp)).toDF("id", "grp")
  }

  private def df3(ids: Range, grp: String, v: Double) = {
    import spark.implicits._
    ids.map(i => (i.toLong, grp, v)).toDF("id", "grp", "v")
  }

  test("add column: metadata-only commit; old files null-fill; time travel keeps the old schema") {
    val t = new GraftTable(spark, TableDef("e1", base), freshRoot("e1"))
    t.append(df2(0 until 10, "a"))
    val filesBefore = t.commits.last.files.toSet
    t.addColumns(StructField("v", DoubleType))
    // metadata-only: same live files, no data written
    assert(t.commits.last.op == "evolve-schema")
    assert(t.commits.last.files.toSet == filesBefore)
    t.append(df3(10 until 15, "b", 2.0))
    val out = t.readLogical()
    assert(out.schema.fieldNames.toSeq == Seq("id", "grp", "v"))
    assert(out.filter(col("v").isNull).count() == 10) // pre-evolution rows
    assert(out.filter(col("v") === 2.0).count() == 5)
    // snapshot v1 reads with v1's two-column schema
    assert(t.readLogical(Some(1)).schema.fieldNames.toSeq == Seq("id", "grp"))
  }

  test("drop column: projected away now, still readable via time travel; schema survives expiry") {
    val t = new GraftTable(spark, TableDef("e2",
      StructType(base.fields :+ StructField("v", DoubleType))), freshRoot("e2"))
    t.append(df3(0 until 10, "a", 1.0))
    t.dropColumns("v")
    assert(t.readLogical().schema.fieldNames.toSeq == Seq("id", "grp"))
    assert(t.readLogical(Some(1)).schema.fieldNames.toSeq == Seq("id", "grp", "v"))
    // post-drop append carries the narrowed schema on ITS commit, so
    // expiring the evolve commit loses nothing
    t.append(df2(10 until 12, "b"))
    val expired = t.expireSnapshots(olderThanMs = -1L) // everything but latest
    assert(expired == 2)
    assert(t.currentSchema.fieldNames.toSeq == Seq("id", "grp"))
    assert(t.readLogical().count() == 12)
  }

  test("merge-on-read latest-wins resolves across an evolution") {
    val t = new GraftTable(spark,
      TableDef("e3", base, keys = Seq("id"), mergeOnRead = true), freshRoot("e3"))
    t.upsert(df2(0 until 10, "a"))
    t.addColumns(StructField("v", DoubleType))
    t.upsert(df3(5 until 12, "b", 3.0))
    val out = t.readLogical()
    assert(out.count() == 12)
    assert(out.filter(col("id") < 5).agg(sum(when(col("v").isNull, 1))).first().getLong(0) == 5)
    assert(out.filter(col("id") >= 5 && col("grp") === "b").count() == 7)
    // compaction materializes the merge under the evolved schema
    t.compact()
    assert(t.readLogical().count() == 12)
    assert(t.readLogical().filter(col("v") === 3.0).count() == 7)
  }

  test("changelog across an evolution serves the range-end schema; evolve commit is a no-op delta") {
    val t = new GraftTable(spark, TableDef("e4", base), freshRoot("e4"))
    t.append(df2(0 until 4, "a")) // v1
    t.addColumns(StructField("v", DoubleType)) // v2
    t.append(df3(4 until 6, "b", 2.0)) // v3
    val ch = t.readChanges(0, 3)
    assert(ch.schema.fieldNames.toSeq == Seq("id", "grp", "v", "_change_version", "_change_type"))
    assert(ch.count() == 6) // evolve contributed no rows
    assert(ch.filter(col("_change_version") === 1 && col("v").isNull).count() == 4)
    // a pre-evolution range serves the pre-evolution schema
    assert(t.readChanges(0, 1).schema.fieldNames.toSeq ==
      Seq("id", "grp", "_change_version", "_change_type"))
  }

  test("refusals: non-nullable add, duplicate add, existing name, key drop, partition-source drop, drop-all") {
    val t = new GraftTable(spark,
      TableDef("e5", base, keys = Seq("id")), freshRoot("e5"))
    t.append(df2(0 until 3, "a"))
    intercept[IllegalArgumentException] {
      t.addColumns(StructField("w", DoubleType, nullable = false))
    }
    intercept[IllegalArgumentException] {
      t.addColumns(StructField("w", DoubleType), StructField("W", LongType))
    }
    intercept[IllegalArgumentException] { t.addColumns(StructField("GRP", StringType)) }
    intercept[IllegalArgumentException] { t.dropColumns("id") }
    intercept[IllegalArgumentException] { t.dropColumns("grp", "id") }
    // partitioned table: dropping the transform's source column refuses
    val pt = new GraftTable(spark, TableDef("e5p",
      StructType(Seq(StructField("id", LongType), StructField("ts", TimestampType))),
      partitions = Seq(DayTransform("ts"))), freshRoot("e5p"))
    import spark.implicits._
    pt.append(Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "ts"))
    intercept[IllegalArgumentException] { pt.dropColumns("ts") }
  }

  test("drift check accepts evolved schemas: added column pre-fill and dropped column residue are not drift") {
    val root = freshRoot("e6")
    val cat = new TableCatalog(spark, root, Seq(TableDef("e6", base)))
    val t = cat.table("e6")
    t.append(df2(0 until 5, "a"))
    t.addColumns(StructField("v", DoubleType))
    cat.checkDrift() // old files missing 'v' — additive, clean
    t.append(df3(5 until 8, "b", 1.0))
    t.dropColumns("v")
    cat.checkDrift() // files still carrying 'v' — historical, clean
  }
}

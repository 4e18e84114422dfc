package graft

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp
import java.util.Comparator

import graft.tables._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The driver-local tiny-commit write fast path (GraftTable.writeFiles →
  * GraftParquetBridge) must be observationally identical to the
  * distributed writer: same read-back rows, same logical types
  * (TIMESTAMP(MICROS) discipline), USABLE footer min/max stats (the
  * metadata watermark read depends on them), and it must only engage
  * for LocalRelation inputs on unpartitioned, unsorted tables.
  */
class LocalWritePathSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freshRoot(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_lw_wh", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private val wmSchema = StructType(Seq(
    StructField("view_name", StringType),
    StructField("watermark_ts", TimestampType),
    StructField("source_version", LongType)))

  private def wmRow(name: String, ts: String, v: Long) =
    Row(name, Timestamp.valueOf(ts), v)

  test("local-relation upsert round-trips with footer stats and micros timestamps") {
    import scala.jdk.CollectionConverters._
    val t = new GraftTable(spark,
      TableDef("wm", wmSchema, keys = Seq("view_name"), mergeOnRead = true),
      freshRoot("wm"))
    t.upsert(spark.createDataFrame(
      Seq(wmRow("v1", "2024-01-20 10:00:00", 3L)).asJava, wmSchema))
    t.upsert(spark.createDataFrame(
      Seq(wmRow("v1", "2024-01-21 11:30:00", 5L),
        wmRow("v2", "2024-01-02 00:00:01", 1L)).asJava, wmSchema))

    // latest-wins read-back through the normal MOR resolution
    val rows = t.readLogical().orderBy("view_name").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("v1", "v2"))
    assert(rows(0).getTimestamp(1) == Timestamp.valueOf("2024-01-21 11:30:00"))
    assert(rows(0).getLong(2) == 5L)

    // footer min/max must be USABLE: the metadata-only column max is the
    // watermark-advance read path (falls back to a scan only when stats
    // are absent — INT96 would have none)
    val mx = t.columnMaxMicros("watermark_ts")
    assert(mx.isDefined, "fast-path files must carry ordered footer stats")
    assert(org.apache.spark.sql.catalyst.util.DateTimeUtils
      .toJavaTimestamp(mx.get) == Timestamp.valueOf("2024-01-21 11:30:00"))

    // physical encoding matches the table discipline: INT64 micros, so a
    // plain re-read sees TimestampType (INT96 or nanos would differ)
    val file = Files.walk(Paths.get(t.dataPath)).iterator().asScala
      .find(p => p.toString.endsWith(".parquet")).get
    val reread = spark.read.parquet(file.toString)
    assert(reread.schema("watermark_ts").dataType == TimestampType)
  }

  test("fast path engages only for tiny local relations; distributed inputs keep the task writer") {
    val t = new GraftTable(spark, TableDef("plain", wmSchema), freshRoot("plain"))
    // a distributed (non-local) plan over the same schema — range() is a
    // leaf that is NOT a LocalRelation, so the normal writer must run
    val dist = spark.range(3).select(
      concat(lit("view-"), col("id").cast("string")).as("view_name"),
      lit(Timestamp.valueOf("2024-01-05 00:00:00")).as("watermark_ts"),
      col("id").as("source_version"))
    t.append(dist)
    assert(t.readLogical().count() == 3)

    // local relation lands identically (same schema, rows union cleanly)
    import scala.jdk.CollectionConverters._
    t.append(spark.createDataFrame(
      Seq(wmRow("view-9", "2024-01-06 00:00:00", 9L)).asJava, wmSchema))
    val all = t.readLogical().orderBy("source_version").collect()
    assert(all.length == 4 && all.last.getString(0) == "view-9")

    // equivalence: Spark-written and fast-path files coexist in one
    // table and read back as one consistent relation
    assert(t.readLogical().agg(max("watermark_ts")).head.getTimestamp(0) ==
      Timestamp.valueOf("2024-01-06 00:00:00"))
  }

  test("partitioned and sorted tables never take the fast path (layout is the writer's job)") {
    val t = new GraftTable(spark,
      TableDef("parted", wmSchema, partitions = Seq(DayTransform("watermark_ts"))),
      freshRoot("parted"))
    import scala.jdk.CollectionConverters._
    t.append(spark.createDataFrame(
      Seq(wmRow("a", "2024-01-01 01:00:00", 1L),
        wmRow("b", "2024-01-02 02:00:00", 2L)).asJava, wmSchema))
    // partition directories exist — the hash-distributed writer ran
    val dirs = Files.list(Paths.get(t.dataPath)).iterator().asScala
      .filter(p => Files.isDirectory(p)).map(_.getFileName.toString).toSeq
    assert(dirs.count(_.startsWith("p_watermark_ts_day=")) == 2,
      s"expected day partition dirs, got $dirs")
    assert(t.readLogical().count() == 2)
  }
}

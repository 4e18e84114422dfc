package graft.materialize

import java.sql.Timestamp

import graft.tables.GraftTable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A materializable view: a deterministic transform of the source facts
  * with an event-time column (drives the watermark) and an identifier
  * key (drives the repair passes).
  */
final case class MatView(
    name: String,
    tsCol: String,
    keyCols: Seq[String],
    compute: DataFrame => DataFrame)

/** Incremental materializer — the engine's port of the reference's
  * 4-pass watermark protocol (scripts/materialize.sh:66-330):
  *
  *   pass 0  M1  first run: full CTAS materialization          (:84)
  *   pass 1  M4  lookback repair  — recompute [wm−N, wm] and
  *               replace it iff the counts drifted (late rows) (:123-173)
  *   pass 2  M5  dimension repair — rows whose dim key gained a
  *               new SCD2 version since wm: delete+re-insert   (:175-224)
  *   pass 3  M3  append           — view rows with ts > wm     (:226-241)
  *   pass 4  M6  stale-row repair — keys whose freshly computed
  *               row differs from the materialized one (late
  *               downstream funnel events): delete+re-insert   (:243-321)
  *   then    M2  advance the watermark to max(ts)              (:323-330)
  *
  * Scale shape: every pass is a bounded slice — lookback repair touches a
  * fixed window, dim repair only changed keys (anti-join MERGE, no
  * collect), append only ts > wm, stale repair only a detection window —
  * so per-run cost is O(new + repaired), never O(table). The watermark
  * table is the tiny keyed upsert table the reference uses
  * (materialization_watermarks.yml).
  */
final class Materializer(
    spark: SparkSession,
    source: GraftTable,
    view: MatView,
    mat: GraftTable,
    watermarks: GraftTable) {

  private def ts: Column = col(view.tsCol)

  /** The freshly computed view over ALL source facts. Cached for the
    * duration of one `run()` — the repair passes each slice it, and
    * recomputing the aggregation per pass would multiply the source
    * scans (the dominant cost at scale).
    */
  private var cachedView: Option[DataFrame] = None

  private def viewDf: DataFrame =
    cachedView.getOrElse(view.compute(source.readLogical()))

  private def withCachedView[A](body: => A): A = {
    val v = view.compute(source.readLogical()).cache()
    cachedView = Some(v)
    try body
    finally {
      cachedView = None
      v.unpersist()
    }
  }

  // ---- M2: watermark bookkeeping ----

  def readWatermark(): Option[Timestamp] =
    watermarks.readLogical()
      .filter(col("view_name") === view.name)
      .collect().headOption.map(_.getAs[Timestamp]("watermark_ts"))

  private def advanceWatermark(): Unit = {
    val mx = mat.readLogical().agg(max(ts)).collect().head
    if (!mx.isNullAt(0)) {
      import scala.jdk.CollectionConverters._
      val row = org.apache.spark.sql.Row(view.name, mx.getAs[Timestamp](0))
      watermarks.upsert(spark.createDataFrame(Seq(row).asJava, watermarks.defn.schema))
    }
  }

  // ---- the passes ----

  /** M1 — full materialization (first run). */
  def fullMaterialize(): Unit = {
    mat.overwrite(viewDf)
    advanceWatermark()
  }

  /** M4 — recompute the trailing window and replace it iff drifted.
    * Drift = ANY full-row difference between the fresh recompute and the
    * materialized slice, in either direction — a late event that changes
    * an aggregate value for an existing key counts, not just new/removed
    * keys. Mirrors the reference's skip logic (materialize.sh:131-135):
    * an unchanged window costs one comparison job, not a rewrite.
    */
  def lookbackRepair(wm: Timestamp, lookback: String): Unit = {
    val windowCond = ts > to_timestamp(lit(wm)) - expr(s"INTERVAL $lookback") && ts <= lit(wm)
    val fresh = viewDf.filter(windowCond)
    val current = mat.readLogical().filter(windowCond)
    val drifted = !fresh.exceptAll(current).union(current.exceptAll(fresh)).isEmpty
    if (drifted) mat.replaceWhere(windowCond, fresh)
  }

  /** M5 — re-enrich rows whose dimension key gained a new version after
    * the watermark. `changedKeys` = dim rows with valid_from > wm,
    * projected to the fact FK; deletion is a distributed anti-join.
    * Restricted to `ts <= wm`: rows past the watermark belong to the
    * append pass, which runs after this one (re-inserting them here
    * would double-count them).
    */
  def dimensionRepair(wm: Timestamp, changedKeys: DataFrame): Unit = {
    val fkCols = changedKeys.columns.toSeq
    val fresh = viewDf.filter(ts <= lit(wm))
      .join(broadcast(changedKeys.distinct()), fkCols, "left_semi")
    mat.replaceKeys(changedKeys, fkCols, fresh)
  }

  /** M3 — append view rows strictly after the watermark. */
  def appendNew(wm: Timestamp): Unit = {
    val fresh = viewDf.filter(ts > lit(wm))
    if (!fresh.isEmpty) mat.append(fresh)
  }

  /** M6 — stale-row repair: inside the detection window, any key whose
    * freshly computed row differs from the materialized row (a late
    * downstream event flipped a funnel flag) is deleted and re-inserted.
    */
  def staleRepair(wm: Timestamp, detectionWindow: String): Unit = {
    val cond = ts > to_timestamp(lit(wm)) - expr(s"INTERVAL $detectionWindow")
    val fresh = viewDf.filter(cond)
    val current = mat.readLogical().filter(cond)
    val staleKeys = fresh.exceptAll(current).select(view.keyCols.map(col): _*)
    if (!staleKeys.isEmpty) {
      val replacement = fresh.join(staleKeys.distinct(), view.keyCols, "left_semi")
      mat.replaceKeys(staleKeys, view.keyCols, replacement)
    }
  }

  /** The full protocol: CTAS on first run, else repair+append passes,
    * then advance the watermark.
    */
  def run(
      lookback: String = "48 hours",
      changedDimKeys: Option[DataFrame] = None,
      staleDetectionWindow: Option[String] = None): Unit =
    readWatermark() match {
      case None => fullMaterialize()
      case Some(wm) => withCachedView {
        lookbackRepair(wm, lookback)
        changedDimKeys.foreach(dimensionRepair(wm, _))
        appendNew(wm)
        staleDetectionWindow.foreach(staleRepair(wm, _))
        advanceWatermark()
      }
    }
}

object Materializer {
  import org.apache.spark.sql.types._

  /** Schema of the watermark bookkeeping table (M2). */
  val watermarkSchema: StructType = StructType(Seq(
    StructField("view_name", StringType),
    StructField("watermark_ts", TimestampType)))

  def watermarkTableDef: graft.tables.TableDef =
    graft.tables.TableDef("materialization_watermarks", watermarkSchema,
      keys = Seq("view_name"))
}

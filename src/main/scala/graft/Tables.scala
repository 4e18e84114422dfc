package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided testdata tables (see TESTDATA.md).
  *
  * Each table is one parquet file under `dir`. At 100 TB these would be
  * day/key-partitioned directories; the loader is the single seam where
  * that layout would change (nothing downstream assumes a single file).
  */
final case class Tables(spark: SparkSession, dir: String) {
  /** Memoized relation per (session, dir, table): `spark.read.parquet`
    * pays a driver-side footer read (schema) plus a directory listing
    * (file index) on EVERY call, and a bench/verify run constructs each
    * table relation hundreds of times over an immutable directory. The
    * memo reuses the analyzed relation — the exact reuse a catalog
    * table gets for free — and holds no row data, so it is not result
    * caching: every action still scans the parquet. Callers that
    * rewrite a directory mid-JVM must [[Tables.invalidate]] it first
    * (none do today: the synthetic-corpus builders all create their dir
    * before its first read and never rewrite it).
    */
  private def t(name: String): DataFrame = {
    if (!Tables.relationCache.contains((spark, dir, name)))
      Tables.sweepStopped() // only on the (rare) populate path
    Tables.relationCache.getOrElseUpdate((spark, dir, name),
      spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** `events.parquet` has shipped with two physical layouts for `ts`, so
    * the loader adapts to whatever actually arrives:
    *
    *  - INT64 TIMESTAMP(NANOS): read as long via
    *    `spark.sql.legacy.parquet.nanosAsLong` (set at session build —
    *    see [[GraftSession]]) and rebuilt as a (µs) TimestampType column.
    *    Integer `div` — a double division would lose precision above 2^53
    *    (epoch-nanos ≈ 1.7e18). Source values are µs-grain, so the
    *    truncation is lossless vs the DuckDB oracle.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): loads as TIMESTAMP_NTZ;
    *    cast to the session-local TimestampType (session TZ is pinned to
    *    UTC in [[GraftSession]], so the wall-clock values are unchanged
    *    and match the naive timestamps DuckDB reads).
    *
    * Everything downstream sees one stable contract: `ts` is TimestampType.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = t("events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType    => df
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case other => sys.error(
        s"events.ts: unexpected parquet type $other — testdata layout changed, extend the loader deliberately")
    }
  }

  /** Lookup by table name (SQL-runner/temp-view registration). */
  def byName(name: String): DataFrame = name match {
    case "events" => events
    case other    => t(other)
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private[graft] val relationCache =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), DataFrame]()

  /** Evict entries whose session has been stopped (ADVICE r17: a
    * TrieMap keyed by SparkSession would otherwise retain stopped
    * sessions and their analyzed relations/file indexes for the JVM
    * lifetime). Swept opportunistically on the populate path — test
    * suites cycle sessions; Verify/Bench hold one.
    */
  private[graft] def sweepStopped(): Unit =
    relationCache.keys.filter(_._1.sparkContext.isStopped)
      .foreach(relationCache.remove)

  /** Drop memoized relations under `dir` — required before re-reading a
    * directory that was rewritten in this JVM (the memoized relation
    * pins the old file listing).
    */
  def invalidate(dir: String): Unit =
    relationCache.keys.filter(_._2 == dir).foreach(relationCache.remove)
}

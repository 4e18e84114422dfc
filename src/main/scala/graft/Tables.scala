package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-provided testdata tables (see TESTDATA.md).
  *
  * Each table is one parquet file under `dir`. At 100 TB these would be
  * day/key-partitioned directories; the loader is the single seam where
  * that layout would change (nothing downstream assumes a single file).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries INT64 TIMESTAMP(NANOS), read as long via
    * `spark.sql.legacy.parquet.nanosAsLong` (set once at session build —
    * see [[GraftSession]]) and rebuilt as a (µs) TimestampType column.
    * Integer `div` — a double division would lose precision above 2^53
    * (epoch-nanos ≈ 1.7e18). The source values are µs-grain, so the
    * truncation is lossless vs the DuckDB oracle.
    */
  def events: DataFrame =
    t("events").withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))

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
}

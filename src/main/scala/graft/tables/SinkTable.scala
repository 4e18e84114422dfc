package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The sink-facing table contract — the compile-level seam between the
  * streaming sinks ([[graft.streaming.Sinks]]) and the storage layer
  * (PORTING.md §2). [[GraftTable]] is the in-repo implementation (the
  * parquet + commit-log lakehouse standing in for Iceberg v2, which has
  * no jars in this environment); a jar-equipped deployment implements
  * this trait over a real catalog table — `append` → DataFrameWriterV2
  * append, `upsert` → MERGE INTO (equality-delete upsert for the
  * merge-on-read tables), the sink mark → a snapshot summary property,
  * exactly the scheme Iceberg's own Spark sink uses — and every sink in
  * [[graft.streaming.Sinks]] runs unchanged.
  */
trait SinkTable {
  def spark: SparkSession

  /** Logical schema + declarative partition spec of the table. */
  def defn: TableDef

  /** Directory a file STREAM tails to consume this table's appends —
    * how jobs chain through storage (Jobs.scala's topology).
    */
  def dataPath: String

  /** Latest-wins logical rows (merge-on-read resolution included). */
  def readLogical(version: Option[Int] = None): DataFrame

  /** Append `df` as a new snapshot. The return value is informational
    * ([[GraftTable]] returns its [[CommitMeta]]); sinks discard it.
    */
  def append(df: DataFrame): Any

  /** Keyed latest-wins upsert of `batch` (S5). Informational return as
    * [[append]].
    */
  def upsert(batch: DataFrame): Any

  /** Highest micro-batch id committed for `sinkId`, −1 when none — the
    * read side of the exactly-once guard.
    */
  def lastCommittedBatch(sinkId: String): Long

  /** Run `body` (which must make at most ONE table commit) with
    * (`sinkId` → `batchId`) embedded atomically in that commit's
    * metadata, so a replayed micro-batch can never double-land.
    */
  def withSinkMark(sinkId: String, batchId: Long)(body: => Unit): Unit
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.functions.{AnnOps, BpeOps, CorpusOps, DedupOps, MultimodalOps, PrepOps, SearchOps, SketchOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the large-scale
  * pipeline extensions) is one named [[QueryDef]]: a Spark implementation
  * plus the DuckDB oracle SQL the driver verifies it against.
  */
object SparkEntry {

  /** Full operator registry. Order is presentation only. A duplicate
    * name would silently shrink the [[queries]] map (it is keyed by
    * name), so uniqueness is asserted at first use.
    */
  def registry: Seq[QueryDef] = {
    val r =
      RelationalOps.all ++ FunnelOps.all ++ WindowOps.all ++ SessionOps.all ++
        DedupOps.all ++ TextOps.all ++ PrepOps.all ++ SketchOps.all ++ CorpusOps.all ++ BpeOps.all ++ AnnOps.all ++
        SearchOps.all ++
        StorageOps.all ++ Scd2Ops.all ++ MaterializeOps.all ++ MultimodalOps.all ++
        RunnerOps.all ++ SqlSurfaceOps.all ++ RtbOracleOps.all ++ ExampleQueryOps.all ++
        DashboardOps.all ++ DqOps.all ++ TrinoViewOps.all ++
        graft.streaming.IngestOracleOps.all
    val dups = r.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names in registry: ${dups.mkString(", ")}")
    r
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Hourly funnel spine with guarded conversion rates — the reference's
    * signature aggregation shape (A5/A6/P11).
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.a5UnionSpine.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}

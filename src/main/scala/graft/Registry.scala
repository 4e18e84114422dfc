package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checked query: the Spark implementation plus the
  * ANSI-SQL equivalent the driver runs in DuckDB over the same parquet
  * tables. Column names/aliases MUST match between the two — the driver
  * sorts columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  def run(spark: SparkSession, dir: String): DataFrame = fn(spark, dir)
}

object QueryDef {
  def apply(name: String, oracle: String)(
      body: Tables => DataFrame): QueryDef =
    QueryDef(name, (s, d) => body(Tables(s, d)), Some(oracle))

  /** Non-SQL-expressible op: the driver records a weaker rows-only check. */
  def rowsOnly(name: String)(body: Tables => DataFrame): QueryDef =
    QueryDef(name, (s, d) => body(Tables(s, d)), None)
}

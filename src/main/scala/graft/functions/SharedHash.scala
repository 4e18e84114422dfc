package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Engine-portable deterministic 60-bit hash: first 15 hex chars of md5,
  * parsed base-16. Chosen because BOTH Spark and DuckDB can compute it
  * with built-ins, so every hash-based operator (minhash, simhash,
  * fingerprints, LSH) is oracle-checkable bit-for-bit:
  *   Spark : conv(substring(md5(x),1,15),16,10)::long
  *   DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT
  * 15 hex chars < 2^60, so the value is always a non-negative long.
  * md5 is codegen'd in Spark (no UDF) — stays inside WholeStageCodegen.
  */
object SharedHash {
  def h64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** DuckDB-SQL rendering of [[h64]] for oracle queries. */
  def h64Sql(x: String): String = s"('0x' || substr(md5($x), 1, 15))::BIGINT"
}

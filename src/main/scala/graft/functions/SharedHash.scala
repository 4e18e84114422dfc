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

  private val md = java.lang.ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** JVM-side [[h64]] for native expressions: first 60 bits of md5 — 15
    * hex chars are bytes 0–6 in full plus the high nibble of byte 7.
    * Bit-identical to the Column/SQL forms on the same UTF-8 bytes.
    */
  def h64Jvm(bytes: Array[Byte]): Long = h64Jvm(bytes, bytes.length)

  /** Prefix-length variant for callers assembling input in a reusable
    * buffer (no per-call copy).
    */
  def h64Jvm(bytes: Array[Byte], len: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, 0, len)
    val dig = d.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v << 4) | ((dig(7) & 0xf0L) >>> 4)
  }
}

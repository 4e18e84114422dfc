package graft.tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Partition transform — the declarative partition spec of a table,
  * mirroring the reference's Iceberg transforms (`day`, `hour`,
  * `identity`; iceberg/apply_tables.py:44-51). Each transform derives a
  * physical partition column (prefixed `p_`) from a logical source
  * column, so the source column itself stays in the data files (as
  * Iceberg metadata-partitioning does) and the logical schema survives a
  * write→read round trip unchanged.
  */
sealed trait PartitionTransform {
  def source: String

  /** Name of the derived physical partition column. */
  def name: String

  /** Expression computing the partition value from the source column. */
  def expr: Column

  /** Canonical serialized form (`day(ts)`, `bucket(16,term)`, …) — what
    * a commit json records so every data file's layout generation is
    * reconstructible after partition-spec evolution (Iceberg's
    * spec-id-per-manifest analog).
    */
  def ddl: String
}

object PartitionTransform {
  private val Bucket = """bucket\((\d+),([^)]+)\)""".r
  private val Fn = """(identity|day|hour)\(([^)]+)\)""".r

  def parse(s: String): PartitionTransform = s.trim match {
    case Bucket(n, c) => BucketTransform(c.trim, n.toInt)
    case Fn("identity", c) => IdentityTransform(c.trim)
    case Fn("day", c) => DayTransform(c.trim)
    case Fn("hour", c) => HourTransform(c.trim)
    case other => throw new IllegalArgumentException(s"bad partition transform: '$other'")
  }

  /** Round-trips [[ddl]]: empty string ⇒ unpartitioned. */
  def parseSpec(s: String): Seq[PartitionTransform] =
    if (s == null || s.trim.isEmpty) Nil
    else s.split(';').toSeq.map(parse)

  def specDdl(spec: Seq[PartitionTransform]): String = spec.map(_.ddl).mkString(";")
}

/** `identity(col)` — partition by the column value itself. */
final case class IdentityTransform(source: String) extends PartitionTransform {
  val name = s"p_$source"
  def expr: Column = col(source)
  def ddl: String = s"identity($source)"
}

/** `bucket(n, col)` — partition by a deterministic hash bucket of the
  * column (Iceberg's `bucket` transform): the layout for unbounded-
  * cardinality keys (terms, user ids), where `identity` would mint one
  * directory per distinct value. The hash is the repo's engine-portable
  * [[graft.functions.SharedHash.h64]], so a serving layer can compute a
  * literal's bucket DRIVER-SIDE ([[bucketOf]]) and prune the read to
  * the handful of bucket directories its keys hash into.
  */
final case class BucketTransform(source: String, n: Int) extends PartitionTransform {
  require(n > 0, s"bucket($source): bucket count must be positive")
  val name = s"p_${source}_bucket"
  // h64 is non-negative (60-bit), so % n is already in [0, n)
  def expr: Column =
    graft.functions.SharedHash.h64(col(source).cast("string")) % n

  /** Driver-side twin of [[expr]] for literal keys — bit-identical to
    * the Column form on the same UTF-8 bytes.
    */
  def bucketOf(value: String): Long =
    graft.functions.SharedHash.h64Jvm(value.getBytes("UTF-8")) % n

  def ddl: String = s"bucket($n,$source)"
}

/** `day(tsCol)` — daily partitions from a timestamp column. */
final case class DayTransform(source: String) extends PartitionTransform {
  val name = s"p_${source}_day"
  def expr: Column = to_date(col(source))
  def ddl: String = s"day($source)"
}

/** `hour(tsCol)` — hourly partitions, rendered as a sortable string so
  * directory listing order == time order.
  */
final case class HourTransform(source: String) extends PartitionTransform {
  val name = s"p_${source}_hour"
  def expr: Column = date_format(col(source), "yyyy-MM-dd-HH")
  def ddl: String = s"hour($source)"
}

/** Declarative table definition — the analog of one table YAML under
  * `iceberg/tables/` in the reference (apply_tables.py:75-136): logical
  * schema, partition spec, and identifier keys. `keys` empty ⇒ append
  * table; non-empty ⇒ keyed upsert table (reference
  * `write.upsert.enabled` + `identifier_fields`,
  * hourly_impressions_by_geo.yml:17-21).
  */
final case class TableDef(
    name: String,
    schema: StructType,
    partitions: Seq[PartitionTransform] = Nil,
    keys: Seq[String] = Nil,
    mergeOnRead: Boolean = false,
    sortOrder: Seq[String] = Nil) {
  require(keys.forall(k => schema.fieldNames.contains(k)),
    s"table $name: identifier keys must be schema columns")
  require(!mergeOnRead || keys.nonEmpty,
    s"table $name: mergeOnRead requires identifier keys")
  require(sortOrder.forall(c => schema.fieldNames.contains(c)),
    s"table $name: sort-order columns must be schema columns")
  def isUpsert: Boolean = keys.nonEmpty
}

package org.apache.spark.sql.avro

import org.apache.avro.Schema
import org.apache.spark.sql.types.{DataType, StructType}

/** Catalyst ⇄ Avro bridge for graft's wire-format expressions.
  *
  * Spark 4 ships the Avro row converters ([[AvroSerializer]],
  * [[AvroDeserializer]], [[SchemaConverters]]) inside spark-sql itself
  * (the file-format reader uses them), but scopes them `private[sql]`
  * and does NOT bundle the `from_avro`/`to_avro` connector expressions.
  * This shim — compiled into the avro package, mirroring the
  * GraftSqlBridge pattern — re-exposes exactly the four entry points
  * graft's native [[graft.sources.AvroEncode]]/[[graft.sources.AvroDecode]]
  * expressions need. Nothing here reimplements conversion logic; the
  * battle-tested Spark serializers do the work.
  */
object GraftAvroBridge {

  def serializer(catalystType: DataType, avro: Schema, nullable: Boolean): AvroSerializer =
    new AvroSerializer(catalystType, avro, nullable)

  /** Rebase CORRECTED (no legacy calendar), no stable-union ids, no
    * recursive schemas — none of which the OpenRTB wire records use.
    */
  def deserializer(avro: Schema, catalystType: DataType): AvroDeserializer =
    new AvroDeserializer(avro, catalystType, "CORRECTED", false, "", -1)

  def toSqlType(avro: Schema): DataType = SchemaConverters.toSqlType(avro).dataType

  /** Writer-schema derivation from a Catalyst struct. `withDefaults`
    * emits `"default": null` for every nullable field — required for a
    * schema meant to act as a BACKWARD-compatible READER (a reader field
    * absent from old writer bytes must have a default to fill).
    */
  def toAvroType(catalyst: StructType, recordName: String, nameSpace: String): Schema =
    SchemaConverters.toAvroType(catalyst, nullable = false, recordName, nameSpace)

  def toAvroTypeWithDefaults(catalyst: StructType): Schema =
    SchemaConverters.toAvroTypeWithDefaults(catalyst)
}

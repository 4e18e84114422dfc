package org.apache.spark.sql.execution.datasources.parquet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

/** Driver-side parquet writer for TINY, DRIVER-LOCAL row sets (a
  * watermark row, a bookkeeping upsert): the rows already live on the
  * driver, so a distributed write would pay a full Spark action —
  * analyze/optimize, a scheduled task, the Hadoop commit protocol, a
  * staging rename — to move a few hundred bytes. This writes the same
  * file through Spark's OWN [[ParquetWriteSupport]] (same package, the
  * conventional extension point), so every on-disk convention matches a
  * task-written file exactly: schema conversion, INT64
  * TIMESTAMP(MICROS), footer min/max statistics (the table layer's
  * metadata watermark reads depend on them), decimal/interval
  * encodings, and the spark metadata key.
  *
  * NOT a bulk path: callers gate it to LocalRelation inputs below a
  * small row bound (see GraftTable's write fast path). Distributed data
  * keeps the distributed writer.
  */
object GraftParquetBridge {

  private final class RowBuilder(path: Path)
      extends ParquetWriter.Builder[InternalRow, RowBuilder](path) {
    override def self(): RowBuilder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport().asInstanceOf[WriteSupport[InternalRow]]
  }

  /** Write `rows` (bound to `schema`, attribute order) as one parquet
    * file at `path`. `hadoopConf` must carry the session's SQL confs
    * (SessionState.newHadoopConf) — [[ParquetWriteSupport.init]] reads
    * legacy-format/timestamp-type/rebase settings from it exactly as a
    * write task would; the timestamp type is additionally pinned to
    * MICROS here because that is the graft table layer's write
    * discipline (usable footer stats), independent of the session
    * default.
    */
  def writeLocalFile(path: String, schema: StructType,
      rows: Iterator[InternalRow], hadoopConf: Configuration,
      codec: String): Unit = {
    val conf = new Configuration(hadoopConf)
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key, "false")
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key, "TIMESTAMP_MICROS")
    // newHadoopConf carries only EXPLICITLY-SET sql confs; the schema
    // converter reads these two with a bare .toBoolean, so their
    // session-effective values must be materialized (what
    // ParquetFileFormat.prepareWrite does for task-side writers)
    val sqlConf = SQLConf.get
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlConf.getConf(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED).toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlConf.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    val codecName = codec.trim.toUpperCase match {
      case "NONE" | "UNCOMPRESSED" => CompressionCodecName.UNCOMPRESSED
      case c =>
        try CompressionCodecName.valueOf(c)
        catch { case _: IllegalArgumentException => CompressionCodecName.SNAPPY }
    }
    val writer = new RowBuilder(new Path(path))
      .withConf(conf)
      .withCompressionCodec(codecName)
      .build()
    try rows.foreach(writer.write)
    finally writer.close()
  }
}

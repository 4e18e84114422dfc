package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** The source-facing seams of the wire-format ingestion (S1) —
  * PORTING.md §1. The reference's events arrive as Confluent-framed
  * Avro Kafka records; this environment has no Kafka jar (SURVEY §7.0),
  * so the in-repo implementations stage frames on disk / in memory.
  * A jar-equipped deployment swaps BOTH seams without touching the
  * ingestion statement set ([[graft.streaming.Jobs.wireIngestion]]):
  *
  *  - [[FrameSource]] → Spark's Kafka source:
  *    {{{
  *    spark.readStream.format("kafka")
  *      .option("kafka.bootstrap.servers", brokers)
  *      .option("subscribe", topic)
  *      .load()                       // carries `value: binary`
  *    }}}
  *  - [[SchemaRegistryClient]] → a REST client over the deployment's
  *    Schema Registry (`GET /subjects/<s>/versions/latest`,
  *    `GET /schemas/ids/<id>`); [[WireRegistry]] is the in-engine
  *    implementation with the same BACKWARD gate the reference
  *    configures (scripts/setup.sh:47-52).
  */
trait FrameSource {
  /** A STREAMING DataFrame of one topic's records, carrying at least
    * `value: binary` (the Confluent wire frame
    * `[0x00][4-byte BE schema id][avro body]`).
    */
  def frames(spark: SparkSession, topic: String): DataFrame
}

/** Frames staged as parquet under `root/<topic>/` — the file-stream
  * emulation used by tests and the oracle twins. Spark's file source
  * lists new files per micro-batch, so a writer staging frames and a
  * reader draining them behave like a (single-partition) topic.
  */
final class FileFrameSource(root: String) extends FrameSource {
  private val wireSchema = StructType(Seq(StructField("value", BinaryType)))
  override def frames(spark: SparkSession, topic: String): DataFrame =
    spark.readStream.schema(wireSchema).parquet(s"$root/$topic")
}

/** What the decode side needs from a schema registry: the latest
  * reader per subject and the id→writer-schema map frames resolve
  * against. [[WireRegistry]] implements it in-engine (registration and
  * the BACKWARD gate are implementation concerns — a Confluent-backed
  * client enforces compatibility server-side).
  */
trait SchemaRegistryClient {
  /** Latest (schema id, schema json) registered under `subject`. */
  def latest(subject: String): (Int, String)

  /** Every known id → writer schema json, across subjects. */
  def writers: Map[Int, String]
}

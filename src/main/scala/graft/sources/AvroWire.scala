package graft.sources

import java.io.ByteArrayOutputStream

import scala.collection.mutable

import org.apache.avro.{Schema, SchemaCompatibility}
import org.apache.avro.SchemaCompatibility.SchemaCompatibilityType
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.avro.GraftAvroBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}

/** The Avro wire-format leg of the ingestion sources (S1) — the last
  * structural piece of the reference's source of truth: every event
  * there is an Avro-with-Schema-Registry Kafka record
  * (schemas/avro/bid_request.avsc, create_tables.sql:17-82
  * `avro-confluent` format), with the registry enforcing BACKWARD
  * compatibility (scripts/setup.sh:47-52).
  *
  * Re-expressed Spark-first as two native codegen'd Catalyst
  * expressions over the standard Confluent wire frame
  * `[0x00 magic][4-byte BE schema id][avro binary body]`:
  *
  *  - [[AvroEncode]] — struct → framed bytes under a writer schema;
  *  - [[AvroDecode]] — framed bytes → struct: the frame id selects the
  *    WRITER schema, Avro schema resolution evolves the datum to the
  *    READER schema (new defaulted fields fill in, dropped fields skip)
  *    — exactly the Confluent consumer contract.
  *
  * [[WireRegistry]] is the in-engine registry: per-subject version
  * history with the BACKWARD gate (a new schema must be able to READ
  * the previous version's bytes) enforced at registration, mirroring
  * the reference's `PUT /config {"compatibility":"BACKWARD"}`.
  *
  * Scale: both expressions are pure per-row maps inside the scan
  * projection — no shuffle, no driver round-trips; the schema lookup is
  * a per-task map hit and the datum reader is cached per writer id.
  * That is the shape a 1000-executor Kafka source needs: decode cost
  * linear in bytes, schema resolution amortized to zero.
  */
object AvroWire {

  /** Derive a writer schema from a DataFrame's Catalyst schema. Nullable
    * fields get `"default": null`, so the SAME derivation also yields a
    * valid BACKWARD reader when fields are added.
    */
  def schemaFor(df: DataFrame): String =
    GraftAvroBridge.toAvroTypeWithDefaults(df.schema).toString

  def toWire(c: Column, schemaJson: String, schemaId: Int): Column =
    GraftSqlBridge.column(AvroEncode(GraftSqlBridge.expression(c), schemaJson, schemaId))

  def fromWire(c: Column, readerJson: String, writersById: Map[Int, String]): Column =
    GraftSqlBridge.column(AvroDecode(GraftSqlBridge.expression(c), readerJson, writersById))
}

/** struct → Confluent-framed Avro binary. The serializer is Spark's own
  * (shared with its Avro file format), so Catalyst values map to wire
  * bytes with the exact semantics `to_avro` would have.
  */
case class AvroEncode(child: Expression, schemaJson: String, schemaId: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a struct column, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "avro_encode"

  @transient private lazy val avroSchema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val serializer =
    GraftAvroBridge.serializer(child.dataType, avroSchema, child.nullable)
  @transient private lazy val datumWriter = new GenericDatumWriter[Any](avroSchema)
  @transient private lazy val baos = new ByteArrayOutputStream(256)
  @transient private var encoder: BinaryEncoder = _

  def encode(input: Any): Array[Byte] = {
    baos.reset()
    baos.write(0) // Confluent wire magic
    baos.write((schemaId >>> 24) & 0xff)
    baos.write((schemaId >>> 16) & 0xff)
    baos.write((schemaId >>> 8) & 0xff)
    baos.write(schemaId & 0xff)
    encoder = EncoderFactory.get().directBinaryEncoder(baos, encoder)
    datumWriter.write(serializer.serialize(input), encoder)
    encoder.flush()
    baos.toByteArray
  }

  override def nullSafeEval(input: Any): Any = encode(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // same pattern as Spark's own connector expressions: the expression
    // instance rides the references array, codegen calls straight into
    // it — the row stays inside WholeStageCodegen
    val ref = ctx.addReferenceObj("graftAvroEncode", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = (byte[]) $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): AvroEncode =
    copy(child = newChild)
}

/** Confluent-framed Avro binary → struct of the reader schema, with
  * writer→reader schema resolution per frame id.
  */
case class AvroDecode(child: Expression, readerJson: String, writersById: Map[Int, String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary column, got ${other.catalogString}")
  }
  override def dataType: DataType =
    GraftAvroBridge.toSqlType(new Schema.Parser().parse(readerJson))
  override def prettyName: String = "avro_decode"

  @transient private lazy val readerSchema = new Schema.Parser().parse(readerJson)
  @transient private lazy val deserializer =
    GraftAvroBridge.deserializer(readerSchema, dataType)
  @transient private lazy val readers =
    mutable.Map.empty[Int, GenericDatumReader[Any]]
  @transient private var decoder: BinaryDecoder = _

  def decode(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    require(bytes.length > 5 && bytes(0) == 0,
      "not a wire-framed Avro message (magic byte 0x00 + schema id missing)")
    val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    val datumReader = readers.getOrElseUpdate(id, {
      val writerJson = writersById.getOrElse(id,
        throw new IllegalArgumentException(s"unknown writer schema id $id"))
      // writer schema decodes the bytes, reader schema shapes the datum
      // (Avro resolution: defaulted reader fields fill, dropped skip)
      new GenericDatumReader[Any](new Schema.Parser().parse(writerJson), readerSchema)
    })
    decoder = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, decoder)
    deserializer.deserialize(datumReader.read(null, decoder)).getOrElse(null)
  }

  override def nullSafeEval(input: Any): Any = decode(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftAvroDecode", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${CodeGenerator.boxedType(dataType)}) $ref.decode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecode =
    copy(child = newChild)
}

/** In-engine schema registry: per-subject version chains, ids unique
  * across subjects (Confluent semantics), BACKWARD compatibility
  * enforced at registration — the new schema, acting as READER, must be
  * able to consume bytes written under the previous version; an
  * incompatible change (field type change, new field without default)
  * is rejected with the incompatibility list.
  */
final class WireRegistry extends SchemaRegistryClient {

  private var nextId = 1
  private val subjects = mutable.Map.empty[String, Vector[(Int, Schema)]]
  private val byId = mutable.Map.empty[Int, String]

  /** Register a schema under a subject, returning its id. Re-registering
    * a schema already in the subject's history returns the existing id.
    */
  def register(subject: String, schemaJson: String): Int = synchronized {
    val schema = new Schema.Parser().parse(schemaJson)
    val versions = subjects.getOrElse(subject, Vector.empty)
    versions.find(_._2 == schema).map(_._1).getOrElse {
      versions.lastOption.foreach { case (_, prev) =>
        val compat = SchemaCompatibility.checkReaderWriterCompatibility(schema, prev)
        if (compat.getType != SchemaCompatibilityType.COMPATIBLE)
          throw new IllegalArgumentException(
            s"BACKWARD compatibility violated for subject '$subject': " +
              compat.getResult.getIncompatibilities.toString)
      }
      val id = nextId
      nextId += 1
      subjects(subject) = versions :+ (id -> schema)
      byId(id) = schema.toString
      id
    }
  }

  /** Latest (id, schema) for a subject — what a consumer reads WITH. */
  def latest(subject: String): (Int, String) = synchronized {
    val (id, s) = subjects(subject).last
    (id, s.toString)
  }

  /** id → schema across all subjects — what [[AvroDecode]] resolves
    * frame ids against.
    */
  def writers: Map[Int, String] = synchronized(byId.toMap)
}

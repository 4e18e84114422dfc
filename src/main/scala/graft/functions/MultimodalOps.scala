package graft.functions

import graft.QueryDef
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support: media (image/audio/video) as opaque
  * `binary` payloads with typed metadata, plus a feature-extraction
  * pipeline whose DECODE STEP IS A DETERMINISTIC STUB — the image/audio
  * codec libraries are not in this environment, so the codec call is
  * isolated behind [[StubDecoder]] and everything AROUND it (schema,
  * partition-batched execution, feature shapes) is real and tested.
  *
  * Execution shape: [[extractFeatures]] runs via `mapPartitions` on a
  * typed Dataset — one JVM call per PARTITION (the Scala analog of
  * Python's `mapInPandas` batch contract), so a real decoder would
  * amortize model/codec init across the partition exactly like a Pandas
  * UDF batch. No shuffle: feature extraction is a pure map, and at
  * 100 TB it scales with input splits.
  */
object MultimodalOps {

  /** An opaque media payload + typed metadata (the reference pattern of
    * a binary column with companion metadata columns).
    */
  final case class MediaAsset(
      asset_id: Long,
      media_type: String, // "image" | "audio"
      width: Int,
      height: Int,
      payload: Array[Byte])

  final case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Int,
      mean_byte: Double,
      feature: Seq[Float])

  /** THE STUB: stands in for the real codec (JPEG decode, resample,
    * etc.). Deterministic byte-fold so tests are exact; swap this single
    * function for a real decoder in a full deployment.
    */
  object StubDecoder {
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val acc = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        acc(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      acc
    }
  }

  /** Partition-batched feature extraction (mapInPandas-shaped). */
  def extractFeatures(assets: Dataset[MediaAsset], dim: Int)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.mapPartitions { batch =>
      // real decoder init would happen ONCE here, per partition
      batch.map { a =>
        val n = a.payload.length
        val mean =
          if (n == 0) 0.0
          else a.payload.foldLeft(0L)((s, b) => s + (b & 0xff)).toDouble / n
        MediaFeatures(a.asset_id, a.media_type, n,
          math.rint(mean * 10000) / 10000,
          StubDecoder.features(a.payload, dim).toSeq)
      }
    }
  }

  /** Resize (stub): the codec resample is a deterministic stride-sample
    * of the payload to `w*h` bytes; the REAL parts are the metadata
    * rewrite (width/height must follow the new payload) and the
    * partition-batched pure-map execution — swap the byte loop for a
    * bilinear resample and nothing around it changes.
    */
  def resize(assets: Dataset[MediaAsset], w: Int, h: Int)(
      implicit spark: SparkSession): Dataset[MediaAsset] = {
    import spark.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        val out = new Array[Byte](w * h)
        val n = a.payload.length
        var i = 0
        while (i < out.length) {
          out(i) = if (n == 0) 0 else a.payload((i.toLong * n / out.length).toInt)
          i += 1
        }
        a.copy(width = w, height = h, payload = out)
      }
    }
  }

  final case class VideoFrames(
      asset_id: Long,
      n_frames: Int,
      frames: Seq[Array[Byte]])

  /** Frame sampling (stub): treat the payload as fixed-size frame blocks
    * and keep every `everyK`-th — the array-of-binary schema, the
    * per-partition batch shape, and the downstream `explode(frames)` are
    * the real plumbing a video pipeline needs; the block split stands in
    * for the container demux.
    */
  def sampleFrames(assets: Dataset[MediaAsset], frameBytes: Int, everyK: Int)(
      implicit spark: SparkSession): Dataset[VideoFrames] = {
    import spark.implicits._
    require(frameBytes > 0 && everyK > 0)
    assets.mapPartitions { batch =>
      batch.map { a =>
        val frames = a.payload.grouped(frameBytes).zipWithIndex
          .collect { case (f, i) if i % everyK == 0 => f }.toSeq
        VideoFrames(a.asset_id, frames.size, frames)
      }
    }
  }

  /** Binary-column plumbing, oracle-checked: text encoded to a binary
    * payload, then byte length + an engine-portable digest computed ON
    * the binary value (Spark side; DuckDB's md5 only takes VARCHAR, but
    * hashing the string hashes the identical UTF-8 bytes) — proves
    * binary columns flow through projection and hashing identically.
    */
  val mmBinaryMeta: QueryDef = QueryDef(
    "mm_binary_meta",
    s"""SELECT doc_id,
       |       octet_length(encode(text)) AS n_bytes,
       |       ${SharedHash.h64Sql("text")} AS payload_hash,
       |       CASE WHEN octet_length(encode(text)) >= 1048576 THEN 'large'
       |            WHEN octet_length(encode(text)) >= 1024 THEN 'medium'
       |            ELSE 'small' END AS size_class
       |FROM documents""".stripMargin) { t =>
    val payload = encode(col("text"), "UTF-8")
    t.documents.select(
      col("doc_id"),
      octet_length(payload).as("n_bytes"),
      SharedHash.h64(payload).as("payload_hash"),
      when(octet_length(payload) >= 1048576, "large")
        .when(octet_length(payload) >= 1024, "medium")
        .otherwise("small").as("size_class"))
  }

  val all: Seq[QueryDef] = Seq(mmBinaryMeta)
}

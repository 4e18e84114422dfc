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
      sum_byte: Long, // exact byte sum — the oracle-checkable integer form
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
        val sum = a.payload.foldLeft(0L)((s, b) => s + (b & 0xff))
        val mean = if (n == 0) 0.0 else sum.toDouble / n
        MediaFeatures(a.asset_id, a.media_type, n, sum,
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

  /** Deterministic asset table derived from `documents`: the UTF-8 text
    * bytes ARE the payload. The testdata text is pure ASCII (asserted at
    * every SF), so a byte slice of the payload equals a substring of the
    * text — which is what lets DuckDB recompute the stub codec's output
    * and hash-match binary transforms it could never express natively.
    */
  private def assetsOf(t: graft.Tables): Dataset[MediaAsset] = {
    import t.spark.implicits._
    t.documents.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("media_type"),
      length(col("text")).cast("int").as("width"),
      lit(1).as("height"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaAsset]
  }

  /** Resize through the REAL partition-batched path, oracle-checked: the
    * stub stride-resample `out(i) = payload[i*n/128]` is re-derived by
    * DuckDB as substring arithmetic and the resized payloads hash-match
    * bit-for-bit — metadata rewrite, binary flow, and the mapPartitions
    * execution are all value-verified, only the codec math is a stand-in.
    */
  val mmResize: QueryDef = QueryDef(
    "mm_resize",
    s"""WITH r AS (SELECT doc_id AS asset_id, length(text) AS n,
       |                  array_to_string(list_transform(range(0, 128),
       |                    i -> substr(text, CAST(i * length(text) // 128 AS INTEGER) + 1, 1)),
       |                    '') AS rp
       |           FROM documents)
       |SELECT asset_id, 16 AS width, 8 AS height,
       |       octet_length(encode(rp)) AS n_bytes,
       |       ${SharedHash.h64Sql("rp")} AS payload_hash
       |FROM r WHERE n > 0""".stripMargin) { t =>
    implicit val spark: SparkSession = t.spark
    // empty payloads are excluded on BOTH sides: the stub zero-fills
    // w*h bytes where the substring oracle yields '', and what a real
    // codec does with a zero-byte input is codec-defined anyway
    resize(assetsOf(t).filter(length(col("text")) > 0), 16, 8)
      .select(col("asset_id"), col("width"), col("height"),
        octet_length(col("payload")).as("n_bytes"),
        SharedHash.h64(col("payload")).as("payload_hash"))
  }

  /** Frame sampling through the REAL path, oracle-checked: fixed 32-byte
    * frame blocks, every 2nd kept, exploded to one row per kept frame;
    * DuckDB recomputes each frame as a substring and both the per-frame
    * hashes and the kept-count metadata must match exactly.
    */
  val mmFrameSample: QueryDef = QueryDef(
    "mm_frame_sample",
    s"""WITH f AS (SELECT doc_id AS asset_id, length(text) AS n,
       |                  (length(text) + 31) // 32 AS n_chunks
       |           FROM documents),
       |k AS (SELECT asset_id, n,
       |             CAST((n_chunks + 1) // 2 AS INTEGER) AS n_frames,
       |             unnest(list_filter(range(0, n_chunks), i -> i % 2 = 0)) AS i
       |      FROM f),
       |fr AS (SELECT k.asset_id, k.n_frames, CAST(k.i AS INTEGER) AS frame_idx,
       |              substr(d.text, CAST(k.i * 32 AS INTEGER) + 1, 32) AS frame
       |       FROM k JOIN documents d ON d.doc_id = k.asset_id)
       |SELECT asset_id, n_frames, frame_idx,
       |       octet_length(encode(frame)) AS frame_bytes,
       |       ${SharedHash.h64Sql("frame")} AS frame_hash
       |FROM fr""".stripMargin) { t =>
    implicit val spark: SparkSession = t.spark
    sampleFrames(assetsOf(t), frameBytes = 32, everyK = 2)
      .select(col("asset_id"), col("n_frames"),
        posexplode(col("frames")).as(Seq("pos", "frame")))
      .select(col("asset_id"), col("n_frames"),
        (col("pos") * 2).as("frame_idx"),
        octet_length(col("frame")).as("frame_bytes"),
        SharedHash.h64(col("frame")).as("frame_hash"))
  }

  /** Feature extraction through the REAL partition-batched path,
    * metadata oracle-checked: byte count and EXACT byte sum survive the
    * typed mapPartitions round trip and must match DuckDB's code-point
    * sum (ASCII text ⇒ code point == byte). The float feature vector
    * and the rounded mean stay spec-tested only — cross-engine float
    * accumulation and rint-vs-round half-even semantics don't warrant
    * an exactness contract.
    */
  val mmFeatures: QueryDef = QueryDef(
    "mm_features",
    """SELECT doc_id AS asset_id,
      |       CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
      |       octet_length(encode(text)) AS n_bytes,
      |       CAST(coalesce(list_sum(list_transform(range(1, length(text) + 1),
      |              i -> ord(substr(text, CAST(i AS INTEGER), 1)))), 0) AS BIGINT) AS sum_byte
      |FROM documents""".stripMargin) { t =>
    implicit val spark: SparkSession = t.spark
    extractFeatures(assetsOf(t), dim = 8)
      .select(col("asset_id"), col("media_type"), col("n_bytes"), col("sum_byte"))
  }

  val all: Seq[QueryDef] = Seq(mmBinaryMeta, mmResize, mmFrameSample, mmFeatures)
}

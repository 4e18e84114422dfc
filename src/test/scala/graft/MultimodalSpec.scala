package graft

import graft.functions.MultimodalOps
import graft.functions.MultimodalOps.{MediaAsset, StubDecoder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: binary payloads + metadata survive a typed
  * round trip, and the partition-batched feature extraction produces
  * deterministic, correctly-shaped features (the decode step itself is
  * the documented stub).
  */
class MultimodalSpec extends AnyFunSuite {
  implicit lazy val spark = SparkTestSession.spark

  private def mkAssets(n: Int): Seq[MediaAsset] =
    (0 until n).map { i =>
      val payload = Array.tabulate[Byte](64 + i * 17)(j => ((i * 31 + j * 7) % 251).toByte)
      MediaAsset(i.toLong, if (i % 3 == 0) "audio" else "image", 320 + i, 240 + i, payload)
    }

  test("binary payload + metadata round-trips through a typed Dataset and parquet") {
    import spark.implicits._
    val assets = mkAssets(20)
    val ds = spark.createDataset(assets)
    val dir = java.nio.file.Files.createTempDirectory("graft_mm").toString + "/assets"
    ds.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[MediaAsset].collect().sortBy(_.asset_id)
    assert(back.length == 20)
    assert(back.zip(assets).forall { case (b, a) =>
      java.util.Arrays.equals(b.payload, a.payload) && b.media_type == a.media_type
    })
  }

  test("partition-batched feature extraction is deterministic with correct shape") {
    import spark.implicits._
    val assets = mkAssets(50)
    val ds = spark.createDataset(assets).repartition(4)
    val feats = MultimodalOps.extractFeatures(ds, dim = 8).collect().sortBy(_.asset_id)
    assert(feats.length == 50)
    assert(feats.forall(_.feature.size == 8))
    // exact agreement with a driver-side reference computation
    val expected = assets.map(a => a.asset_id -> StubDecoder.features(a.payload, 8).toSeq).toMap
    assert(feats.forall(f => f.feature == expected(f.asset_id)))
    assert(feats.forall(f => f.n_bytes == assets(f.asset_id.toInt).payload.length))
    // pure map: no shuffle exchange in the plan
    val plan = MultimodalOps.extractFeatures(ds, 8).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"feature extraction must not shuffle:\n$plan")
  }

  test("resize rewrites payload and metadata consistently") {
    import spark.implicits._
    val ds = spark.createDataset(mkAssets(20)).repartition(3)
    val resized = MultimodalOps.resize(ds, w = 16, h = 8).collect().sortBy(_.asset_id)
    assert(resized.length == 20)
    assert(resized.forall(a => a.width == 16 && a.height == 8 && a.payload.length == 16 * 8))
    // deterministic: same input → same bytes
    val again = MultimodalOps.resize(ds, 16, 8).collect().sortBy(_.asset_id)
    assert(resized.zip(again).forall { case (a, b) =>
      java.util.Arrays.equals(a.payload, b.payload)
    })
  }

  test("frame sampling produces array-of-binary rows that explode downstream") {
    import spark.implicits._
    val assets = mkAssets(12)
    val ds = spark.createDataset(assets)
    val sampled = MultimodalOps.sampleFrames(ds, frameBytes = 32, everyK = 2)
    val got = sampled.collect().sortBy(_.asset_id)
    assert(got.forall { v =>
      val total = (assets(v.asset_id.toInt).payload.length + 31) / 32
      v.n_frames == (total + 1) / 2 && v.frames.size == v.n_frames
    })
    // the array<binary> column must survive explode + aggregation
    val exploded = sampled.toDF()
      .select(col("asset_id"), explode(col("frames")).as("frame"))
      .groupBy(col("asset_id")).agg(count(lit(1)).as("n"),
        sum(octet_length(col("frame"))).as("bytes"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.forall(v => exploded(v.asset_id)._1 == v.n_frames &&
      exploded(v.asset_id)._2 == v.frames.map(_.length.toLong).sum))
  }
}

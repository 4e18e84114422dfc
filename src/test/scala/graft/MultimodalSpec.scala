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
}

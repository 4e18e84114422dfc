package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-occupancy guarantees of the near-dup path — the
  * all-pairs-within-bucket blowup is the classic LSH failure mode at
  * corpus scale, and these are the bounds that keep it from happening:
  * exact-dup collapse ahead of banding in the cluster path, the
  * per-bucket pair-generation cap in the pair path, and the honesty
  * check that gate-corpus occupancy never comes near that cap.
  */
class DedupSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val hotN = 2000
  private val hotBase = 5000000L

  /** sf0.001 corpus plus a hot band of [[hotN]] byte-identical docs. */
  private def hotCorpus = {
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val hotText = Seq.fill(40)("the same sentence repeated enough times to shingle")
      .mkString(" ")
    val hot = (0 until hotN).map(i => (hotBase + i, hotText))
      .toDF("doc_id", "text")
    base.unionByName(hot)
  }

  test("hot band of identical docs collapses to one rep before banding") {
    // uncapped all-pairs banding over the hot band alone would generate
    // C(2000,2) ≈ 2M candidates; after the exact collapse the rep table
    // carries ONE vertex for the whole band, so cluster-path candidate
    // volume stays what the background corpus alone produces
    val hv = DedupOps.hashedShingles(hotCorpus).localCheckpoint()
    val reps = hv.groupBy(col("hv")).agg(min(col("doc_id")).as("doc_id"))
    val nReps = reps.count()
    assert(nReps < 520, s"expected ~500 reps (hot band = 1), got $nReps")
    val nPairs = DedupOps.verifiedPairsHv(reps.localCheckpoint()).count()
    assert(nPairs < 200,
      s"rep-graph pair volume must stay at background-corpus level, got $nPairs")
  }

  test("hot-band clusters resolve to one canonical row, O(k) output") {
    val out = DedupOps.clusterDocs(hotCorpus)
      .filter(col("doc_id") >= hotBase).cache()
    assert(out.count() == hotN)
    // every hot doc lands in the cluster of the smallest hot doc_id
    // (no sf0.001 doc matches the synthetic hot text)
    assert(out.filter(col("cluster_id") === hotBase).count() == hotN,
      "all identical docs must share the min-id cluster")
    assert(out.filter(col("is_canonical")).count() == 1,
      "exactly one canonical row per exact-dup cluster")
    out.unpersist()
  }

  test("pair generation is capped per bucket; gate corpus sits far below the cap") {
    // the engine-side cap truncates a mega-bucket's expansion to the cap
    // smallest ids — C(cap, 2) pairs instead of C(k, 2). With identical
    // docs every band key collides, so the uncapped hot band would emit
    // ~2M candidate pairs; with cap=64 it must emit exactly C(64,2)
    val hv = DedupOps.hashedShingles(hotCorpus).localCheckpoint()
    val sig = hv.select(col("doc_id"), DedupOps.sigColHv.as("sig"))
    val capped = DedupOps.bandPairs(sig, cap = 64)
      .filter(col("doc_a") >= hotBase && col("doc_b") >= hotBase).count()
    assert(capped == 64L * 63 / 2,
      s"cap=64 must bound hot-band pair generation to C(64,2), got $capped")
    // honesty of the uncapped oracle at gate scale: max band-bucket
    // occupancy in the real sf0.01 corpus must sit far below the default
    // 1024 cap, so the cap is a no-op where the oracle runs
    val sf01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val maxOcc = DedupOps
      .hashedShingles(sf01.select(col("doc_id"), col("text")))
      .select(col("doc_id"), DedupOps.sigColHv.as("sig"))
      .select(explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("band"),
          concat_ws("-", transform(slice(col("sig"), b * lit(4) + 1, lit(4)),
            v => v.cast("string"))).as("key")))).as("bk"))
      .groupBy(col("bk.band"), col("bk.key")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(maxOcc <= 64,
      s"sf0.01 max bucket occupancy $maxOcc must sit far below the 1024 cap")
  }
}

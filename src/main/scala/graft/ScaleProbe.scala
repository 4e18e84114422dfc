package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical scaling probe for the dedup/near-dup/cluster path — the
  * operators whose 100 TB behavior rests on analytic claims (bounded
  * bucket occupancy, O(candidates) verify, O(log d) CC rounds). The
  * probe builds k-replica corpora from the sf0.1 documents and measures
  * the wall time of each pipeline stage at 1×, 3×, and 10×; near-linear
  * growth is the empirical check on those claims (results recorded in
  * SCALING.md).
  *
  * Replication model: copy c prefixes every word with `c<c>_`, so every
  * shingle/word hash differs across copies — no cross-copy near-dups —
  * while each copy reproduces the original's internal near-dup
  * structure exactly. Corpus size, true-pair count, and cluster count
  * all scale by k, which is precisely the "same data distribution,
  * k× the volume" regime a scale-up claim is about. (Naive
  * concatenation of identical copies would instead make every document
  * a 10-clone — pair volume ~45× per doc — a different, degenerate
  * problem.)
  *
  * Usage: `sbt "runMain graft.ScaleProbe"` (optional args: sfDir outRoot).
  */
object ScaleProbe {

  private def buildReplica(spark: SparkSession, sfDir: String, out: String, k: Int): Unit = {
    if (Files.exists(Paths.get(s"$out/documents.parquet"))) return
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = base.count()
    val copies = (0 until k).map { c =>
      val text = concat_ws(" ",
        transform(split(col("text"), " "), w => concat(lit(s"c${c}_"), w)))
      base.select(
        (col("doc_id") + lit(c * 10_000_000L)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"),
        length(text).as("n_chars"))
    }
    copies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"built ${k}x corpus at $out (${n * k} docs)")
  }

  /** One warm-up pass (codegen/JIT/scan cache), then the timed run —
    * without it the 1× numbers absorb all JIT cost and the curve reads
    * as impossibly sublinear.
    */
  private def timed[A](label: String)(f: => A): (String, Double) = {
    f
    val t0 = System.nanoTime()
    f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"  $label%-22s $s%8.2f s")
    label -> s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outRoot = if (args.length > 1) args(1) else "/tmp/graft_scale"
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")

    val stages = Seq[(String, Tables => org.apache.spark.sql.DataFrame)](
      "dedup_exact" -> (t => functions.DedupOps.dedupExact.fn(t.spark, t.dir)),
      "dedup_minhash_lsh" -> (t => functions.DedupOps.dedupMinhashLsh.fn(t.spark, t.dir)),
      "dedup_ngram_jaccard" -> (t => functions.DedupOps.dedupNgramJaccard.fn(t.spark, t.dir)),
      "dedup_simhash_pairs" -> (t => functions.DedupOps.dedupSimhashPairs.fn(t.spark, t.dir)),
      "dedup_clusters" -> (t => functions.DedupOps.dedupClusters.fn(t.spark, t.dir)))

    // sf0.1 is only 5k docs — the 1×..10× range turned out to be fully
    // overhead-dominated on local[32] (flat ~0.3-3 s per stage), so the
    // probe climbs to 30×/100× (150k/500k docs) where real work shows
    val results = for (k <- Seq(1, 10, 30, 100)) yield {
      val dir = if (k == 1) sfDir else s"$outRoot/x$k"
      if (k > 1) buildReplica(spark, sfDir, dir, k)
      println(s"== ${k}x ==")
      k -> stages.map { case (label, fn) =>
        timed(label)(fn(Tables(spark, dir)).count())
      }
    }

    println("\n| stage | " + results.map(r => s"${r._1}x").mkString(" | ") + " |")
    val labels = stages.map(_._1)
    for ((label, i) <- labels.zipWithIndex)
      println(s"| $label | " +
        results.map(r => f"${r._2(i)._2}%.2f s").mkString(" | ") + " |")
    spark.stop()
  }
}

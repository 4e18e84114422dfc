package graft

/** Benchmark main. Runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall seconds. A query that throws
  * is recorded with `"failed":true` and its elapsed time EXCLUDED from the
  * total (a broken query must not "improve" the bench), and the process
  * exits nonzero so the driver sees the failure.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get(cpus)
    val sc = spark.sparkContext
    // Deterministic order; warm the session once so the first measured
    // query doesn't pay JVM/parquet-footer warm-up, and pre-generate the
    // RTB oracle fixture so no rtb_*/v_* query pays one-time generation
    // inside its timed window (it is a pure function of the seed — on a
    // fresh machine the first caller otherwise eats the full write).
    // SPARK_GRAFT_ONLY (regex) narrows the run for local A/B — per-query
    // timing in one JVM is the only comparison that beats the ±15%
    // between-run noise.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val defs = SparkEntry.registry.sortBy(_.name)
      .filter(q => only.forall(_.findFirstIn(q.name).isDefined))
    Tables(spark, sfDir).lineitem.count()
    if (defs.exists(d => graft.operators.RtbOracleOps.all.exists(_.name == d.name)))
      graft.operators.RtbOracleOps.warm(spark)

    // Per-query state hygiene, OUTSIDE the timed window (replaces the old
    // System.gc()+sleep(250) tick, which masked the debt rather than
    // retiring it and made builder and driver runs disagree by ~1.35x).
    // Order matters: the BLOCKING RDD-level unpersist runs FIRST — it
    // covers cached Datasets' underlying RDDs and localCheckpoint blocks
    // alike, and blocking is what makes the drop land before the next
    // timed window (this Spark's no-arg CacheManager.clearCache() issues
    // ASYNC block removals, which would leak eviction work into the next
    // query). clearCache() then reconciles the CacheManager registry so
    // no dead InMemoryRelation entry can silently un-cache a later
    // equivalent plan; its own unpersists are no-ops by then.
    def drainState(): Unit = {
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sharedState.cacheManager.clearCache()
      if (sc.getPersistentRDDs.nonEmpty)
        // warn, don't abort: a leak taints timings but the per-query
        // record is still worth emitting for the round
        System.err.println(s"[bench] WARNING: ${sc.getPersistentRDDs.size} " +
          "persistent RDDs survived a blocking drain")
    }

    // Force FULL output materialization with the noop sink, not count():
    // count() lets Catalyst optimize the counting plan — a query ending
    // in a LEFT JOIN against an aggregate keyed uniquely (the
    // per-doc-diagnostics tail several corpus operators share) has the
    // join ELIMINATED and the whole pipeline pruned to a metadata scan,
    // so the recorded time measures nothing (observed: substring-span
    // dedup flat at 0.2 s from 1x to 100x corpus). The noop sink
    // consumes every output row and column — what a real consumer pays
    // — with no write cost.
    val results = defs.map { q =>
      drainState()
      val t0 = System.nanoTime()
      val ok =
        try {
          q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
            false
        }
      (q.name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s""""$k"""" }
      .mkString("[", ",", "]")
    val nFailed = results.count(!_._3)
    val total = results.collect { case (_, v, true) => v }.sum
    // "harness":"noop-sink" marks the round-8 action change (count() →
    // full noop-sink materialization): numbers before the mark
    // undercount any query whose tail Catalyst could prune under
    // count(), so cross-round per-query ratios are only meaningful
    // within the same harness mark.
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","harness":"noop-sink","queries":$qs,"sf":"$sfDir","n_queries":${results.size},"failed":$failed}"""
    println(json)
    // Also write the full record to a COMMITTED artifact: the driver's
    // stdout scrape truncates long tails (round 5 lost the first
    // queries, round 8 kept only ~75 of 126 per-query times), so
    // cross-round A/Bs need a file that always carries the complete
    // map. Stdout stays the contract; BENCH_FULL.json is the
    // untruncated copy, tracked in git so every round's full per-query
    // record survives in history.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "BENCH_FULL.json")), json + "\n")
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.get(cpus)
    new java.io.File(outDir).mkdirs()
    val failed = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // same per-query hygiene as Bench (same order: blocking RDD
        // unpersist first, then CacheManager registry reconciliation)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.sharedState.cacheManager.clearCache()
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name)
      }
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      oracleJson(SparkEntry.oracleSql))
    spark.stop()
    // a query that fails to dump would otherwise just VANISH from the
    // round's correctness record (round 6 lost 24 rows with no err entry)
    // — exit nonzero and name them so the shrink is loud
    if (failed.nonEmpty) {
      System.err.println(
        s"[verify] ${failed.size} of ${SparkEntry.queries.size} queries failed to dump: ${failed.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private[graft] def oracleJson(m: Map[String, String]): String =
    m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
}

/** Single-query iteration loop: dump ONLY the named queries (plus an
  * oracle_sql.json restricted to them) so tools/compare_oracle.py checks
  * just those — a full Verify over all registered queries takes minutes,
  * which is the wrong inner loop when developing one operator.
  *
  * Usage: runMain graft.DevVerify <sfDir> <outDir> <q1,q2,...>
  */
object DevVerify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, qlist) = args
    val names = qlist.split(",").toSeq
    val defs = names.map(n => SparkEntry.registry.find(_.name == n)
      .getOrElse(sys.error(s"unknown query: $n")))
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    defs.foreach { d =>
      d.run(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/${d.name}")
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      Verify.oracleJson(defs.flatMap(d => d.oracle.map(d.name -> _)).toMap))
    spark.stop()
  }
}

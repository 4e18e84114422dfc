package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession =
    GraftSession.builder("local[4]", 4).appName("graft-test").getOrCreate()
}

/** Smoke + semantic checks for every registered query at sf0.001.
  * (Value-level correctness is the driver's DuckDB oracle gate; these
  * tests guard schema wiring, non-emptiness, and key invariants.)
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("registry names are unique and every oracle has a query") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.queries.size == SparkEntry.registry.size,
      "queries map silently dropped a registry entry")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name} runs and returns rows") {
      val df = q.run(spark, sf)
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }

  test("SqlRunner SET statements do not leak into the caller's session") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val out = SqlRunner.run(spark, sf,
      s"SET $key=7;\nSELECT count(*) AS n FROM region")
    assert(out.collect().head.getLong(0) > 0)
    assert(spark.conf.get(key) == before,
      "script conf changes must stay scoped to the script's session")
  }

  test("funnel counts are monotone: views >= clicked >= converted") {
    import org.apache.spark.sql.functions._
    val df = operators.FunnelOps.j7FunnelChain.run(spark, sf)
    val bad = df.filter(col("n_views") < col("n_clicked_views") ||
      col("n_clicked_views") < col("n_converted_views")).count()
    assert(bad == 0)
  }

  test("guarded ratios are non-negative and zero when denominator is zero") {
    import org.apache.spark.sql.functions._
    val df = operators.FunnelOps.a6FunnelLeakage.run(spark, sf)
    assert(df.filter(col("click_rate") < 0 || col("purchase_rate") < 0).count() == 0)
    assert(df.filter(col("views") === 0 && col("click_rate") =!= 0.0).count() == 0)
  }

  test("ann: lsh top-1 never beats brute top-1; ranks contiguous from 1") {
    import org.apache.spark.sql.functions._
    val brute = functions.AnnOps.annBruteTopk.run(spark, sf)
    val lsh = functions.AnnOps.annLshTopk.run(spark, sf)
    val b1 = brute.filter(col("rnk") === 1)
      .select(col("query_id"), col("cos_sim").as("b_sim"))
    val l1 = lsh.filter(col("rnk") === 1)
      .select(col("query_id"), col("cos_sim").as("l_sim"))
    assert(b1.join(l1, "query_id").filter(col("l_sim") > col("b_sim")).count() == 0)
    for (df <- Seq(brute, lsh)) {
      val bad = df.groupBy(col("query_id"))
        .agg(count(lit(1)).as("n"), max(col("rnk")).as("mx"))
        .filter(col("n") =!= col("mx")).count()
      assert(bad == 0, "ranks must be contiguous 1..n per query")
    }
  }

  test("ANN recall@5 vs brute force: multiprobe >= single-bucket, both non-degenerate") {
    import org.apache.spark.sql.functions._
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("query_id"), col("vec_id")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val brute = topSets(functions.AnnOps.annBruteTopk.run(spark, sf))
    def recall(approx: Map[Long, Set[Long]]): Double =
      brute.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }.sum / brute.size
    val rLsh = recall(topSets(functions.AnnOps.annLshTopk.run(spark, sf)))
    val rMulti = recall(topSets(functions.AnnOps.annLshMultiprobe.run(spark, sf)))
    val rIvf = recall(topSets(functions.AnnOps.annIvfTopk.run(spark, sf)))
    val rPq = recall(topSets(functions.AnnOps.annPqAdc.run(spark, sf)))
    val rIvfPq = recall(topSets(functions.AnnOps.annIvfPq.run(spark, sf)))
    info(f"recall@5: lsh=$rLsh%.2f multiprobe=$rMulti%.2f ivf=$rIvf%.2f pq=$rPq%.2f ivfpq=$rIvfPq%.2f")
    // widening the probe set can only add candidates — recall is monotone
    assert(rMulti >= rLsh)
    // the buckets must actually carry signal, not return arbitrary vectors
    assert(rLsh >= 0.2 && rMulti >= 0.3 && rIvf >= 0.3,
      f"degenerate ANN recall: lsh=$rLsh%.2f multi=$rMulti%.2f ivf=$rIvf%.2f")
    // PQ ranks by compressed L2, recall measured against exact cosine —
    // lossy twice over, so the bar is non-degeneracy, not parity
    assert(rPq >= 0.15, f"degenerate PQ recall: $rPq%.2f")
    // IVF-PQ compounds cell pruning and compression: its candidate set
    // is IVF's, so it cannot beat IVF; it must still carry signal
    assert(rIvfPq >= 0.1 && rIvfPq <= rIvf + 1e-9,
      f"ivfpq recall out of range: $rIvfPq%.2f (ivf=$rIvf%.2f)")
  }

  test("row_number dedup yields one row per (user_id, event_type)") {
    import org.apache.spark.sql.functions._
    val df = operators.WindowOps.wDedupRownum.run(spark, sf)
    val dups = df.groupBy(col("user_id"), col("event_type")).count()
      .filter(col("count") > 1).count()
    assert(dups == 0)
  }
}

package graft.functions

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch guarantees a hash-compare can't express: HLL estimation
  * error against the exact cardinality, and count-min's one-sided
  * overcount bound.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("hll estimate within 15% of exact distinct in its validity regime") {
    // the operator emits the RAW estimator (no linear-counting small-range
    // correction: a cross-engine ln() could flip the floored estimate by
    // one ulp and break the hash gate), so the standard HLL accuracy
    // claim applies where n > 2.5·m = 640; below that only a loose
    // factor-2 sanity bound holds (sf0.001 sits there, n ≈ 200/type)
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val est = SketchOps.hllDistinct.run(spark, sf)
        .select(col("event_type"), col("hll_est")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = Tables(spark, sf).events
        .groupBy(col("event_type"))
        .agg(countDistinct(col("event_id")).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      for ((k, n) <- exact) {
        val rel = math.abs(est(k) - n).toDouble / n
        if (n > 640) assert(rel < 0.15, s"$sf $k: est ${est(k)} vs exact $n (rel $rel)")
        else assert(rel < 1.0, s"$sf $k (small-range): est ${est(k)} vs exact $n")
      }
    }
  }

  test("hll registers are merge-consistent: union of halves == whole") {
    // the mergeable-sketch property that makes HLL work as a partial
    // aggregate: max-merging two half-corpus register sets must give the
    // whole-corpus registers (here via the s_scaled harmonic sums)
    val sf = "/root/testdata/sf0.01"
    val t = Tables(spark, sf)
    val whole = SketchOps.hllDistinct.run(spark, sf)
      .select(col("event_type"), col("s_scaled")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // recompute the registers from the two halves and max-merge manually
    val h = graft.functions.SharedHash.h64(
      concat(lit("hll|"), col("event_id").cast("string")))
    def regs(half: org.apache.spark.sql.DataFrame) = half
      .select(col("event_type"), h.as("h"))
      .select(col("event_type"), (col("h") % 256).as("bucket"),
        when(expr("h div 256") === 0, 53)
          .otherwise(lit(53) - length(bin(expr("h div 256")))).as("rank"))
    val merged = regs(t.events.filter(col("event_id") % 2 === 0))
      .unionByName(regs(t.events.filter(col("event_id") % 2 === 1)))
      .groupBy(col("event_type"), col("bucket")).agg(max(col("rank")).as("mj"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("np"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - mj)")).as("sp"))
      .select(col("event_type"),
        (col("sp") + (lit(256) - col("np")) * 9007199254740992L).as("s_scaled"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == whole, "half-merge must equal the whole-corpus sketch")
  }

  test("histogram quantile sketch merges: bins of halves re-summed == whole") {
    // the property that makes the sketch a partial aggregate at 100 TB:
    // bin counts are additive, so union-and-resum of two half-corpus bin
    // tables must give estimates identical to the whole-corpus sketch
    val sf = "/root/testdata/sf0.01"
    val li = Tables(spark, sf).lineitem
    def bins(half: org.apache.spark.sql.DataFrame) =
      SketchOps.quantileBins(half, "l_extendedprice", "l_returnflag")
    val whole = SketchOps.quantileFromBins(bins(li), "l_returnflag")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val merged = SketchOps.quantileFromBins(
      bins(li.filter(col("l_orderkey") % 2 === 0))
        .unionByName(bins(li.filter(col("l_orderkey") % 2 === 1)))
        .groupBy(col("l_returnflag"), col("bin"))
        .agg(sum(col("cnt")).as("cnt")),
      "l_returnflag")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(merged == whole, "half-merge must equal the whole-corpus sketch")
  }

  test("histogram quantile sketch lands within one bin width of exact") {
    val sf = "/root/testdata/sf0.01"
    val est = SketchOps.approxPercentile.run(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val exact = Tables(spark, sf).lineitem
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.25)").as("p250"),
        expr("percentile(l_extendedprice, 0.5)").as("p500"),
        expr("percentile(l_extendedprice, 0.9)").as("p900"))
      .collect().flatMap(r => Seq(250, 500, 900).zipWithIndex.map {
        case (pm, i) => (r.getString(0), pm) -> r.getDouble(i + 1)
      }).toMap
    val binWidth = SketchOps.QBinW / 100.0
    for ((k, ex) <- exact)
      assert(math.abs(est(k) - ex) <= binWidth,
        s"$k: est ${est(k)} vs exact $ex (> one bin width $binWidth)")
  }

  test("count-min never undercounts; exact for most top terms") {
    val out = SketchOps.cmHeavyHitters.run(spark, "/root/testdata/sf0.01").cache()
    assert(out.count() == 20)
    assert(out.filter(col("n_cm") < col("n_exact")).count() == 0,
      "count-min is one-sided: estimates never fall below the true count")
    val exactHits = out.filter(col("n_cm") === col("n_exact")).count()
    assert(exactHits >= 15, s"expected most cells collision-free, got $exactHits/20")
    out.unpersist()
  }
}

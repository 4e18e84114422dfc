package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property-style randomized check of the j13 bucketing rewrite: for
  * random probe/event timestamp sets the band-keyed equi-join form
  * must equal Spark's own naive non-equi join, row for row. Inputs are
  * drawn from a SMALL integer range on purpose — a dense population
  * around bucket boundaries is exactly where an off-by-one in the
  * two-bucket explode (own + next) or the residual half-open interval
  * (lo exclusive, hi inclusive) would show. Seeds fixed — failures
  * reproduce exactly.
  */
class RangeJoinPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed range count equals the naive range join on boundary-heavy inputs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    for (seed <- Seq(1L, 2L, 3L, 4L)) {
      val rnd = new scala.util.Random(seed)
      val w = Seq(7L, 10L, 64L)(rnd.nextInt(3))
      // values cluster in [0, 6w): every bucket edge is hit, including
      // exact multiples of w (the bkt-boundary case) and exact ties
      val probes = (1 to 200).map(i => (i.toLong, rnd.nextLong(6 * w)))
        .toDF("event_id", "p_us")
      val events = (1 to 300).map(_ => rnd.nextLong(6 * w)).toDF("e_us")

      val got = graft.operators.RelationalOps
        .bucketedRangeCount(probes, events, w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = probes.as("p")
        .join(events.as("e"),
          col("e_us") > col("p_us") - w && col("e_us") <= col("p_us"), "left")
        .groupBy(col("event_id"))
        .agg(count(col("e_us")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want,
        s"seed=$seed w=$w: ${got.toSeq.diff(want.toSeq).take(5)} vs ${want.toSeq.diff(got.toSeq).take(5)}")
    }
  }
}

package graft

import java.sql.Timestamp

import graft.operators.FunnelOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The de-skewed (left-semi) funnel must equal the reference-literal
  * chained-join form on data with a pathological power user — the case
  * where the naive form materializes V·C·P intermediate rows.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val t0 = Timestamp.valueOf("2024-03-01 00:00:00").getTime
  private def at(sec: Long) = new Timestamp(t0 + sec * 1000)

  private def mkStage(rows: Seq[(Long, Long, Long)], user: String, id: String, ts: String): DataFrame = {
    import spark.implicits._
    rows.map { case (u, i, s) => (u, i, at(s)) }.toDF(user, id, ts)
  }

  test("semi-join funnel == naive chained-join funnel on skewed users") {
    // power user 1: 120 views, 120 clicks, 120 purchases inside the match
    // windows (naive intermediate ≈ 120³/overlap); normal users 2..20:
    // a handful each, incl. no-click and click-no-purchase cases
    val views = (0L until 120L).map(i => (1L, 1000L + i, i * 10)) ++
      (2L to 20L).flatMap(u => (0L until 3L).map(i => (u, u * 100 + i, u * 50 + i * 300)))
    val clicks = (0L until 120L).map(i => (1L, 5000L + i, i * 10 + 5)) ++
      (3L to 20L).map(u => (u, u * 100 + 50, u * 50 + 60)) // user 2 never clicks
    val purchases = (0L until 120L).map(i => (1L, 9000L + i, i * 10 + 100)) ++
      (4L to 20L).map(u => (u, u * 100 + 70, u * 50 + 500)) // user 3 never buys

    val v = mkStage(views, "user_id", "view_id", "v_ts")
    val c = mkStage(clicks, "c_user_id", "click_id", "c_ts")
    val p = mkStage(purchases, "p_user_id", "purchase_id", "p_ts")

    val semi = FunnelOps.funnelCountsSemi(v, c, p)
    val naive = FunnelOps.funnelCountsNaive(v, c, p)
    val onlySemi = semi.exceptAll(naive).count()
    val onlyNaive = naive.exceptAll(semi).count()
    assert(onlySemi == 0 && onlyNaive == 0,
      s"semi/naive diverge: $onlySemi vs $onlyNaive rows")
    // sanity: the skewed user's counts are the expected magnitudes
    val u1 = semi.filter(col("user_id") === 1L).collect().head
    assert(u1.getLong(1) == 120L)
  }

  test("no physical plan node of the semi form materializes a per-key product") {
    import spark.implicits._
    val v = (0L until 10L).map(i => (1L, i, at(i))).toDF("user_id", "view_id", "v_ts")
    val c = (0L until 10L).map(i => (1L, 100 + i, at(i))).toDF("c_user_id", "click_id", "c_ts")
    val p = (0L until 10L).map(i => (1L, 200 + i, at(i))).toDF("p_user_id", "purchase_id", "p_ts")
    val plan = FunnelOps.funnelCountsSemi(v, c, p).queryExecution.executedPlan.toString
    val nSemi = "LeftSemi".r.findAllIn(plan).size
    assert(nSemi == 3, s"all three stages must plan as left-semi joins, got $nSemi\n$plan")
    // outer joins may only appear in the final per-user aggregate merge
    // (equi on user_id, 1 row per side) — never with a time-range
    // condition, which is the row-fanout shape
    val rangyOuter = plan.linesIterator.exists(l =>
      l.contains("LeftOuter") && (l.contains("_ts") || l.contains("INTERVAL")))
    assert(!rangyOuter, s"range-condition outer join remains:\n$plan")
  }
}

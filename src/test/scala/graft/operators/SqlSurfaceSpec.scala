package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The verbatim-SQL surface (X3): every reference table/view name must
  * resolve in the registered session catalog, and literal
  * query-examples.sh text run through spark.sql must agree with the
  * oracle-checked rows the views are registered from.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("the registered surface resolves every reference table and view name") {
    SqlSurfaceOps.registerSurface(spark, sf)
    val names = Seq("bid_requests", "bid_responses", "impressions", "clicks") ++
      SparkEntry.registry.map(_.name)
        .filter(n => n.startsWith("v_") || n.startsWith("dq_"))
    for (n <- names)
      assert(spark.catalog.tableExists(n), s"reference name $n not registered")
    // 4 streams + 17 view rows (the 15 reference views, two of which
    // are pinned by a realtime/batch row PAIR) + 2 dq tables
    assert(names.size == 4 + 17 + 2, s"surface drifted: ${names.sorted}")
  }

  test("example #15's literal text agrees with the dq row it reads through") {
    SqlSurfaceOps.registerSurface(spark, sf)
    val viaText = SqlSurfaceOps.example15(spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = SparkEntry.queries("dq_rejected_events")(spark, sf)
      .groupBy(col("reject_reason")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaText == direct,
      s"literal SQL over the registered view diverged: $viaText vs $direct")
  }

  test("example #13's literal funnel is internally consistent") {
    val r = SparkEntry.queries("x3_sql_surface")(spark, sf).head()
    val (req, resp, imp, clk) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(req > 0)
    // funnel monotonicity on distinct event ids: every response answers
    // a request, every click follows an impression
    assert(resp <= req, s"responses $resp > requests $req")
    assert(clk <= imp, s"clicks $clk > impressions $imp")
    assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 100.0) // fill_rate_pct
  }
}

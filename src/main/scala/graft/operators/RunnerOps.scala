package graft.operators

import graft.{QueryDef, SqlRunner}

/** X2 driven through the oracle gate: a multi-statement SQL script (SET
  * conf + temp-view staging + final SELECT) executed by [[SqlRunner]]
  * must produce exactly what DuckDB computes from the equivalent
  * single-statement SQL.
  */
object RunnerOps {

  private val script =
    """-- statement-set style: stage a view, then consume it
      |SET spark.sql.adaptive.enabled = true;
      |
      |CREATE OR REPLACE TEMPORARY VIEW order_months AS
      |SELECT date_trunc('month', o_orderdate) AS month,
      |       o_orderstatus,
      |       o_totalprice
      |FROM orders; -- comment after a statement
      |
      |SELECT CAST(month AS DATE) AS month, o_orderstatus,
      |       count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS revenue
      |FROM order_months
      |GROUP BY month, o_orderstatus
      |""".stripMargin

  val x2SqlRunner: QueryDef = QueryDef(
    "x2_sql_runner",
    (s, dir) => SqlRunner.run(s, dir, script),
    Some("""SELECT CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS DATE) AS month,
           |       o_orderstatus, count(*) AS n_orders,
           |       round(sum(o_totalprice), 2) AS revenue
           |FROM orders
           |GROUP BY 1, 2""".stripMargin))

  val all: Seq[QueryDef] = Seq(x2SqlRunner)
}

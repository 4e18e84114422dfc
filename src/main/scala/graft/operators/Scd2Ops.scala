package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD Type 2 dimensions and the reference's central enrichment joins
  * (S8 seeding, J5 `is_current` join, plus the temporal as-of variant).
  *
  * The reference seeds 13 SCD2 dims, each carrying
  * (valid_from, valid_to, is_current) (iceberg/tables/dim_publisher.yml:4-25,
  * seeded by mock_data_gen/dimension_mapping.py:167-431), and every
  * enriched view joins facts to dims with `ON fk = pk AND is_current = true`
  * (trino/sql/v_event_enriched_bid_requests.sql:34-43).
  *
  * Here the dim is derived DETERMINISTICALLY from the `customer` table so
  * the DuckDB oracle can construct the identical dim and value-check both
  * the seeding and the joins: every third customer changed nation and
  * segment on 1998-06-01 (historical row 1995-01-01 → 1998-06-01 with
  * shifted nation and segment 'LEGACY'; current row from 1998-06-01),
  * everyone else has a single current row since 1995-01-01.
  *
  * Scale: dims are small relative to facts — both joins broadcast the
  * dim side, so enrichment never shuffles the fact table.
  */
object Scd2Ops {

  private val Boundary = "1998-06-01"

  /** The SCD2 customer dimension (two versions for every third key). */
  def dimCustomerScd2(t: Tables): DataFrame = {
    val c = t.customer
    val changed = col("cust_key") % 3 === 0
    val cur = c.select(
      col("c_custkey").as("cust_key"),
      col("c_nationkey").as("nation_key"),
      col("c_mktsegment").as("segment"))
      .withColumn("valid_from",
        when(changed, lit(Boundary)).otherwise(lit("1995-01-01")).cast("date"))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    val hist = c.filter(col("c_custkey") % 3 === 0).select(
      col("c_custkey").as("cust_key"),
      ((col("c_nationkey") + 7) % 25).as("nation_key"),
      lit("LEGACY").as("segment"),
      lit("1995-01-01").cast("date").as("valid_from"),
      lit(Boundary).cast("date").as("valid_to"),
      lit(false).as("is_current"))
    cur.unionByName(hist)
  }

  private val dimSql =
    s"""SELECT c_custkey AS cust_key, c_nationkey AS nation_key,
       |       c_mktsegment AS segment,
       |       CASE WHEN c_custkey % 3 = 0 THEN DATE '$Boundary'
       |            ELSE DATE '1995-01-01' END AS valid_from,
       |       CAST(NULL AS DATE) AS valid_to, true AS is_current
       |FROM customer
       |UNION ALL
       |SELECT c_custkey, (c_nationkey + 7) % 25, 'LEGACY',
       |       DATE '1995-01-01', DATE '$Boundary', false
       |FROM customer WHERE c_custkey % 3 = 0""".stripMargin

  /** S8 — the seeded dim itself, value-checked against the oracle's
    * identical construction.
    */
  val s8DimSeed: QueryDef = QueryDef("s8_dim_seed", dimSql)(dimCustomerScd2)

  /** J5 — current-state enrichment: facts joined to the dim with the
    * `is_current = true` predicate pushed into the (broadcast) dim scan.
    */
  val j5Scd2Current: QueryDef = QueryDef(
    "j5_scd2_current",
    s"""WITH dim AS ($dimSql)
       |SELECT dim.segment, dim.nation_key,
       |       count(*) AS n_orders,
       |       round(sum(o_totalprice), 2) AS total_price
       |FROM orders
       |JOIN dim ON o_custkey = dim.cust_key AND dim.is_current
       |GROUP BY dim.segment, dim.nation_key""".stripMargin) { t =>
    val dim = dimCustomerScd2(t).filter(col("is_current"))
    t.orders
      .join(broadcast(dim), col("o_custkey") === col("cust_key"))
      .groupBy(col("segment"), col("nation_key"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
  }

  /** J5 (temporal form) — as-of enrichment: each order joined to the dim
    * version valid AT the order date (`valid_from <= d < valid_to`).
    * Orders before the boundary on changed keys land on the LEGACY
    * version — the semantics the `is_current` shortcut discards.
    */
  val j5Scd2Asof: QueryDef = QueryDef(
    "j5_scd2_asof",
    s"""WITH dim AS ($dimSql)
       |SELECT dim.segment,
       |       count(*) AS n_orders,
       |       round(sum(o_totalprice), 2) AS total_price
       |FROM orders
       |JOIN dim ON o_custkey = dim.cust_key
       |        AND o_orderdate >= valid_from
       |        AND (valid_to IS NULL OR o_orderdate < valid_to)
       |GROUP BY dim.segment""".stripMargin) { t =>
    val dim = dimCustomerScd2(t)
    t.orders
      .join(broadcast(dim),
        col("o_custkey") === col("cust_key") &&
          col("o_orderdate") >= col("valid_from").cast("timestamp") &&
          (col("valid_to").isNull ||
            col("o_orderdate") < col("valid_to").cast("timestamp")))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
  }

  val all: Seq[QueryDef] = Seq(s8DimSeed, j5Scd2Current, j5Scd2Asof)
}

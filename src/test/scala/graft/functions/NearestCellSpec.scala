package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native [[NearestCell]] must pick the same cell as the aggregate
  * fold it replaces — BIT-identical cosine arithmetic, same tie-break.
  */
class NearestCellSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def native(emb: Column, cents: Column): Column =
    GraftSqlBridge.column(NearestCell(
      GraftSqlBridge.expression(emb), GraftSqlBridge.expression(cents)))

  /** The reference fold — the expression cellFold builds under
    * SPARK_GRAFT_ANN=fold (needs a `nrm` column on the row).
    */
  private def fold(emb: Column, cents: Column, nrm: Column): Column =
    aggregate(cents,
      struct(lit(Double.NegativeInfinity).as("cs"), lit(-1L).as("cell")),
      (acc, c) => {
        val cs = AnnOps.dot(emb, c.getField("c_emb")) /
          (nrm * c.getField("c_nrm"))
        when(cs > acc.getField("cs"),
          struct(cs.as("cs"), c.getField("cid").as("cell"))).otherwise(acc)
      }).getField("cell")

  test("native cell equals the fold cell on every sf0.001 vector") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("nrm", sqrt(AnnOps.dot(col("embedding"), col("embedding"))))
    val cent = AnnOps.centroids(e)
    val centsRow = cent.groupBy()
      .agg(sort_array(collect_list(struct(col("cid"), col("c_emb"), col("c_nrm"))))
        .as("cents"))
    val rows = e.crossJoin(broadcast(centsRow))
      .select(col("vec_id"),
        fold(col("embedding"), col("cents"), col("nrm")).as("f"),
        native(col("embedding"), col("cents")).as("n"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"vec ${r.getLong(0)}: fold=${r.getLong(1)} native=${r.getLong(2)}")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for schema/plan checks. Not part of the contract. */
object DevCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(8)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args(1).split(",").toSeq
                else SparkEntry.registry.map(_.name)
    val unknown = names.filterNot(n => SparkEntry.registry.exists(_.name == n))
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val timing = sys.env.contains("GRAFT_DEV_TIME")
    for (n <- names; q <- SparkEntry.registry.find(_.name == n)) {
      println(s"===== $n =====")
      if (timing) {
        // warm-up once (scan cache, codegen), then timed run
        q.run(spark, sf).count()
        val t0 = System.nanoTime()
        val rows = q.run(spark, sf).count()
        println(f"TIME $n ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      } else q.run(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}

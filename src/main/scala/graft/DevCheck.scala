package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for schema/plan checks. Not part of the contract. */
object DevCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(8)
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, "/root/testdata/sf0.001")
    try {
      val ev = t.events
      ev.printSchema()
      ev.show(3, truncate = false)
    } catch {
      case e: Throwable => println(s"EVENTS READ FAILED: ${e.getMessage.take(500)}")
    }
    spark.stop()
  }
}

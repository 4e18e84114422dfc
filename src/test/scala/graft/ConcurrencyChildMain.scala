package graft

import graft.tables.{GraftTable, TableDef}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Second-JVM writer for the cross-process concurrency test: a separate
  * process with its own SparkSession appending to the SAME table root
  * as the test JVM. The commit protocol's arbitration is a filesystem
  * hard-link CAS (GraftTable.publish), so nothing about it is
  * process-local — this main proves that by racing a real second JVM,
  * the shape of the reference's deployment (Flink jobs and the
  * maintenance cron are separate processes on separate hosts sharing
  * only the table location).
  *
  * args: tableRoot tableName nBatches grp
  */
object ConcurrencyChildMain {
  def main(args: Array[String]): Unit = {
    val Array(root, name, nStr, grp) = args
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-concurrency-child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      import spark.implicits._
      val schema = StructType(Seq(
        StructField("id", LongType),
        StructField("grp", StringType),
        StructField("v", DoubleType)))
      val t = new GraftTable(spark, TableDef(name, schema), root)
      (0 until n).foreach { i =>
        t.append((i * 10 until i * 10 + 10).map(j => (j.toLong, grp, 1.0))
          .toDF("id", "grp", "v"))
      }
      // contract line the parent asserts on (stdout, past Spark's logs)
      println(s"CHILD_DONE version=${t.currentVersion}")
    } finally spark.stop()
  }
}

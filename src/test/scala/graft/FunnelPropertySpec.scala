package graft

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp
import java.util.Comparator

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style randomized check of the streaming funnel: for random
  * event streams AND random watermark advance cadences, the stateful
  * operator must equal the batch chained-left-join twin row for row.
  *
  * The cadence is part of the property on purpose: the r2 eviction-
  * horizon bug (clicks dropped 30 min before the last view that could
  * match them finalized) was invisible under one-jump watermark tests
  * and only appears when the watermark advances in steps smaller than
  * the funnel horizon. Seeds are fixed — failures reproduce exactly.
  */
class FunnelPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ckpt(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_prop_ckpt", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    p.toString
  }

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(minutes: Long) = new Timestamp(t0.getTime + minutes * 60000L)

  private def randomEvents(seed: Long): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    val types = Seq("view", "click", "purchase")
    (1 to 120).map { i =>
      Ev(1000L + i, at(rnd.nextInt(360).toLong), 1L + rnd.nextInt(6),
        types(rnd.nextInt(3)), rnd.nextInt(100) / 10.0)
    }
  }

  private def batchTwin(events: Seq[Ev]): DataFrame = {
    import spark.implicits._
    def b(t: String, idCol: String, tsCol: String, userCol: String) =
      spark.createDataset(events.filter(_.event_type == t)).toDF()
        .select(col("user_id").as(userCol), col("event_id").as(idCol), col("ts").as(tsCol))
    b("view", "view_id", "v_ts", "user_id")
      .join(b("click", "click_id", "c_ts", "c_user_id"),
        col("user_id") === col("c_user_id") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("interval 30 minutes"), "left")
      .join(b("purchase", "purchase_id", "p_ts", "p_user_id"),
        col("c_user_id") === col("p_user_id") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("interval 2 hours"), "left")
      .select(col("user_id"), col("view_id"), col("click_id"), col("purchase_id"),
        col("v_ts"), col("c_ts"), col("p_ts"))
  }

  for (seed <- Seq(11L, 42L, 1234L)) {
    test(s"random stream + random watermark cadence equals batch twin (seed $seed)") {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val rnd = new scala.util.Random(seed * 7 + 1)
      val events = randomEvents(seed)

      // deliver in event-time order (out-of-order delivery past the
      // watermark is CORRECTLY dropped by the stream but kept by the
      // batch twin, so it would break the equality property) — the
      // random batch sizes are what randomize the watermark cadence
      val batches = events.sortBy(_.ts.getTime).grouped(1 + rnd.nextInt(40)).toSeq
      val src = MemoryStream[Ev]
      val q = graft.streaming.FunnelState.funnelChain(src.toDF())
        .writeStream.format("memory").queryName(s"prop_funnel_$seed")
        .outputMode("append").option("checkpointLocation", ckpt(s"prop$seed")).start()
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
      var wmMin = 380L
      var k = 0L
      while (wmMin < 560L) {
        src.addData(Ev(-1000 - k, at(wmMin), -1L, "view", 0.0))
        q.processAllAvailable()
        wmMin += 5 + rnd.nextInt(36)
        k += 1
      }
      // two final ticks mature the last sentinel's obligations
      src.addData(Ev(-2000, at(720), -1L, "view", 0.0)); q.processAllAvailable()
      src.addData(Ev(-2001, at(900), -1L, "view", 0.0)); q.processAllAvailable()
      q.stop()

      val got = spark.table(s"prop_funnel_$seed").filter(col("user_id") >= 0)
      val twin = batchTwin(events)
      val a = got.exceptAll(twin).count(); val b = twin.exceptAll(got).count()
      assert(a == 0 && b == 0,
        s"seed $seed: $a rows only in streaming, $b only in batch")
    }
  }
}

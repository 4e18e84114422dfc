package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.{SparkTestSession, Tables}
import graft.functions.TextOps
import graft.tables.GraftTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class TsDoc(doc_id: Long, lang: String, source: String)

/** The streamed temperature-sampling rates must be indistinguishable
  * from batch counting: after ingesting the corpus in micro-batches,
  * sampling through [[TemperatureIngest.sample]] must equal the
  * `sample_temperature` batch operator row for row (counts are
  * additive partials, so batch boundaries cannot matter), and a
  * replayed batch must not change the counts.
  */
class TemperatureIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fresh(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_temp", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String, Long)] =
    df.select("doc_id", "lang", "source", "keep_th")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet

  test("streamed rates sample identically to the batch operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val counts = new GraftTable(spark, TemperatureIngest.countsDef, fresh("counts"))
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val docs = docsDf.select("doc_id", "lang", "source").collect()
      .map(r => TsDoc(r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_.doc_id).toSeq

    val src = MemoryStream[TsDoc]
    val q = TemperatureIngest.countsAppend(src.toDF(), counts, fresh("ck"))
    docs.grouped(math.max(1, docs.size / 3)).foreach { g =>
      src.addData(g); q.processAllAvailable()
    }
    q.stop()

    val streamed = rows(TemperatureIngest.sample(docsDf, counts))
    val batch = rows(TextOps.sampleTemperature.fn(spark, sf))
    assert(streamed == batch,
      s"streamed ${streamed.size} rows vs batch ${batch.size}; " +
        s"diff=${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
    // the gate must actually bite: at least one language downsampled
    assert(streamed.size < docs.size, "no language was downsampled — gate untested")
  }

  test("a cold counts table fails loudly; an unseen language keeps everything") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val counts = new GraftTable(spark, TemperatureIngest.countsDef, fresh("cold"))
    val docsDf = Seq(TsDoc(1, "xx", "src0")).toDF()
    val e = intercept[IllegalArgumentException] {
      TemperatureIngest.sample(docsDf, counts)
    }
    assert(e.getMessage.contains("empty"), e.getMessage)

    // counts know only 'en'; an arriving never-seen language is by
    // definition the rarest and must keep everything, not vanish
    val src = MemoryStream[TsDoc]
    val q = TemperatureIngest.countsAppend(src.toDF(), counts, fresh("coldck"))
    src.addData(Seq(TsDoc(10, "en", "src0"), TsDoc(11, "en", "src1")))
    q.processAllAvailable(); q.stop()
    val got = TemperatureIngest.sample(docsDf, counts).collect()
    assert(got.length == 1 && got.head.getLong(3) == 1000000L,
      s"unseen language must keep whole at threshold 1e6: ${got.toSeq}")
  }

  test("a replayed batch does not change the counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val counts = new GraftTable(spark, TemperatureIngest.countsDef, fresh("rcounts"))
    val docs = Seq(TsDoc(1, "en", "src0"), TsDoc(2, "en", "src1"), TsDoc(3, "de", "src0"))

    val src = MemoryStream[TsDoc]
    val q = TemperatureIngest.countsAppend(src.toDF(), counts, fresh("rck"))
    src.addData(docs); q.processAllAvailable(); q.stop()
    def snap() = TemperatureIngest.mergedCounts(counts).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val before = snap()
    assert(before == Map("en" -> 2L, "de" -> 1L), s"unexpected counts: $before")

    val src2 = MemoryStream[TsDoc]
    val q2 = TemperatureIngest.countsAppend(src2.toDF(), counts, fresh("rck2"))
    src2.addData(docs); q2.processAllAvailable(); q2.stop()
    assert(snap() == before, "replayed batch changed the counts")
  }
}

package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import graft.SparkTestSession
import graft.functions.SearchOps
import graft.tables.GraftTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Doc2(doc_id: Long, text: String)

/** Streaming inverted-index maintenance: documents streamed through
  * [[PostingsIngest.indexAppend]] must produce a postings table whose
  * BM25 ranking is IDENTICAL to the raw-text `bm25_topk` query over the
  * same corpus, with the postings read pruned to the query terms'
  * partitions.
  */
class PostingsIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def fresh(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft_postings", name)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  test("streamed postings serve the exact raw-text BM25 ranking, pruned by term") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wh = fresh("wh")
    val postings = new GraftTable(spark, PostingsIngest.postingsDef, wh)
    val docStats = new GraftTable(spark, PostingsIngest.docStatsDef, wh)

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => Doc2(r.getLong(0), r.getString(1))).toSeq
    val src = MemoryStream[Doc2]
    val q = PostingsIngest.indexAppend(src.toDF(), postings, docStats, fresh("ckpt"))
    val (first, second) = docs.splitAt(docs.size / 2)
    src.addData(first); q.processAllAvailable()
    src.addData(second); q.processAllAvailable()
    q.stop()

    // sidecar covers every doc, postings only docs with tokens
    assert(docStats.readLogical().count() == docs.size)

    val terms = Seq("vector", "stream", "merge", "window", "hash")
    val served = PostingsIngest.bm25TopK(postings, docStats, terms, 20)
    val direct = SearchOps.bm25Topk.run(spark, sf)
    assert(served.collect().toSeq.map(_.toSeq) == direct.collect().toSeq.map(_.toSeq),
      "postings-served BM25 must equal the raw-text ranking row for row")

    // the pruned read touches only the query terms' BUCKET dirs
    // (buckets computed driver-side — the serving-path pruning key)
    val buckets = terms.map(PostingsIngest.bucketOf).distinct
    val pruned = postings.read()
      .filter(col("p_term_bucket").isin(buckets: _*))
    pruned.collect()
    val opened = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.sum
    val allFiles = postings.read().inputFiles.length
    assert(opened < allFiles,
      s"pruned scan opened $opened of $allFiles files — no partition pruning")
    // bucket layout is BOUNDED: directories never exceed the constant
    // bucket count regardless of vocabulary size
    val bucketDirs = postings.read().select("p_term_bucket").distinct().count()
    assert(bucketDirs <= PostingsIngest.TermBuckets,
      s"$bucketDirs bucket dirs exceed the ${PostingsIngest.TermBuckets} layout bound")

    // re-delivery of a whole batch must not double-count tf
    val tfBefore = postings.readLogical().agg(sum("tf")).head.getLong(0)
    val src2 = MemoryStream[Doc2]
    // same checkpoint marker namespace: batchId 0 is already marked, so
    // replaying batch 0's docs through a NEW query against the same
    // tables with the same batch ids must be a no-op
    val q2 = PostingsIngest.indexAppend(src2.toDF(), postings, docStats, fresh("ckpt2"))
    src2.addData(first); q2.processAllAvailable()
    q2.stop()
    val tfAfter = postings.readLogical().agg(sum("tf")).head.getLong(0)
    assert(tfAfter == tfBefore, "replayed batch 0 must be dropped by the sink marker")
  }

  test("single-pass corpus fan-out maintains postings, doc stats, and CM identically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wh = fresh("fwh")
    val postings = new GraftTable(spark, PostingsIngest.postingsDef, wh)
    val docStats = new GraftTable(spark, PostingsIngest.docStatsDef, wh)
    val cmSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType)))
    val cmTable = new GraftTable(spark,
      graft.tables.TableDef("cm_cells", cmSchema), wh)

    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => Doc2(r.getLong(0), r.getString(1))).toSeq
    val src = MemoryStream[Doc2]
    val q = PostingsIngest.corpusIndexFanout(src.toDF(), postings, docStats,
      cmTable, fresh("fck"))
    val (first, second) = docs.splitAt(docs.size / 2)
    src.addData(first); q.processAllAvailable()
    src.addData(second); q.processAllAvailable()
    q.stop()

    // postings serve the same BM25 ranking as the raw-text query
    val terms = Seq("vector", "stream", "merge", "window", "hash")
    val served = PostingsIngest.bm25TopK(postings, docStats, terms, 20)
    val direct = SearchOps.bm25Topk.run(spark, sf)
    assert(served.collect().toSeq.map(_.toSeq) == direct.collect().toSeq.map(_.toSeq),
      "fanout postings must serve the raw-text ranking")

    // the CM leg equals the one-pass batch sketch for its top-20 probes
    val batchCm = graft.functions.SketchOps.cmHeavyHitters.run(spark, sf).collect()
    val streamed = Sinks.cmEstimate(cmTable, batchCm.map(_.getAs[String]("term")).toSeq)
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("n_cm")).toMap
    batchCm.foreach { r =>
      assert(streamed(r.getAs[String]("term")) == r.getAs[Long]("n_cm"),
        s"${r.getAs[String]("term")}: fanout CM drifted from the batch sketch")
    }
    assert(docStats.readLogical().count() == docs.size)
  }

  test("volume-sized bucket count: serve path prunes by the TABLE's own spec") {
    // the sizing function obeys both documented bounds
    assert(PostingsIngest.bucketsForVolume(0) == 8)
    assert(PostingsIngest.bucketsForVolume(600L << 10) == 8) // KB-scale twin corpus
    assert(PostingsIngest.bucketsForVolume(1L << 30) == 32)  // 1 GiB / 32 MiB
    assert(PostingsIngest.bucketsForVolume(Long.MaxValue) == 4096)
    // power of two throughout
    for (b <- Seq(0L, 1L << 20, 1L << 28, 1L << 34, 1L << 44))
      assert(Integer.bitCount(PostingsIngest.bucketsForVolume(b)) == 1)

    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val wh = fresh("vwh")
    // non-default count: ranking must be identical and pruning must key
    // off the table's spec, not the module default
    val postings = new GraftTable(spark, PostingsIngest.postingsDefWith(8), wh)
    val docStats = new GraftTable(spark, PostingsIngest.docStatsDef, wh)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => Doc2(r.getLong(0), r.getString(1))).toSeq
    val src = MemoryStream[Doc2]
    val q = PostingsIngest.indexAppend(src.toDF(), postings, docStats, fresh("vck"))
    src.addData(docs); q.processAllAvailable()
    q.stop()

    assert(postings.read().select("p_term_bucket").distinct().count() <= 8)
    val terms = Seq("vector", "stream", "merge", "window", "hash")
    val served = PostingsIngest.bm25TopK(postings, docStats, terms, 20)
    val direct = SearchOps.bm25Topk.run(spark, sf)
    assert(served.collect().toSeq.map(_.toSeq) == direct.collect().toSeq.map(_.toSeq),
      "8-bucket postings must serve the raw-text ranking")
    // pruned read: fewer files than the table holds (the spec's buckets)
    val bt = graft.tables.BucketTransform("term", 8)
    val pruned = postings.read()
      .filter(col("p_term_bucket").isin(terms.map(bt.bucketOf).distinct: _*))
    pruned.collect()
    val opened = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.sum
    assert(opened < postings.read().inputFiles.length,
      "serve read must open only the query terms' bucket dirs")
  }
}

package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the retrieval ops — the DuckDB oracle pins
  * cross-engine value equality; these pin the retrieval math itself.
  */
class SearchOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("bm25 scores one doc exactly as the closed-form integer formula") {
    val rows = SearchOps.bm25Topk.run(spark, sf).collect()
    assert(rows.length == 20)
    // ranks are 1..20, scores non-increasing, tie-break on doc_id
    assert(rows.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to 20))
    val byRank = rows.sortBy(_.getAs[Int]("rnk"))
    byRank.sliding(2).foreach { case Array(a, b) =>
      val (sa, sb) = (a.getAs[Long]("score_ppm"), b.getAs[Long]("score_ppm"))
      assert(sa > sb || (sa == sb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
    }
    // recompute the winner's score from raw token counts, independently
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z]+")).as("t"))
      .filter(length(col("t")) >= 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nn = docs.count()
    val dl = toks.groupBy(_._1).map { case (d, ts) => d -> ts.length.toLong }
    val ll = dl.values.sum
    val terms = Seq("vector", "stream", "merge", "window", "hash")
    val dfT = terms.map(t => t -> toks.filter(_._2 == t).map(_._1).distinct.length.toLong).toMap
    val top = byRank.head
    val d = top.getAs[Long]("doc_id")
    val avgR = math.max(1L, ll / nn)
    val expected = terms.map { t =>
      val tf = toks.count(p => p._1 == d && p._2 == t).toLong
      if (tf == 0L) 0L
      else {
        val idfPpm = (2L * (nn - dfT(t)) + 1L) * 1000000L / (2L * dfT(t) + 1L)
        val tPpt = 22000L * avgR * tf / (10L * avgR * tf + 3L * avgR + 9L * dl(d))
        idfPpm * tPpt / 1000L
      }
    }.sum
    assert(top.getAs[Long]("score_ppm") == expected)
    assert(top.getAs[Long]("dl") == dl(d))
  }

  test("hybrid rrf fuses exactly the two component ranks") {
    val out = SearchOps.hybridRrf.run(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to rows.length))
      rows.foreach { r =>
        val (rl, rs) = (r.getAs[Int]("r_lex"), r.getAs[Int]("r_sem"))
        // both component ranks are positions in a full ranking of the
        // n-1 candidates
        assert(rl >= 1 && rl <= n - 1, s"r_lex $rl out of range")
        assert(rs >= 1 && rs <= n - 1, s"r_sem $rs out of range")
        assert(r.getAs[Long]("rrf_ppm") ==
          1000000L / (60L + rl) + 1000000L / (60L + rs))
      }
      // fused order is rrf desc, doc id asc
      rows.sortBy(_.getAs[Int]("rnk")).sliding(2).foreach { case Array(a, b) =>
        val (fa, fb) = (a.getAs[Long]("rrf_ppm"), b.getAs[Long]("rrf_ppm"))
        assert(fa > fb || (fa == fb && a.getAs[Long]("vec_id") < b.getAs[Long]("vec_id")))
      }
    }
  }

  test("a doc sharing every query term outranks one sharing none (bm25 recall sanity)") {
    // corpus-level: every top-20 doc must contain at least one query term
    val rows = SearchOps.bm25Topk.run(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("n_terms") >= 1))
    assert(rows.forall(_.getAs[Long]("score_ppm") > 0))
  }
}

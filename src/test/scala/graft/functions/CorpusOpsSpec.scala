package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("repetition metrics are internally consistent") {
    val df = CorpusOps.textRepetition.run(spark, sf).cache()
    assert(df.count() > 0)
    // a doc has exactly n_words - 1 bigrams, the mode can't exceed the
    // total, and distinct words can't exceed total words
    assert(df.filter(col("n_bigrams") =!= col("n_words") - 1).count() == 0)
    assert(df.filter(col("top_bigram_count") > col("n_bigrams")).count() == 0)
    assert(df.filter(col("n_distinct_words") > col("n_words")).count() == 0)
    // the flag is exactly the 20% integer cross-multiply
    assert(df.filter(col("is_repetitive") =!=
      (col("top_bigram_count") * 5 > col("n_bigrams"))).count() == 0)
    df.unpersist()
  }

  test("per-row repetition stats equal the explode-histogram reference on adversarial inputs") {
    import spark.implicits._
    // small vocabulary (with the empty word a double space produces) to
    // force heavy bigram ties — the regime where sorted-run = mode
    // multiplicity must hold exactly
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "")
    val docs = (1 to 300).map { i =>
      val n = 2 + rnd.nextInt(40)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val ws = docs.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
    val fast = ws
      .select(col("doc_id"), CorpusOps.repStats(col("ws")).as("s"))
      .select(col("doc_id"), col("s.top_bigram_count").as("f_top"),
        col("s.n_bigrams").as("f_nb"))
    val ref = ws
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("ws")) - 1),
        i => concat(element_at(col("ws"), i), lit(" "),
          element_at(col("ws"), i + 1)))).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(max(col("cnt")).as("r_top"), sum(col("cnt")).as("r_nb"))
    val joined = fast.join(ref, Seq("doc_id")).cache()
    assert(joined.count() == 300)
    assert(joined.filter(col("f_top") =!= col("r_top")).count() == 0)
    assert(joined.filter(col("f_nb") =!= col("r_nb")).count() == 0)
    joined.unpersist()
  }

  test("repetition fold is structurally safe on sub-bigram documents") {
    import spark.implicits._
    // one-word and empty-string docs: sequence(1, size-1) would
    // generate DESCENDING [1, 0] and index element_at(ws, 0) — the
    // when-guard must keep the fold unreached, with top run 0, for ANY
    // caller regardless of surrounding filter conjunct order
    val df = Seq((1L, "solo"), (2L, ""), (3L, "a a"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), CorpusOps.repStats(col("ws")).as("s"),
        CorpusOps.repGateOk(col("ws")).as("ok"))
      .collect().map(r => r.getLong(0) ->
        (r.getStruct(1).getLong(0), r.getBoolean(2))).toMap
    assert(df(1L) == ((0L, true)))  // 1 word: no bigrams, gate passes
    assert(df(2L) == ((0L, true)))  // splits to [""] — same
    assert(df(3L) == ((1L, false))) // one bigram, 1*5 > 1 — gate drops
  }

  test("decontamination keeps every non-benchmark doc and flags hits monotonically") {
    val df = CorpusOps.textDecontam.run(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val expected = docs.filter(col("doc_id") % 97 =!= 0).count()
    assert(df.count() == expected)
    assert(df.filter(col("is_contaminated") =!= (col("n_contaminated_grams") > 0)).count() == 0)
    df.unpersist()
  }

  test("bloom decontamination is a strict one-sided relaxation of the exact form") {
    val exact = CorpusOps.textDecontam.run(spark, sf)
      .select(col("doc_id"), col("is_contaminated")).cache()
    val bloom = CorpusOps.textDecontamBloom.run(spark, sf)
      .select(col("doc_id"), col("is_flagged"), col("n_hit_grams")).cache()
    assert(exact.count() == bloom.count())
    val joined = exact.join(bloom, Seq("doc_id")).cache()
    // one-sided error: every exactly-contaminated doc MUST be flagged
    // (a false negative would keep a contaminated document — the failure
    // mode a bloom cannot have)
    assert(joined.filter(col("is_contaminated") && !col("is_flagged")).count() == 0)
    // measure (don't assume) the false-positive count at this m/k; with
    // ~5 eval docs in 2^20 bits the expected FP count is ≪ 1
    val fp = joined.filter(!col("is_contaminated") && col("is_flagged")).count()
    assert(fp <= 2, s"bloom flagged $fp clean documents — m/k miscalibrated")
    assert(bloom.filter(col("is_flagged") =!= (col("n_hit_grams") > 0)).count() == 0)
    joined.unpersist(); exact.unpersist(); bloom.unpersist()
  }

  test("train split is exhaustive, deterministic, and gapless within shards") {
    val df = CorpusOps.textTrainSplit.run(spark, sf).cache()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(df.count() == docs.count())
    assert(df.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "validation", "test")))
    // shard_pos is a gapless 1..n ranking per (split, shard)
    val bad = df.groupBy("split", "shard")
      .agg(count(lit(1)).as("n"), max("shard_pos").as("mx"), min("shard_pos").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() == 0)
    // determinism: second run bit-identical
    val again = CorpusOps.textTrainSplit.run(spark, sf)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
    df.unpersist()
  }
}

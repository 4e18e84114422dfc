package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the scale properties that don't show up in
  * row-level correctness: filters and projections must reach the parquet
  * scan, small dims must broadcast, and no registered query may plan a
  * cartesian product.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  // ONE materialization of every registry row, shared by the two
  // registry-wide tests below (ADVICE r10 #5: constructing a streamed
  // twin row EXECUTES its full multi-batch ingest protocol, so building
  // each frame twice — once per test — paid the whole ~70 s twin floor
  // twice per suite run). Constructing the frame is the expensive part;
  // the plan/schema reads on the cached frames are driver-side-cheap.
  private lazy val registryFrames: Seq[(String, org.apache.spark.sql.DataFrame)] =
    SparkEntry.registry.map(q => (q.name, q.run(spark, sf)))

  test("no registered query plans a CartesianProduct") {
    for ((name, df) <- registryFrames) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
    }
  }

  test("no registered query emits a wide-integer (Decimal) output column") {
    // The driver's oracle hasher does not canonicalize DECIMAL/HUGEINT
    // across engines (rounds 6 and 8 each lost rows to exactly this), so
    // wide integers must be emitted as BIGINT or canonical VARCHAR. The
    // DuckDB side of the same discipline is enforced in
    // tools/compare_oracle.py's schema guard.
    for ((name, df) <- registryFrames) {
      val bad = df.schema.fields.filter(
        _.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])
      assert(bad.isEmpty,
        s"$name emits driver-unhashable decimal column(s): ${bad.map(_.name).mkString(", ")}")
    }
  }

  test("fact-to-fact range join is a bucketed equi-join, never nested-loop") {
    // the naive plan for a pure range predicate is a
    // BroadcastNestedLoopJoin — O(|P|·|E|); the bucketing rewrite must
    // surface as a plain shuffled equi-join on the derived band key
    val plan = planOf("j13_range_join_facts")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
    // a KEYED join on the derived bucket must exist (at test scale the
    // tiny error side auto-broadcasts to a BroadcastHashJoin; at fact
    // scale the same plan shape shuffles both sides on bkt)
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[bkt".r
      .findFirstIn(plan).isDefined,
      s"expected an equi-join keyed on the bucket:\n$plan")
  }

  test("predicate pushdown reaches the parquet scan") {
    val plan = planOf("p5_reject_filter")
    assert(plan.contains("PushedFilters: ["), plan)
    assert("PushedFilters: \\[[^\\]]*IsNotNull".r.findFirstIn(plan).isDefined,
      s"expected pushed filters in scan:\n$plan")
  }

  test("column pruning: top-k scan reads only the projected columns") {
    val plan = planOf("o1_topk")
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty, plan)
    // lineitem has 11 columns; the query needs a handful
    assert(readSchemas.forall(_.split(",").length <= 6),
      s"scan reads more columns than the query needs: $readSchemas")
  }

  test("SCD2 dim enrichment broadcasts the dim side") {
    val plan = planOf("j5_scd2_current")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("12-dim wide enrichment broadcasts every dim join, no sort-merge creep") {
    val plan = planOf("j5_wide_enrich")
    // 12 dim joins + the fact-to-request join; all dim sides must hash-
    // broadcast — a SortMergeJoin at this width would shuffle the fact
    // table 12 times at cluster scale
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(nBroadcast >= 12, s"expected >=12 broadcast dim joins, got $nBroadcast\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"wide enrichment must not sort-merge any dim join\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("composed full-funnel view broadcasts all 12 dims in one plan") {
    val plan = planOf("v_event_enriched_full_funnel")
    // the 4-stage LEFT chain may shuffle on its funnel keys, but every
    // dim join must broadcast — losing one here means the widest
    // reference view shuffles its fact rows per dim at cluster scale
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(nBroadcast >= 12, s"expected >=12 broadcast dim joins, got $nBroadcast\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = planOf("o1_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("embedding near-dup pair join is keyed on the LSH bucket, never nested-loop") {
    val plan = planOf("dedup_embedding_cosine")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"pair generation must be a keyed join on the bucket:\n$plan")
    assert(plan.contains("bucket"), plan)
  }

  test("semantic dedup pair join is keyed on the cell, codebook broadcast as one row") {
    val plan = planOf("dedup_semantic")
    assert(!plan.contains("CartesianProduct"), plan)
    // the ONLY nested-loop joins allowed are the 1-row codebook
    // broadcasts (crossJoin against the single collect_list row); the
    // corpus-sized pair join must be a keyed hash/merge join on `cell`
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 3, s"unexpected nested-loop joins ($bnlj):\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")
      || plan.contains("ShuffledHashJoin"),
      s"pair generation must be a keyed join on the cell:\n$plan")
  }

  test("kmv sketch aggregates partial-then-final: map tasks ship <=k-long buffers") {
    val plan = planOf("kmv_distinct")
    // TypedImperativeAggregate plans as ObjectHashAggregate; two nodes
    // (partial below the exchange, final above) prove map-side collapse
    // — the property that bounds the shuffle at k longs per group
    val nObjAgg = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(nObjAgg >= 2, s"expected partial+final ObjectHashAggregate:\n$plan")
  }

  test("multi-probe ANN joins candidates on the bucket key, probe side broadcast") {
    val plan = planOf("ann_lsh_multiprobe")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"candidate generation must be a keyed bucket join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the exploded probe set is tiny and must broadcast:\n$plan")
  }

  test("corpus top-k terms plans a partial agg + TakeOrderedAndProject") {
    val plan = planOf("topk_terms")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must heap-select, not globally sort:\n$plan")
    assert(!plan.contains("Join"), plan)
  }

  // The shuffle assertions below are AT MOST one Exchange, not exactly
  // one: AQE reuse or a Spark version bump can legitimately drop (never
  // add) a shuffle without any semantic regression, and the scale claim
  // being pinned is "no join and no second shuffle of the fact stream".

  test("as-of join is the one-shuffle window form, not an interval join") {
    val plan = planOf("j11_asof_join")
    assert(!plan.contains("Join"),
      s"as-of must be union-tag + window, no join operator:\n$plan")
    assert(plan.contains("Window"),
      s"as-of must rank via a window over the union-tagged stream:\n$plan")
    val nShuffles = "Exchange".r.findAllIn(plan).size
    assert(nShuffles <= 1, s"expected at most 1 shuffle (user_id), got $nShuffles:\n$plan")
  }

  test("random projection is map-only: no shuffle, no join, one scan") {
    val plan = planOf("emb_project")
    assert(!plan.contains("Exchange"),
      s"emb_project must be a pure map — the plane matrix is a constant:\n$plan")
    assert(!plan.contains("Join"), plan)
  }

  test("sessionize is a single shuffle on the session key") {
    val plan = planOf("w_sessionize")
    assert(!plan.contains("Join"), plan)
    val nShuffles = "Exchange".r.findAllIn(plan).size
    assert(nShuffles <= 1, s"expected at most 1 shuffle (user_id), got $nShuffles:\n$plan")
  }

  test("one-pass spine uses a single scan (partial+final agg, no join)") {
    val plan = planOf("a5_spine_onepass")
    assert(!plan.contains("Join"), s"one-pass spine must not join:\n$plan")
    val nScans = "Scan parquet".r.findAllIn(plan).size
    assert(nScans == 1, s"expected 1 scan, got $nScans:\n$plan")
  }

  test("OOV scoring broadcasts the fixed-size vocabulary, corpus side hash-joins") {
    val plan = planOf("text_oov_rate")
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab must broadcast — it is fixed-K regardless of corpus size:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus word stream must never sort for the vocab probe:\n$plan")
  }

  test("pending position deletes anti-join as a BROADCAST left-anti, never a shuffle") {
    // s25's `live` leg reads through un-compacted (file, pos) tombstones:
    // the tombstone side is O(matches) — broadcast is the only acceptable
    // plan shape (a shuffled anti-join would re-shuffle the whole table
    // to subtract a few thousand rows)
    val plan = planOf("s25_pos_delete")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"pos-delete read must broadcast the tombstones:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the table side must never sort for the tombstone probe:\n$plan")
  }

  test("one-pass funnel counts never Expand the input stream") {
    val plan = planOf("a2_funnel_onepass")
    assert(!plan.contains("Expand"),
      s"the one-pass rewrite must not replicate rows per distinct aggregate:\n$plan")
    // the multi-distinct original DOES expand — the pair documents the trade
    assert(planOf("a2_funnel_counts").contains("Expand"),
      "a2_funnel_counts no longer expands — fold the one-pass variant back in?")
  }

  test("rollup and cube lattices are one scan each, no per-level union") {
    for (name <- Seq("a9_rollup", "a9_cube")) {
      val plan = planOf(name)
      val nScans = "Scan parquet".r.findAllIn(plan).size
      assert(nScans == 1, s"$name: grouping sets must expand inside one aggregate, " +
        s"not rescan per level — got $nScans scans:\n$plan")
      assert(!plan.contains("Union"),
        s"$name must not union per-level aggregates:\n$plan")
    }
  }

  test("filtered ANN pushes the metadata predicate into the candidate scan") {
    val plan = planOf("ann_filtered_topk")
    // pre-filtering, not post-filtering: the label predicate must reach
    // the parquet scan so a selective filter prunes the index read
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(label".r.findFirstIn(plan).isDefined,
      s"label predicate must be pushed to the scan:\n$plan")
  }

  test("pinned-values pivot is one scan and one aggregate, no discovery pass") {
    val plan = planOf("a11_pivot")
    val nScans = "Scan parquet".r.findAllIn(plan).size
    assert(nScans == 1, s"pivot must not rescan to discover columns, got $nScans scans:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Expand"),
      s"pivot with pinned values is conditional aggregation, nothing more:\n$plan")
  }

  test("rolling range window partitions by user — never a global window") {
    val plan = planOf("w_rolling_range")
    val windows = "Window \\[[^\\n]*".r.findAllIn(plan).toSeq
    assert(windows.nonEmpty, s"expected a window operator:\n$plan")
    assert(windows.forall(_.contains("user_id")),
      s"every window must partition by user_id:\n${windows.mkString("\n")}")
  }

  test("bucketed co-located join plans zero Exchange end to end") {
    // both sides are bucketed on the join key and the follow-on agg
    // groups by that key — the layout must carry the partitioning
    // through join AND aggregation with no shuffle anywhere
    val plan = planOf("s11_bucketed_join")
    assert(!plan.contains("Exchange"),
      s"bucketed join+agg must not shuffle — the write-time layout is the point:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"scan must report bucketed reading:\n$plan")
  }

  test("temperature sampling broadcasts the per-language rate table") {
    val plan = planOf("sample_temperature")
    // the threshold table is <=|langs| rows — the corpus side must
    // probe it by broadcast, never shuffle for the rate lookup
    assert(plan.contains("BroadcastHashJoin"),
      s"rate table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must never sort-merge against a <=|langs|-row table:\n$plan")
  }

  test("classifier scoring hash-joins the word dictionary; only the 1-row total nested-loops") {
    val plan = planOf("text_classifier_score")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 1, s"expected at most the 1-row totals as nested-loop, got $bnlj:\n$plan")
    assert(plan.contains("HashJoin"),
      s"dictionary probe must be a hash join:\n$plan")
  }

  test("LM scoring joins its dictionaries by hash; only the 1-row total nested-loops") {
    val plan = planOf("text_lm_score")
    // the train-tier token total is a broadcast single row — the one
    // legitimate nested-loop; bigram/unigram dictionaries must hash-join
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 1, s"expected at most the 1-row total as nested-loop, got $bnlj:\n$plan")
    assert(plan.contains("HashJoin"),
      s"dictionary probes must be hash joins:\n$plan")
  }

  test("substring-span dedup joins positions on the window hash, never nested-loop") {
    val plan = planOf("dedup_substring_spans")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"dup-position recovery must key on the hash:\n$plan")
    // span merging must stay doc-local: every gaps-and-islands window
    // spec partitions by doc_id (a window without a partition key would
    // drag the whole position set onto one task)
    val windows = "Window \\[[^\\n]*".r.findAllIn(plan).toSeq
    assert(windows.nonEmpty, s"islands need a doc-local window:\n$plan")
    assert(windows.forall(_.contains("doc_id")),
      s"every window must partition by doc_id:\n${windows.mkString("\n")}")
  }

  test("substring cut picks keep-first via min-aggregate, never a per-hash window sort") {
    val plan = planOf("dedup_substring_cut")
    // a row_number-over-hash formulation would drag a hot hash (the
    // million-fold repeated span) onto one task; min(packed) combines
    // map-side. The only acceptable plan has NO window operator at all.
    assert(!plan.contains("Window"),
      s"keep-first must be an aggregate, not a window function:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("8-dim response enrichment broadcasts every dim join") {
    val plan = planOf("v_event_enriched_bid_responses")
    // same contract as the 12-dim full-funnel pin: the per-bid fact
    // stream must never shuffle for a dim
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(nBroadcast >= 8, s"expected >=8 broadcast dim joins, got $nBroadcast\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a dim join fell back to sort-merge:\n$plan")
  }

  test("repetition metrics plan a pure scan projection — no shuffle, no aggregate") {
    val plan = planOf("text_repetition")
    // the per-row sorted-run rewrite must keep the whole operator inside
    // the scan's codegen stage: an Exchange or HashAggregate here means
    // the corpus-bigram histogram crept back
    assert(!plan.contains("Exchange"),
      s"text_repetition shuffles:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"text_repetition re-grew a histogram aggregation:\n$plan")
  }

  test("supply-side request enrichment broadcasts all four dims, zero shuffles") {
    val plan = planOf("v_event_enriched_bid_requests")
    // a pure per-row view: scan + 4 broadcast joins (one multi-key) —
    // no dim join may shuffle the fact stream. The ONE permitted
    // exchange is the fixture's injected-duplicate collapse
    // (dropDuplicates on request id), which the reference's
    // zero-duplicate default never needs.
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(nBroadcast >= 4, s"expected >=4 broadcast dim joins, got $nBroadcast\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a dim join fell back to sort-merge:\n$plan")
    val nShuffle = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(nShuffle <= 1,
      s"row-level view shuffles beyond the id-dedup ($nShuffle):\n$plan")
  }

  test("dashboard chart re-aggregations stay top-k, overlays broadcast their dim") {
    // the chart layer re-aggregates a serving table and takes the top
    // rows — TakeOrderedAndProject (per-partition heaps), never a
    // global Sort+Limit of all groups
    for (name <- Seq("dash1_requests_by_country", "dash8_rolling_wins_by_bidder",
        "dash9_funnel_by_publisher")) {
      val plan = planOf(name)
      assert(plan.contains("TakeOrderedAndProject"),
        s"$name does not plan a top-k:\n$plan")
    }
    // each realtime overlay is its base table's plan + ONE broadcast dim
    for (name <- Seq("v_realtime_bid_landscape_hourly",
        "v_realtime_funnel_by_publisher", "v_realtime_rolling_metrics_by_bidder")) {
      val plan = planOf(name)
      assert(plan.contains("BroadcastHashJoin"),
        s"$name dim overlay does not broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$name dim overlay fell back to sort-merge:\n$plan")
    }
  }

  test("reservoir sample is one k-bounded aggregation — no window, no global sort") {
    val plan = planOf("sample_reservoir")
    // the oracle states a per-stratum row_number window; the Spark plan
    // must instead be a single TopKPriorityAgg pass: partial
    // ObjectHashAggregate below the exchange + final above, so map
    // tasks ship <=k items per language and no stratum is ever
    // buffered or sorted whole
    val nObjAgg = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(nObjAgg >= 2, s"expected partial+final ObjectHashAggregate:\n$plan")
    assert(plan.contains("top_k_priority"),
      s"expected the k-bounded top_k_priority aggregate:\n$plan")
    assert(!plan.contains("Window"), s"reservoir sample plans a window:\n$plan")
    assert(!"Sort \\[".r.findFirstIn(plan).isDefined,
      s"reservoir sample plans a sort:\n$plan")
    val nShuffle = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(nShuffle <= 1,
      s"reservoir sample shuffles more than the one agg exchange ($nShuffle):\n$plan")
  }

  test("dq quality rollup joins hour-grain aggregates, never raw streams") {
    val plan = planOf("dq_event_quality_hourly")
    // every join input is an hourly aggregate (<= |hours| rows), so all
    // five spine joins must be broadcast-sized — a sort-merge here means
    // a raw stream leaked past its aggregate
    assert(!plan.contains("SortMergeJoin"),
      s"a spine join fell back to sort-merge over raw rows:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}

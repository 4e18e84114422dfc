package graft.functions

import graft.QueryDef
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import SharedHash.{h64, h64Sql}

/** Distributed sketch operators — the approximate aggregates a 100 TB
  * engine runs where exact answers would shuffle the corpus:
  * HyperLogLog distinct counting and count-min frequency estimation.
  *
  * Both sketches are built from the engine-portable [[SharedHash]], with
  * every register/counter INTEGER-exact, so the DuckDB oracle reproduces
  * the sketch bit-for-bit — the estimates are approximate with respect
  * to the true cardinality, but fully deterministic with respect to the
  * data. (Spark's built-in approx_count_distinct/HLL++ cannot be
  * oracle-checked; this formulation can.)
  *
  * Scale notes (100 TB discipline):
  *  - HLL: the register table is (group × 256 buckets) max-aggregated —
  *    partial aggregation collapses each map task to ≤ 256 rows per
  *    group before the shuffle, the textbook mergeable-sketch property;
  *  - count-min: cell counts are additive, so the sketch builds with
  *    map-side combine into d×w = 4096 cells regardless of corpus size,
  *    and point queries join against a broadcastable cell table.
  */
object SketchOps {

  private val HllM = 256 // buckets; relative error ≈ 1.04/√m ≈ 6.5%
  // 60-bit hash → 8 bucket bits + 52 rank bits; rank ∈ [1, 53]
  private val RankBits = 52

  /** alpha_m · m² · 2^(RankBits+1), precomputed so BOTH engines parse the
    * identical double literal (a DuckDB decimal literal would run the
    * constant arithmetic in DECIMAL and diverge).
    */
  private val HllNum: Double =
    0.7213 / (1 + 1.079 / HllM) * (HllM.toDouble * HllM) * 9007199254740992.0

  /** HyperLogLog distinct event_ids per event_type. Registers are
    * max(number of leading zero bits in the 52-bit suffix)+1 per bucket;
    * the harmonic sum is carried as Σ 2^(53−M_j) in BIGINT (exact — max
    * 256·2^53 < 2^62), and only the final alpha·m²/Σ division is double.
    * Estimates land within ~1.3% of exact at sf0.01 (raw estimator, no
    * small-range correction — accuracy pinned separately in
    * SketchSpec).
    */
  val hllDistinct: QueryDef = QueryDef(
    "hll_distinct",
    s"""WITH h AS (
       |  SELECT event_type,
       |         ${h64Sql("'hll|' || CAST(event_id AS VARCHAR)")} AS h
       |  FROM events),
       |r AS (
       |  SELECT event_type, h % $HllM AS bucket,
       |         CASE WHEN h // $HllM = 0 THEN ${RankBits + 1}
       |              ELSE ${RankBits + 1} - length(bin(h // $HllM)) END AS rank
       |  FROM h),
       |m AS (SELECT event_type, bucket, max(rank) AS mj FROM r GROUP BY 1, 2),
       |s AS (SELECT event_type, count(*) AS n_present,
       |             sum(1::BIGINT << (${RankBits + 1} - mj))::BIGINT AS s_present
       |      FROM m GROUP BY 1)
       |SELECT event_type,
       |       $HllM - n_present AS v_zero,
       |       s_present + ($HllM - n_present) * 9007199254740992 AS s_scaled,
       |       CAST(floor($HllNum /
       |            CAST(s_present + ($HllM - n_present) * 9007199254740992 AS DOUBLE))
       |            AS BIGINT) AS hll_est
       |FROM s""".stripMargin) { t =>
    val h = h64(concat(lit("hll|"), col("event_id").cast("string")))
    val regs = t.events
      .select(col("event_type"), h.as("h"))
      .select(col("event_type"), (col("h") % HllM).as("bucket"),
        when(expr(s"h div $HllM") === 0, RankBits + 1)
          .otherwise(lit(RankBits + 1) - length(bin(expr(s"h div $HllM"))))
          .as("rank"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rank")).as("mj"))
    regs
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${RankBits + 1} - mj)")).as("s_present"))
      .select(col("event_type"),
        (lit(HllM) - col("n_present")).as("v_zero"),
        (col("s_present") + (lit(HllM) - col("n_present")) * 9007199254740992L)
          .as("s_scaled"))
      .withColumn("hll_est",
        floor(lit(HllNum) / col("s_scaled").cast("double")).cast("long"))
  }

  private[graft] val CmD = 4    // hash rows
  private[graft] val CmW = 1024 // cells per row

  /** The CM cell index for (row i, term) — ONE definition shared by the
    * batch query, the streaming partial builder, and the point-query
    * side, so the three can never hash apart.
    */
  private[graft] def cmCellOf(i: org.apache.spark.sql.Column,
      term: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    h64(concat(i.cast("string"), lit("|"), term)) % CmW

  /** CM partials for one slice of the corpus: d×w additive cell counts
    * `(i, cell, cnt)`. Counts are additive across slices, so appending a
    * partial per micro-batch and summing at read IS the sketch merge —
    * the same mergeable-partial shape the histogram quantile sketch
    * streams ([[graft.streaming.Sinks.quantileSketchAppend]]). Each
    * partial is ≤ d×w rows regardless of slice size.
    */
  private[graft] def cmCells(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    cmCellsOfTermCounts(docs
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(length(col("term")) >= 3)
      .groupBy(col("term")).agg(count(lit(1)).as("n")))

  /** The cell fold over per-term totals `(term, n)` — ONE body shared by
    * [[cmCells]] and the streamed fan-outs that already hold a term
    * aggregate, so the three call sites cannot hash apart.
    */
  private[graft] def cmCellsOfTermCounts(termCounts: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    termCounts
      .select(col("n"), explode(sequence(lit(0), lit(CmD - 1))).as("i"),
        col("term"))
      .groupBy(col("i"), cmCellOf(col("i"), col("term")).as("cell"))
      .agg(sum(col("n")).as("cnt"))

  /** Count-min heavy hitters: a d×w additive counter sketch over the
    * corpus vocabulary, point-queried at the exact top-20 terms. The
    * classic one-sided guarantee holds exactly (n_cm >= n_exact, over-
    * count bounded by collisions); SketchSpec pins it. At 100 TB the
    * cell table (4096 rows) replaces a vocabulary-sized shuffle for
    * frequency estimates.
    */
  val cmHeavyHitters: QueryDef = QueryDef(
    "cm_heavy_hitters",
    s"""WITH w AS (
       |  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
       |  FROM documents),
       |t AS (SELECT term, count(*) AS n_exact FROM w WHERE length(term) >= 3
       |      GROUP BY term),
       |cells AS (
       |  SELECT i, ${h64Sql("CAST(i AS VARCHAR) || '|' || term")} % $CmW AS cell,
       |         sum(n_exact)::BIGINT AS cnt
       |  FROM t, (SELECT unnest(generate_series(0, ${CmD - 1})) AS i)
       |  GROUP BY 1, 2),
       |top20 AS (SELECT term, n_exact FROM t ORDER BY n_exact DESC, term LIMIT 20)
       |SELECT top20.term, top20.n_exact, min(cells.cnt)::BIGINT AS n_cm
       |FROM top20, (SELECT unnest(generate_series(0, ${CmD - 1})) AS i) q
       |JOIN cells ON cells.i = q.i
       |          AND cells.cell =
       |              ${h64Sql("CAST(q.i AS VARCHAR) || '|' || top20.term")} % $CmW
       |GROUP BY 1, 2""".stripMargin) { t =>
    val tf = t.documents
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(length(col("term")) >= 3)
      .groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
    val cells = tf
      .select(col("term"), col("n_exact"),
        explode(sequence(lit(0), lit(CmD - 1))).as("i"))
      .groupBy(col("i"), cmCellOf(col("i"), col("term")).as("cell"))
      .agg(sum(col("n_exact")).as("cnt"))
    val top20 = tf.orderBy(col("n_exact").desc, col("term")).limit(20)
    val probes = top20
      .select(col("term"), col("n_exact"),
        explode(sequence(lit(0), lit(CmD - 1))).as("i"))
      .withColumn("cell", cmCellOf(col("i"), col("term")))
    broadcast(probes).join(cells, Seq("i", "cell"))
      .groupBy(col("term"), col("n_exact"))
      .agg(min(col("cnt")).as("n_cm"))
  }

  // ---- histogram quantile sketch (the scale twin of exact a10_quantiles) ----

  private[graft] val QBinW = 4096L    // cents per bin (~$40.96) — the error bound
  private[graft] val QPms = Seq(250, 500, 900) // per-mille targets: p25/p50/p90

  /** Bin stage: value → integer-cent bin, counted per (group, bin). The
    * counts are additive, so Catalyst's partial aggregation collapses
    * every map task to ≤ #bins rows per group before the shuffle —
    * the mergeable-sketch property that makes this the 100 TB form of a
    * percentile (exact percentile sorts each group; this never sorts the
    * data, only the tiny bin table).
    */
  private[graft] def quantileBins(df: org.apache.spark.sql.DataFrame,
      valueExpr: String, groupCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(groupCol),
        expr(s"CAST(round(($valueExpr) * 100) AS BIGINT) DIV $QBinW").as("bin"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Estimate stage: CDF walk over the bin table (windows run over ≤ a
    * few thousand bin rows per group, never the raw data) with ALL-
    * INTEGER rank arithmetic — percentiles are per-mille ints and the
    * within-bin midpoint interpolation is a half-up integer division, so
    * both engines compute identical BIGINTs and only the final /100.0 is
    * floating point.
    */
  private[graft] def quantileFromBins(bins: org.apache.spark.sql.DataFrame,
      groupCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    bins
      .withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(groupCol).orderBy("bin")))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(groupCol)))
      .select(col("*"), explode(array(QPms.map(lit(_)): _*)).as("pm"))
      .withColumn("r", expr("(pm * n + 999) DIV 1000"))
      .filter(col("cum") - col("cnt") < col("r") && col("r") <= col("cum"))
      .select(col(groupCol), col("pm"),
        expr(s"CAST(bin * $QBinW + ($QBinW * (2 * (r - cum + cnt) - 1)) DIV (2 * cnt) AS DOUBLE) / 100.0")
          .as("approx_value"),
        col("n"))
  }

  /** Approximate per-group percentiles of l_extendedprice via the
    * histogram sketch — deterministic (oracle-checkable, unlike Spark's
    * built-in approx_percentile/t-digest) and accurate to one bin width.
    * The exact twin is a10_quantiles; its docstring names this operator
    * as the form that survives 100 TB.
    */
  val approxPercentile: QueryDef = QueryDef(
    "approx_percentile_hist",
    s"""WITH b AS (
       |  SELECT l_returnflag,
       |         CAST(round(l_extendedprice * 100) AS BIGINT) // $QBinW AS bin,
       |         count(*) AS cnt
       |  FROM lineitem GROUP BY 1, 2),
       |c AS (
       |  SELECT l_returnflag, bin, cnt,
       |         CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS BIGINT) AS cum,
       |         CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
       |  FROM b),
       |x AS (
       |  SELECT c.*, p.pm, (p.pm * c.n + 999) // 1000 AS r
       |  FROM c, (SELECT unnest([${QPms.mkString(", ")}]) AS pm) p)
       |SELECT l_returnflag, pm,
       |       CAST(bin * $QBinW + ($QBinW * (2 * (r - cum + cnt) - 1)) // (2 * cnt) AS DOUBLE) / 100.0 AS approx_value,
       |       n
       |FROM x WHERE cum - cnt < r AND r <= cum""".stripMargin) { t =>
    quantileFromBins(
      quantileBins(t.lineitem, "l_extendedprice", "l_returnflag"), "l_returnflag")
  }

  // ---- KMV (k-minimum-values) theta sketch: distinct + set algebra ----

  private[functions] val KmvK = 256 // relative error ≈ 1/√(k−2) ≈ 6.3%
  private val KmvM = 1L << 60       // h64 hash space

  private def kmvSketch(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      KmvSketchAgg(org.apache.spark.sql.GraftSqlBridge.expression(c), KmvK)
        .toAggregateExpression())

  /** D̂ from a sketch array: exact when unsaturated, (k−1)·M/h_k when
    * full. The only floating-point step is the final division, written
    * with identical literals and operand order in both engines.
    */
  private def kmvEst(sk: Column, exactWhenSmall: Column): Column =
    when(size(sk) < KmvK, exactWhenSmall)
      .otherwise(floor(lit((KmvK - 1).toDouble) *
        (lit(KmvM.toDouble) / element_at(sk, KmvK).cast("double"))).cast("long"))

  private val kmvEstSql =
    s"CAST(floor(${KmvK - 1}.0 * (1152921504606846976.0 / CAST(hk AS DOUBLE))) AS BIGINT)"

  /** Distinct word-bigram count per language via the [[KmvSketchAgg]]
    * native aggregate (bigrams, not unigrams — the synthetic corpus has
    * a ~31-word vocabulary, and the sketch must actually SATURATE for
    * the estimator to be exercised; ~900 distinct bigrams per language
    * do that). The exact count is computed alongside purely so the
    * oracle row documents the sketch's realized accuracy — at 100 TB
    * only the sketch runs: the aggregation state is ≤ k longs per group
    * at every partial, where exact distinct shuffles every gram.
    */
  val kmvDistinct: QueryDef = QueryDef(
    "kmv_distinct",
    s"""WITH w AS (SELECT lang, string_split(text, ' ') AS ws FROM documents
       |           WHERE len(string_split(text, ' ')) >= 2),
       |tk AS (
       |  SELECT lang, ${h64Sql("g")} AS h
       |  FROM (SELECT lang, unnest(list_transform(range(1, len(ws)),
       |                       i -> ws[i] || ' ' || ws[i + 1])) AS g
       |        FROM w)),
       |d AS (SELECT DISTINCT lang, h FROM tk),
       |r AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM d),
       |s AS (SELECT lang, count(*) AS nd,
       |             max(CASE WHEN rn = $KmvK THEN h END) AS hk
       |      FROM r GROUP BY lang)
       |SELECT lang, CAST(nd AS BIGINT) AS n_exact,
       |       CASE WHEN nd < $KmvK THEN CAST(nd AS BIGINT) ELSE $kmvEstSql END AS est_distinct
       |FROM s""".stripMargin) { t =>
    val toks = t.documents
      .select(col("lang"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("lang"),
        explode(transform(sequence(lit(1), size(col("ws")) - 1),
          i => concat(element_at(col("ws"), i), lit(" "),
            element_at(col("ws"), i + 1)))).as("g"))
      .select(col("lang"), h64(col("g")).as("h"))
    toks.groupBy(col("lang"))
      .agg(kmvSketch(col("h")).as("sk"), countDistinct(col("h")).as("n_exact"))
      .select(col("lang"), col("n_exact"),
        kmvEst(col("sk"), col("n_exact")).as("est_distinct"))
  }

  /** Set algebra on two KMV sketches — union, intersection, and Jaccard
    * of the src0/src1 token vocabularies WITHOUT comparing the
    * vocabularies: the k smallest of K(A) ∪ K(B) is a valid sketch of
    * A ∪ B, every element of it is ≤ both inputs' k-th minima (so
    * sketch membership decides set membership), and the intersection
    * estimate is the union estimate scaled by the matched fraction —
    * all-integer per-mille arithmetic, bit-identical across engines.
    * This is what replaces an exact token-set join between two corpus
    * slices at 100 TB: two ≤k-long arrays meet on the driver instead of
    * two token shuffles meeting in an equi-join.
    */
  val kmvJaccard: QueryDef = QueryDef(
    "kmv_jaccard",
    s"""WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents
       |           WHERE source IN ('src0', 'src1')
       |             AND len(string_split(text, ' ')) >= 2),
       |tk AS (
       |  SELECT source, ${h64Sql("g")} AS h
       |  FROM (SELECT source, unnest(list_transform(range(1, len(ws)),
       |                         i -> ws[i] || ' ' || ws[i + 1])) AS g
       |        FROM w)),
       |d AS (SELECT DISTINCT source, h FROM tk),
       |ka AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
       |                      FROM d WHERE source = 'src0') WHERE rn <= $KmvK),
       |kb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
       |                      FROM d WHERE source = 'src1') WHERE rn <= $KmvK),
       |u AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)),
       |uk AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM u),
       |kk AS (SELECT count(*) AS nu,
       |              count(CASE WHEN rn <= $KmvK THEN 1 END) AS sz,
       |              max(CASE WHEN rn = $KmvK THEN h END) AS hk,
       |              count(CASE WHEN rn <= $KmvK AND h IN (SELECT h FROM ka)
       |                          AND h IN (SELECT h FROM kb) THEN 1 END) AS ic
       |       FROM uk),
       |e AS (SELECT sz, ic,
       |             CASE WHEN nu < $KmvK THEN CAST(nu AS BIGINT) ELSE $kmvEstSql END AS ue
       |      FROM kk)
       |SELECT ue AS n_union_est,
       |       (ue * ic) // sz AS n_inter_est,
       |       (1000 * ic) // sz AS jaccard_permille
       |FROM e WHERE sz > 0
       |  AND EXISTS (SELECT 1 FROM ka) AND EXISTS (SELECT 1 FROM kb)""".stripMargin) { t =>
    // the EXISTS pair keeps the two engines row-parity-exact on corpora
    // where a SOURCE is empty: the Spark side's cross join of two
    // one-sketch-per-source frames yields 0 rows whenever either source
    // vanishes, while the bare SQL aggregate would still emit its one
    // row estimating the surviving source alone
    val toks = t.documents
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("source"),
        explode(transform(sequence(lit(1), size(col("ws")) - 1),
          i => concat(element_at(col("ws"), i), lit(" "),
            element_at(col("ws"), i + 1)))).as("g"))
      .select(col("source"), h64(col("g")).as("h"))
    val sk = toks.groupBy(col("source")).agg(kmvSketch(col("h")).as("sk"))
    val a = sk.filter(col("source") === "src0").select(col("sk").as("ska"))
    val b = sk.filter(col("source") === "src1").select(col("sk").as("skb"))
    a.crossJoin(b)
      .withColumn("uall", array_sort(array_union(col("ska"), col("skb"))))
      .withColumn("nu", size(col("uall")).cast("long"))
      .withColumn("uk", slice(col("uall"), 1, KmvK))
      .withColumn("sz", least(lit(KmvK.toLong), col("nu")))
      .withColumn("ic",
        size(array_intersect(array_intersect(col("uk"), col("ska")), col("skb"))).cast("long"))
      .withColumn("ue", kmvEst(col("uk"), col("nu")))
      .select(col("ue").as("n_union_est"),
        expr("(ue * ic) div sz").as("n_inter_est"),
        expr("(1000 * ic) div sz").as("jaccard_permille"))
  }

  val all: Seq[QueryDef] =
    Seq(hllDistinct, cmHeavyHitters, approxPercentile, kmvDistinct, kmvJaccard)
}

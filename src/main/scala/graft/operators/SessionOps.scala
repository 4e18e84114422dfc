package graft.operators

import graft.QueryDef
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior time operators: gap-based sessionization and the as-of
  * (nearest-predecessor) join. Both are staples of event analytics the
  * reference expresses over its event stream (funnel windows,
  * design doc :744-779, :1136-1139) and that a training-data pipeline
  * needs for behavioral corpora (session-grouped documents, "state at
  * time of event" attribution).
  *
  * Scale notes (100 TB discipline):
  *  - sessionize uses Spark's native `session_window` — a single hash
  *    shuffle on user_id, then per-key window merging inside the
  *    aggregation operator (no self-join, no windowed sort pass in the
  *    batch plan). Works identically in Structured Streaming with a
  *    watermark (state-store-backed merging) — the streaming twin is
  *    graft.streaming.EventStreams.sessionized, asserted equal to this
  *    batch form in StreamingSpec.
  *  - the as-of join is the union-tag form: ONE shuffle on user_id and
  *    one ordered window pass, instead of the naive
  *    `JOIN ... ON b.ts <= a.ts` interval join whose candidate set grows
  *    O(clicks × purchases) per user. A hot key (bot user) concentrates
  *    in one partition — at 100 TB, pre-split such keys by day and take
  *    the per-day as-of, carrying the last click of the previous day as
  *    a seed row.
  */
object SessionOps {

  /** W7 — gap-based sessionization (30 min inactivity gap) via the native
    * session_window operator. A session's end is last-event + gap, so
    * back-to-back sessions tile without overlap; the oracle reproduces
    * the merge with LAG + a cumulative break counter (identical
    * semantics: a new session starts when ts >= prev_ts + gap).
    */
  val wSessionize: QueryDef = QueryDef(
    "w_sessionize",
    """WITH o AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
      |  FROM events),
      |s AS (
      |  SELECT *, sum(CASE WHEN pts IS NULL OR ts >= pts + INTERVAL 30 MINUTE
      |                     THEN 1 ELSE 0 END)
      |            OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                  ROWS UNBOUNDED PRECEDING) AS sn
      |  FROM o)
      |SELECT user_id,
      |       CAST(min(ts) AS TIMESTAMP)                     AS session_start,
      |       CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
      |       count(*)                                       AS n_events,
      |       count(DISTINCT event_type)                     AS n_types,
      |       round(sum(value), 2)                           AS total_value
      |FROM s GROUP BY user_id, sn""".stripMargin) { t =>
    t.events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        round(sum(col("value")), 2).as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("n_types"), col("total_value"))
  }

  /** J11 — as-of join: each purchase picks the most recent click (ts <=,
    * deterministic event_id tie-break) by the same user. Implemented as
    * union-tag + one running `last(ignoreNulls)` window — clicks sort
    * before purchases at equal ts so the match is inclusive, exactly the
    * ASOF JOIN contract. LEFT semantics: a purchase with no prior click
    * keeps NULL match columns.
    */
  val j11AsofJoin: QueryDef = QueryDef(
    "j11_asof_join",
    """WITH t AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         CASE WHEN event_type = 'click' THEN ts       END AS c_ts,
      |         CASE WHEN event_type = 'click' THEN event_id END AS c_id
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |w AS (
      |  SELECT *,
      |    last_value(c_ts IGNORE NULLS) OVER
      |      (PARTITION BY user_id
      |       ORDER BY ts, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END, event_id
      |       ROWS UNBOUNDED PRECEDING) AS click_ts,
      |    last_value(c_id IGNORE NULLS) OVER
      |      (PARTITION BY user_id
      |       ORDER BY ts, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END, event_id
      |       ROWS UNBOUNDED PRECEDING) AS click_event_id
      |  FROM t)
      |SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      |       CAST(click_ts AS TIMESTAMP) AS click_ts, click_event_id,
      |       (epoch_ms(ts) - epoch_ms(click_ts)) // 1000 AS gap_s
      |FROM w WHERE event_type = 'purchase'""".stripMargin) { t =>
    val tagged = t.events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        when(col("event_type") === "click", col("ts")).as("c_ts"),
        when(col("event_type") === "click", col("event_id")).as("c_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), when(col("event_type") === "click", 0).otherwise(1), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("click_ts", last(col("c_ts"), ignoreNulls = true).over(w))
      .withColumn("click_event_id", last(col("c_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("click_ts"),
        col("click_event_id"),
        expr("(unix_millis(ts) - unix_millis(click_ts)) div 1000").as("gap_s"))
  }

  val all: Seq[QueryDef] = Seq(wSessionize, j11AsofJoin)
}

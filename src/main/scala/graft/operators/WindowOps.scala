package graft.operators

import graft.QueryDef
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-window operators from SURVEY.md §2.6: sliding (W1) and tumbling
  * (W2) event-time windows, and the ROW_NUMBER dedup pattern the reference
  * designs for late/duplicate events (.design doc :1136-1139).
  *
  * The streaming (watermarked) forms are
  * graft.streaming.EventStreams.tumblingHourly / sliding / dedup,
  * asserted equal to these batch twins by StreamingSpec; these batch
  * twins are the oracle-checked semantics. Spark's `window()` aligns
  * window starts to the epoch in multiples of the slide — the oracle
  * reproduces that with integer epoch arithmetic, so the two agree
  * exactly.
  */
object WindowOps {

  /** W1 — sliding window, 1 h size / 15 min hop (reference HOP 5 min/1 min,
    * aggregation_jobs.sql:60-81), per event type.
    */
  val w1SlidingWindow: QueryDef = QueryDef(
    "w1_sliding_window",
    """WITH hopped AS (
      |  SELECT make_timestamp(((epoch_ms(ts) // 1000 // 900) * 900 - k * 900) * 1000000)
      |           AS window_start,
      |         event_type, value
      |  FROM events, (SELECT unnest(generate_series(0, 3)) AS k))
      |SELECT window_start,
      |       window_start + INTERVAL 1 HOUR AS window_end,
      |       event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM hopped
      |GROUP BY 1, 2, 3""".stripMargin) { t =>
    t.events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** W2 — tumbling 1 h window (design :744-779; implemented in the
    * reference as FLOOR(ts TO HOUR) buckets, aggregation_jobs.sql:26).
    */
  val w2TumblingWindow: QueryDef = QueryDef(
    "w2_tumbling_window",
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
      |       event_type, count(*) AS n,
      |       round(sum(value), 2) AS total_value,
      |       CAST((CAST(round(round(sum(value), 2) * 100) AS BIGINT) * 200 + count(*))
      |            // (2 * count(*)) AS DOUBLE) / 10000 AS avg_value
      |FROM events GROUP BY 1, 2""".stripMargin) { t =>
    // avg derives from the ROUNDED total via INTEGER arithmetic: engines
    // sum doubles in different orders, so a raw avg() can land on a
    // rounding boundary, and even round(total/n, 4) ties exactly at the
    // half-step (seen at sf0.1: 1512.12/32 = 47.25375 — Spark HALF_UPs
    // the decimal string, DuckDB floors the double multiply). Half-up
    // division of the agreed cents total in BIGINT is identical
    // everywhere: (cents*200 + n) div (2n) / 1e4.
    t.events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"))
      .withColumn("avg_value",
        expr("CAST((CAST(round(total_value * 100) AS BIGINT) * 200 + n) DIV (2 * n) AS DOUBLE) / 10000"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total_value"), col("avg_value"))
  }

  /** ROW_NUMBER dedup — keep the latest event per (user, type)
    * (design :1136-1139: ROW_NUMBER() OVER (PARTITION BY id ORDER BY ts
    * DESC) = 1). Deterministic tie-break on event_id.
    */
  val wDedupRownum: QueryDef = QueryDef(
    "w_dedup_rownum",
    """SELECT event_id, user_id, event_type,
      |       CAST(ts AS TIMESTAMP) AS ts, round(value, 2) AS value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
      |                                   ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1""".stripMargin) { t =>
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t.events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), round(col("value"), 2).as("value"))
  }

  /** Rolling RANGE-frame window (extension beyond the reference's §2.6
    * rows, which stop at W6): per-user trailing-1-hour event
    * count and spend at EVERY event (the "velocity" feature of fraud/
    * engagement scoring — how much did this user do in the last hour
    * as of now). A RANGE frame differs from both the hop/tumble
    * aggregations (W1/W2: per-bucket, not per-event) and ROWS frames
    * (a fixed row count, not a time horizon): peers at the same
    * timestamp always share a frame, so the result is deterministic
    * under any intra-timestamp order — which is what makes it
    * oracle-exact. Money through exact cents. Scale shape: the window
    * partitions by user_id — per-user state streams through one task
    * at a time in timestamp order, no all-to-one window, and the
    * streaming twin is the horizon-bounded state the funnel already
    * uses (arrival rate × 1 h per user).
    */
  val w3RollingRange: QueryDef = QueryDef(
    "w_rolling_range",
    """SELECT event_id, user_id,
      |       CAST(ts AS TIMESTAMP) AS ts,
      |       CAST(count(*) OVER w AS BIGINT) AS n_1h,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id
      |             ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)) // 1000
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin) { t =>
    // integer SECONDS on both sides (epoch_ms//1000 there, cast long
    // here): a fractional-seconds ordering key would put the same event
    // in different frames in the two engines at the horizon boundary
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch_s"))
      .rangeBetween(-3600L, Window.currentRow)
    t.events
      .withColumn("epoch_s", col("ts").cast("long"))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select(col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("cents")).over(w).as("cents_1h"))
  }

  /** LAG/LEAD offset windows (extension beyond §2.6, like
    * [[w3RollingRange]]): per-user inter-event gap (seconds
    * since the previous event) and the next event's type — the
    * session-boundary / think-time features. Deterministic total order
    * inside each user partition via the (ts, event_id) tie-break;
    * integer-seconds arithmetic so both engines subtract identical
    * values. Partitioned by user_id like [[w3RollingRange]] — per-user
    * streams, never a global window.
    */
  val w4LagDelta: QueryDef = QueryDef(
    "w_lag_delta",
    """SELECT event_id, user_id, event_type,
      |       CAST(ts AS TIMESTAMP) AS ts,
      |       CAST(epoch_ms(CAST(ts AS TIMESTAMP)) // 1000
      |            - lag(epoch_ms(CAST(ts AS TIMESTAMP)) // 1000)
      |              OVER w AS BIGINT) AS gap_s,
      |       lead(event_type) OVER w AS next_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) { t =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t.events
      .withColumn("epoch_s", col("ts").cast("long"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        (col("epoch_s") - lag(col("epoch_s"), 1).over(w)).as("gap_s"),
        lead(col("event_type"), 1).over(w).as("next_type"))
  }

  val all: Seq[QueryDef] =
    Seq(w1SlidingWindow, w2TumblingWindow, wDedupRownum, w3RollingRange,
      w4LagDelta)
}

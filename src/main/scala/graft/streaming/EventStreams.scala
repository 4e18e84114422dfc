package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming transforms over the event stream — the engine's
  * equivalents of the reference's Flink streaming jobs. Every function
  * takes a STREAMING DataFrame (MemoryStream in tests, file/kafka source
  * in production) with the events schema
  * `(event_id, ts: timestamp, user_id, event_type, value)` and returns a
  * streaming DataFrame; sinks live in [[Sinks]].
  *
  * Reference provenance:
  *  - 30 s event-time watermark on every source
  *    (streaming/flink/sql/create_tables.sql:71-73)                — W3/S2
  *  - per-stream dedup before joins (aggregation_jobs.sql:31-50)   — A3
  *  - continuous hourly keyed aggregation feeding an upsert sink
  *    (aggregation_jobs.sql:19-26)                                 — A7/W2
  *  - sliding HOP window (aggregation_jobs.sql:60-81)              — W1
  *  - stream-stream interval join (aggregation_jobs.sql:42-52)     — J1
  *  - chained LEFT interval-join funnel (funnel_jobs.sql:54-63)    — J3
  *
  * The batch twins of these transforms are the oracle-checked queries in
  * graft.operators (w1/w2/a3/j1/j7); StreamingSpec feeds identical rows
  * through both forms and asserts equal results.
  */
object EventStreams {

  /** W3 — the reference's 30 s late tolerance on all sources. */
  val WatermarkDelay = "30 seconds"

  def withWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", WatermarkDelay)

  /** A3 (streaming form) — drop duplicate event ids arriving within the
    * watermark horizon. State is evicted as the watermark passes, so
    * state size is bounded by (arrival rate × delay), not stream length.
    */
  def dedup(events: DataFrame): DataFrame =
    withWatermark(events).dropDuplicatesWithinWatermark("event_id")

  /** A7/W2 — continuous hourly aggregation. Run in update mode into the
    * keyed upsert sink ([[Sinks.hourlyUpsert]]): each micro-batch
    * re-emits revised (window_start, event_type) rows as late events
    * arrive — the reference's FLOOR(ts TO HOUR) + upsert-table pattern.
    * Output columns match the batch twin `w2_tumbling_window` exactly.
    */
  def tumblingHourly(events: DataFrame): DataFrame =
    withWatermark(events)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"))
      .withColumn("avg_value",
        expr("CAST((CAST(round(total_value * 100) AS BIGINT) * 200 + n) DIV (2 * n) AS DOUBLE) / 10000"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total_value"), col("avg_value"))

  /** W1 — sliding window (1 h size / 15 min hop), matching
    * `w1_sliding_window`.
    */
  def sliding(events: DataFrame): DataFrame =
    withWatermark(events)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** W7 — gap-based sessionization (30 min inactivity), matching
    * `w_sessionize`. session_window merges per-key state as events
    * arrive and finalizes a session once the watermark passes its end —
    * state is bounded by the set of OPEN sessions, not stream length.
    * `n_types` uses size(collect_set(…)) because streaming aggregations
    * reject COUNT(DISTINCT); the batch twin pins the equivalence.
    */
  def sessionized(events: DataFrame): DataFrame =
    withWatermark(events)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        size(collect_set(col("event_type"))).cast("long").as("n_types"),
        round(sum(col("value")), 2).as("total_value"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("n_types"), col("total_value"))

  /** J1 — stream-stream INNER interval join: click within 30 min of a
    * view by the same user. Emits the raw pairs (the batch twin
    * aggregates them; chaining another stateful agg is possible but the
    * pair stream is what the test compares). Both sides watermarked; the
    * time bound lets Spark evict join state — the analog of the
    * reference's 24 h state TTL (aggregation_jobs.sql:14).
    */
  def intervalJoinPairs(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", WatermarkDelay)
    val c = clicks
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", WatermarkDelay)
    v.join(c,
      expr("""user_id = c_user_id AND
              c_ts >= v_ts AND c_ts <= v_ts + interval 30 minutes"""))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("v_ts"), col("c_ts"))
  }

  /** J2/J4 — stream-stream LEFT interval join: every view, with its
    * matching clicks or NULLs. The NULL-side row for an unmatched view
    * is emitted once the watermark passes v_ts + 30 min (no match can
    * still arrive) — Spark's append-mode outer-join semantics.
    *
    * The full 3-stage funnel chain (J3) can NOT be expressed by
    * chaining these: the first join's output carries two event-time
    * columns and a second stateful join is rejected (same limitation
    * the reference hit in Flink, aggregation_jobs.sql:20-23). See
    * [[FunnelState.funnelChain]] for the single-operator form.
    */
  def leftIntervalJoinPairs(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", WatermarkDelay)
    val c = clicks
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", WatermarkDelay)
    v.join(c,
        expr("""user_id = c_user_id AND
                c_ts >= v_ts AND c_ts <= v_ts + interval 30 minutes"""),
        "leftOuter")
      .select(col("user_id"), col("view_id"), col("click_id"), col("v_ts"), col("c_ts"))
  }
}

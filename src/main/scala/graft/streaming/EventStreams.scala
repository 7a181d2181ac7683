package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming operators over the event stream (north-star mandate —
  * SURVEY.md §2.B "Streaming"; the reference is batch-only, so these have no
  * reference citation).
  *
  * Each transform takes a DataFrame with the `events` schema
  * (event_id long, ts timestamp, user_id long, event_type string,
  * value double, props string) and works identically on a BATCH frame or a
  * STREAMING frame (`spark.readStream`) — that is the Spark unification: the
  * logical plan is the semantics, the runner decides micro-batch vs batch.
  * The batch twins in graft.catalog.Events pin the same semantics against the
  * DuckDB oracle; EventStreamsSpec proves streaming == batch on MemoryStream
  * input and that watermarking actually drops late data.
  *
  * Scale notes (100 TB/day stream):
  *  - every aggregation keys its state by (window, event_type) or
  *    session/user — state is sharded by the shuffle hash, no global state;
  *  - watermarks bound state: tumbling/sliding state is evicted one window
  *    after the watermark passes, sessions close after the gap + watermark;
  *  - `dropDuplicates` state is similarly watermark-bounded (event_id ×
  *    within-watermark window);
  *  - sinks should be partitioned (e.g. by window date) so the append-mode
  *    output keeps parquet files date-pruned for downstream batch reads.
  */
object EventStreams {

  /** JSON `props` extraction — stateless, identical in batch/streaming. */
  def parseProps(events: DataFrame): DataFrame =
    events.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))

  /** Tumbling 10-minute counts per event_type (streaming twin of
    * e2_tumbling_counts). Append-mode output finalizes a window once the
    * watermark passes its end. */
  def tumblingCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("w_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Sliding 10-minute / 5-minute-slide counts (twin of e3_sliding_counts). */
  def slidingCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("w_start"), col("n"))

  /** Session windows per user with a 30-minute inactivity gap (streaming twin
    * of e4_sessionize, via the native session_window operator — state closes
    * once watermark > last event + gap). */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
              unix_micros(col("session_window.start")).as("start_us"),
              unix_micros(col("session_window.end")).as("end_us"),
              col("n_events"))

  /** Watermark-bounded exact dedup on event_id (at-least-once source →
    * exactly-once downstream). State holds only ids within the watermark. */
  def dedupEvents(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each click matched to same-user errors in
    * the preceding 10 minutes. Both sides are watermarked so join state is
    * evicted once the watermark passes the interval bound — state is
    * O(active interval), not O(stream). Works identically on batch frames
    * (the spec pins streaming == batch). */
  def clickErrorJoin(clicks: DataFrame, errors: DataFrame,
                     watermark: String = "30 minutes"): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    val e = errors.select(col("event_id").as("error_id"),
      col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", watermark)
    c.join(e, expr(
        """c_user = e_user AND
          |e_ts >= c_ts - interval 10 minutes AND e_ts <= c_ts""".stripMargin))
      .select(col("click_id"), col("c_user").as("user_id"),
              unix_micros(col("c_ts")).as("click_us"),
              col("error_id"), unix_micros(col("e_ts")).as("error_us"))
  }

  /** LEFT-OUTER stream-stream interval join: like [[clickErrorJoin]], but a
    * click with no same-user error in its preceding 10 minutes is still
    * emitted (null error columns) — once the watermark passes the click's
    * interval so no late error can match it anymore. Same O(active interval)
    * state; the null-extended rows ride the state EVICTION, which is why
    * outer stream joins require the watermark at all. */
  def clickErrorJoinLeft(clicks: DataFrame, errors: DataFrame,
                         watermark: String = "30 minutes"): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    val e = errors.select(col("event_id").as("error_id"),
      col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", watermark)
    c.join(e, expr(
        """c_user = e_user AND
          |e_ts >= c_ts - interval 10 minutes AND e_ts <= c_ts""".stripMargin),
        "leftOuter")
      .select(col("click_id"), col("c_user").as("user_id"),
              unix_micros(col("c_ts")).as("click_us"),
              col("error_id"), unix_micros(col("e_ts")).as("error_us"))
  }

  /** FULL-OUTER stream-stream interval join — the symmetric completion of
    * [[clickErrorJoinLeft]]: unmatched rows from BOTH sides surface as
    * null-extended rows once their state evicts. Eviction is per-side and
    * asymmetric, because the interval bound reads differently from each
    * side: a click's matching errors lie in [c_ts − 10 min, c_ts], so a
    * click evicts once the watermark passes c_ts; an error's matching
    * clicks lie in [e_ts, e_ts + 10 min], so an error must out-wait the
    * interval and evicts only once the watermark passes e_ts + 10 min.
    * Same O(active interval) state as the inner join — the null rows ARE
    * the eviction records, which is why both sides need watermarks. */
  def clickErrorJoinFull(clicks: DataFrame, errors: DataFrame,
                         watermark: String = "30 minutes"): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    val e = errors.select(col("event_id").as("error_id"),
      col("user_id").as("e_user"), col("ts").as("e_ts"))
      .withWatermark("e_ts", watermark)
    c.join(e, expr(
        """c_user = e_user AND
          |e_ts >= c_ts - interval 10 minutes AND e_ts <= c_ts""".stripMargin),
        "fullOuter")
      .select(col("click_id"),
              coalesce(col("c_user"), col("e_user")).as("user_id"),
              unix_micros(col("c_ts")).as("click_us"),
              col("error_id"), unix_micros(col("e_ts")).as("error_us"))
  }
}

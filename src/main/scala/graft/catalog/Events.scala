package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryPack, Tables}

/** Event-stream operators over the `events` table, batch-mode: JSON parsing,
  * tumbling/sliding time windows, sessionization, watermark-style late-data
  * accounting. The same logic runs incrementally in Structured Streaming —
  * see graft.streaming.EventStreams; these batch plans are the oracle-checked
  * semantics. North-star mandate (SURVEY.md §2.B streaming/JSON rows).
  *
  * Determinism: all time arithmetic is integer micros/seconds
  * (`unix_micros`/`epoch_us`, `unix_timestamp`/`epoch`); money-ish doubles
  * are cast to DECIMAL before summing (see Tables scaladoc).
  *
  * Scale notes (100 TB):
  *  - windows/sessions shuffle once on their natural key (window bucket /
  *    user_id); at scale the events table would be date-partitioned so the
  *    scan prunes to the queried range before the shuffle;
  *  - sessionization is a window function over (user_id, time) — Spark
  *    sorts within partitions after a single hash shuffle on user_id; no
  *    driver-side state. In streaming the same semantics run with
  *    session_window + watermark state eviction.
  */
object Events extends QueryPack {
  import Q._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // e1: JSON property extraction + per-type aggregate
    "e1_json_kstats" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).events
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
             sum($"k").as("sum_k"),
             min($"k").as("min_k"),
             max($"k").as("max_k"))
        .orderBy($"event_type")
    },
    // e2: tumbling 10-minute windows (Spark `window()`; epoch-aligned)
    "e2_tumbling_counts" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).events
        .groupBy(window($"ts", "10 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"), asDbl(sum(dec2($"value")), 2).as("sum_value"))
        .select(unix_timestamp($"window.start").as("w_start"),
                $"event_type", $"n", $"sum_value")
        .orderBy($"w_start", $"event_type")
    },
    // e3: sliding windows, 10-minute length / 5-minute slide (each event in 2)
    "e3_sliding_counts" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).events
        .groupBy(window($"ts", "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp($"window.start").as("w_start"), $"n")
        .orderBy($"w_start")
    },
    // e4: sessionization — 30-minute inactivity gap per user
    "e4_sessionize" -> { (s, dir) =>
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      val run = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir).events
        .withColumn("us", unix_micros($"ts"))
        .withColumn("new_sess",
          when(($"us" - lag($"us", 1).over(byUser)) > 1800000000L, 1)
            .when(lag($"us", 1).over(byUser).isNull, 1).otherwise(0))
        .withColumn("sess_id", sum($"new_sess").over(run))
        .groupBy($"user_id", $"sess_id")
        .agg(count(lit(1)).as("n_events"),
             min($"us").as("start_us"),
             max($"us").as("end_us"),
             (max($"us") - min($"us")).as("dur_us"))
        .orderBy($"user_id", $"sess_id")
    },
    // e5: watermark-style late-data accounting: an event is "late" if it is
    // >10 minutes behind the max event time seen earlier in arrival order
    // (event_id = arrival order) — the batch shadow of withWatermark drop.
    // The prefix-max runs as ScaleOps.prefixMax (bucketed two-pass), NOT an
    // unpartitioned Window.orderBy — round-1's version sorted the whole
    // table into one partition.
    "e5_late_data" -> { (s, dir) =>
      import s.implicits._
      val withPrefix = ScaleOps.prefixMax(
        Tables(s, dir).events.withColumn("us", unix_micros($"ts")),
        orderCol = "event_id", valueCol = "us", outCol = "prev_max_us")
      withPrefix
        .withColumn("late",
          when($"us" < $"prev_max_us" - 600000000L, 1).otherwise(0))
        .groupBy($"event_type")
        .agg(sum($"late").as("n_late"), count(lit(1)).as("n_total"))
        .orderBy($"event_type")
    }
  )

  val oracle: Map[String, String] = Map(
    "e1_json_kstats" -> """
      SELECT event_type, COUNT(*) AS n,
             SUM(k)::BIGINT AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
      FROM (SELECT event_type, json_extract(props, '$.k')::BIGINT AS k FROM events) t
      GROUP BY event_type ORDER BY event_type""",
    "e2_tumbling_counts" -> """
      SELECT (floor(epoch(ts) / 600) * 600)::BIGINT AS w_start, event_type,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      FROM events GROUP BY w_start, event_type ORDER BY w_start, event_type""",
    "e3_sliding_counts" -> """
      SELECT ws AS w_start, COUNT(*) AS n FROM (
        SELECT (floor(epoch(ts) / 300) * 300 - off)::BIGINT AS ws
        FROM events CROSS JOIN (VALUES (0), (300)) o(off)) t
      GROUP BY ws ORDER BY ws""",
    "e4_sessionize" -> """
      SELECT user_id, sess_id, COUNT(*) AS n_events,
             MIN(us) AS start_us, MAX(us) AS end_us,
             MAX(us) - MIN(us) AS dur_us
      FROM (
        SELECT user_id, us,
               (SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS sess_id
        FROM (
          SELECT user_id, event_id, us,
                 CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
                      THEN 1
                      WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_sess
          FROM (SELECT user_id, event_id, epoch_us(ts) AS us FROM events) t0) t1) t2
      GROUP BY user_id, sess_id ORDER BY user_id, sess_id""",
    "e5_late_data" -> """
      SELECT event_type, SUM(late)::BIGINT AS n_late, COUNT(*) AS n_total FROM (
        SELECT event_type,
               CASE WHEN us < MAX(us) OVER (ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 600000000
                    THEN 1 ELSE 0 END AS late
        FROM (SELECT event_type, event_id, epoch_us(ts) AS us FROM events) t0) t
      GROUP BY event_type ORDER BY event_type"""
  )
}

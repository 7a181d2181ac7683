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
    },
    // e10: ordered funnel — users who viewed, then clicked at-or-after
    // their first view, then purchased at-or-after that click. Each stage
    // is one keyed aggregate joined to the previous stage's per-user
    // anchor time: three shuffles on user_id, no windows, no sequence
    // explosion — the shape that survives 100 TB event logs (and the
    // stage-k join is semi-join-sized: only users still in the funnel).
    "e10_funnel" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
        .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"us").as("v_us"))
      val c = ev.filter($"event_type" === "click")
        .join(v, "user_id").filter($"us" >= $"v_us")
        .groupBy($"user_id").agg(min($"us").as("c_us"))
      val p = ev.filter($"event_type" === "purchase")
        .join(c, "user_id").filter($"us" >= $"c_us")
        .groupBy($"user_id").agg(min($"us").as("p_us"))
      v.select(lit("1_view").as("stage"), $"user_id")
        .union(c.select(lit("2_click"), $"user_id"))
        .union(p.select(lit("3_purchase"), $"user_id"))
        .groupBy($"stage").agg(count(lit(1)).as("n_users"))
        .orderBy($"stage")
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
             CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_value
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
    "e10_funnel" -> """
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      v AS (SELECT user_id, min(us) AS v_us FROM ev
            WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT ev.user_id, min(ev.us) AS c_us
            FROM ev JOIN v ON ev.user_id = v.user_id
            WHERE ev.event_type = 'click' AND ev.us >= v.v_us
            GROUP BY ev.user_id),
      p AS (SELECT ev.user_id, min(ev.us) AS p_us
            FROM ev JOIN c ON ev.user_id = c.user_id
            WHERE ev.event_type = 'purchase' AND ev.us >= c.c_us
            GROUP BY ev.user_id)
      SELECT stage, COUNT(*) AS n_users FROM (
        SELECT '1_view' AS stage, user_id FROM v
        UNION ALL SELECT '2_click', user_id FROM c
        UNION ALL SELECT '3_purchase', user_id FROM p) t
      GROUP BY stage ORDER BY stage""",
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

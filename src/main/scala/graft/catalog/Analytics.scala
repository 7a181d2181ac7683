package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** Reshaping + order-statistics operators: pivot, unpivot, exact
  * interpolated percentiles, sorted array aggregation (SURVEY.md §2.B
  * aggregation surface; no reference citation).
  *
  * Determinism: pivot cells are integer counts (missing → 0); unpivot is a
  * pure reshape; percentiles interpolate over exact-integer `p_size` /
  * DECIMAL-cast values so both engines interpolate the same rationals;
  * array_agg is wrapped in an explicit sort (collect order is
  * partition-dependent, sorted output is not).
  *
  * Scale notes: pivot with EXPLICIT values compiles to one pass of
  * conditional aggregates (no second distinct-values job — always list the
  * columns at 100 TB); unpivot is a generator projection, no shuffle;
  * percentile is a single-pass sort-based aggregate per group; array_agg
  * per group is bounded by group cardinality — cap with slice when the
  * group can be hot.
  */
object Analytics extends QueryPack {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val P = 2147483647L
  /** per-event-type sampling rates in percent (g2). */
  private val SampleRates = Seq(
    "view" -> 5L, "click" -> 20L, "error" -> 50L,
    "purchase" -> 100L, "signup" -> 10L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // p1: per-user event-type counts pivoted to columns (explicit values)
    "p1_pivot" -> { (s, dir) =>
      import s.implicits._
      val pivoted = Tables(s, dir).events
        .groupBy($"user_id")
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))
      pivoted.select($"user_id" +:
        EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy($"user_id")
    },
    // p2: unpivot part measures to (part, measure, value) long form
    "p2_unpivot" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).part
        .select($"p_partkey", $"p_size".cast("double").as("p_size"),
                $"p_retailprice")
        .unpivot(Array($"p_partkey"), Array($"p_size", $"p_retailprice"),
                 "measure", "value")
        .orderBy($"p_partkey", $"measure")
    },
    // q6: exact interpolated percentiles of integer p_size per brand
    "q6_percentiles" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).part
        .groupBy($"p_brand")
        .agg(expr("percentile(p_size, 0.5)").as("p50"),
             expr("percentile(p_size, 0.9)").as("p90"),
             count(lit(1)).as("n"))
        .orderBy($"p_brand")
    },
    // g2: deterministic stratified sampling — per-stratum rates over a
    // multiplicative integer hash of the row id. No rand(): the sample is a
    // pure row-local predicate, reproducible on any engine/parallelism and
    // stable across reruns (the property a training pipeline needs for
    // resumable corpus construction). Overflow-safe: (id % P) * 48271 < 2^63.
    "g2_stratified_sample" -> { (s, dir) =>
      import s.implicits._
      val rate = element_at(
        map(SampleRates.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
        $"event_type")
      Tables(s, dir).events
        .withColumn("bucket", (($"event_id" % P) * 48271L + 11L) % P % 100L)
        .filter($"bucket" < rate)
        .select($"event_id", $"event_type", $"bucket")
        .orderBy($"event_id")
    },
    // g3: train/val/test corpus split by hash bucket (80/10/10) with
    // per-split document and byte counts — the split is a deterministic
    // function of doc_id alone, so adding documents never reshuffles
    // existing assignments.
    "g3_corpus_split" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .withColumn("bucket", (($"doc_id" % P) * 48271L + 7L) % P % 100L)
        .withColumn("split",
          when($"bucket" < 80, "train").when($"bucket" < 90, "val")
            .otherwise("test"))
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"),
             sum(octet_length($"text").cast("long")).as("n_bytes"))
        .orderBy($"split")
    },
    // g1: per-nation sorted list of supplier names (deterministic array agg).
    // Comma-joined, not ARRAY-typed: the driver's compare (pandas sort +
    // hash) cannot process array cells; the joined string carries the same
    // values in the same sorted order.
    "g1_array_agg" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).supplier
        .groupBy($"s_nationkey")
        .agg(array_join(sort_array(collect_list($"s_name")), ",").as("names"),
             count(lit(1)).as("n"))
        .orderBy($"s_nationkey")
    }
  )

  private val pivotCols = EventTypes.map(t =>
    s"""COALESCE(COUNT(*) FILTER (event_type = '$t'), 0)::BIGINT AS "$t"""").mkString(", ")

  private val rateCase = "CASE event_type " + SampleRates.map {
    case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ") + " END"

  val oracle: Map[String, String] = Map(
    "g2_stratified_sample" -> s"""
      SELECT event_id, event_type, bucket FROM (
        SELECT event_id, event_type,
               ((event_id % $P) * 48271 + 11) % $P % 100 AS bucket
        FROM events) t
      WHERE bucket < $rateCase
      ORDER BY event_id""",
    "g3_corpus_split" -> s"""
      SELECT split, COUNT(*) AS n_docs,
             SUM(octet_length(encode(text)))::BIGINT AS n_bytes
      FROM (
        SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split, text
        FROM (SELECT ((doc_id % $P) * 48271 + 7) % $P % 100 AS b, text
              FROM documents) t0) t1
      GROUP BY split ORDER BY split""",
    "p1_pivot" -> s"""
      SELECT user_id, $pivotCols
      FROM events GROUP BY user_id ORDER BY user_id""",
    "p2_unpivot" -> """
      SELECT p_partkey, measure, value FROM (
        SELECT p_partkey, 'p_size' AS measure, p_size::DOUBLE AS value FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value FROM part) t
      ORDER BY p_partkey, measure""",
    "q6_percentiles" -> """
      SELECT p_brand, quantile_cont(p_size, 0.5) AS p50,
             quantile_cont(p_size, 0.9) AS p90, COUNT(*) AS n
      FROM part GROUP BY p_brand ORDER BY p_brand""",
    "g1_array_agg" -> """
      SELECT s_nationkey, array_to_string(list_sort(list(s_name)), ',') AS names, COUNT(*) AS n
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"""
  )
}

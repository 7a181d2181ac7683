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

  val oracle: Map[String, String] = Map(
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

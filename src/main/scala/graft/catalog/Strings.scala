package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** String-similarity and extraction operators plus the SQL entry point
  * (SURVEY.md §2.B text surface).
  *
  *   d6 edit-distance near-dup — the remaining dedup family: Levenshtein
  *      over candidates from a q-gram (trigram) inverted index + count
  *      filter, run on DISTINCT values, never all-pairs and never the raw
  *      key space. At 100 TB distinct values scale sublinearly in rows, so
  *      the quadratic candidate step runs on the small side and the
  *      key-level answer is produced by a final expansion join.
  *   x5 regexp extraction — regexp_extract_all over the part names.
  *   q7 SQL interface — the same engine surface through spark.sql over
  *      registered views: a user can run plain ANSI SQL against the tables.
  */
object Strings extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // d6: Levenshtein ≤ 1 pairs over the FULL part table (round-1's bounded
    // key slice and last-token block are gone). Three stages:
    //   1. distinct names (the value space is ≪ the key space);
    //   2. q-gram inverted index + count filter on distinct names:
    //      candidates share a trigram, |len diff| ≤ 1, and ≥ max(len)-5
    //      shared distinct trigrams (ed ≤ k destroys ≤ k·q grams — the
    //      Gravano q-gram bound), then the THRESHOLD-banded levenshtein
    //      (O(k·n), early-exit) confirms; the oracle recomputes the full
    //      distance;
    //   3. expansion: the tiny symmetric name-pair set (plus identity
    //      pairs for exact copies) broadcast-joins back to keys, k1 < k2.
    "d6_edit_distance" -> { (s, dir) =>
      import s.implicits._
      val p = Tables(s, dir).part.select($"p_partkey", $"p_name")
      val names = p.select($"p_name".as("n")).distinct()
        .withColumn("len", length($"n"))
      val grams = names.select($"n", $"len", explode(expr(
          "if(length(n) < 3, array(), " +
          "array_distinct(transform(sequence(1, length(n) - 2), i -> substring(n, i, 3))))")).as("g"))
      val cand = grams.as("a").join(grams.as("b"),
          $"a.g" === $"b.g" && $"a.n" < $"b.n" &&
            abs($"a.len" - $"b.len") <= 1)
        .groupBy($"a.n".as("n1"), $"b.n".as("n2"),
                 $"a.len".as("l1"), $"b.len".as("l2"))
        .agg(count(lit(1)).as("n_shared"))
        .filter($"n_shared" >= greatest($"l1", $"l2") - 5)
      val pairs = cand
        .withColumn("dist", levenshtein($"n1", $"n2", 1))
        .filter($"dist" >= 0 && $"dist" <= 1)
        .select($"n1", $"n2", $"dist")
      val sym = pairs
        .union(pairs.select($"n2".as("n1"), $"n1".as("n2"), $"dist"))
        .union(names.select($"n".as("n1"), $"n".as("n2"), lit(0).as("dist")))
      p.as("a").join(broadcast(sym), $"a.p_name" === $"n1")
        .join(p.as("b"), $"n2" === $"b.p_name" && $"a.p_partkey" < $"b.p_partkey")
        .select($"a.p_partkey".as("k1"), $"b.p_partkey".as("k2"),
                $"a.p_name".as("n1"), $"b.p_name".as("n2"),
                $"dist".cast("long").as("dist"))
        .orderBy($"k1", $"k2")
    },
    // x5: all alphabetic words per part name via regexp_extract_all.
    // The match list is emitted comma-joined, not as ARRAY: the driver's
    // compare (pandas sort + hash) cannot process array cells, and a
    // delimiter-joined string pins the same values deterministically.
    "x5_regexp_extract" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).part
        .select($"p_partkey",
                array_join(expr("regexp_extract_all(p_name, '[a-z]+', 0)"), ",").as("words"),
                expr("size(regexp_extract_all(p_name, '[a-z]+', 0))")
                  .cast("long").as("n_words"))
        .orderBy($"p_partkey")
    },
    // q8: correlated subqueries through the SQL interface — EXISTS and a
    // correlated scalar subquery, which Catalyst decorrelates into
    // semi/aggregate joins (RewriteCorrelatedScalarSubquery /
    // RewritePredicateSubquery). Pins the decorrelation rules, not just
    // the join operators they produce.
    "q8_correlated_subquery" -> { (s, dir) =>
      val t = Tables(s, dir)
      val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      val (vo, vc) = (s"v8_orders_$tag", s"v8_customer_$tag")
      t.orders.createOrReplaceTempView(vo)
      t.customer.createOrReplaceTempView(vc)
      try s.sql(s"""
        SELECT c_custkey, c_name,
               (SELECT COUNT(*) FROM $vo o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0
               ) AS n_big
        FROM $vc c
        WHERE EXISTS (SELECT 1 FROM $vo o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
        ORDER BY c_custkey""")
      finally {
        s.catalog.dropTempView(vo)
        s.catalog.dropTempView(vc)
      }
    },
    // q7: the engine through plain SQL — register views, run ANSI SQL.
    // View names are unique per call and dropped after analysis (spark.sql
    // resolves eagerly) so the shared session catalog is never left dirty
    // and concurrent callers with different dirs can't cross-read.
    "q7_sql_interface" -> { (s, dir) =>
      val t = Tables(s, dir)
      val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      val (vo, vc) = (s"v_orders_$tag", s"v_customer_$tag")
      t.orders.createOrReplaceTempView(vo)
      t.customer.createOrReplaceTempView(vc)
      try s.sql(s"""
        SELECT c_mktsegment, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
        FROM $vo JOIN $vc ON o_custkey = c_custkey
        WHERE o_orderstatus <> 'F'
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")
      finally {
        s.catalog.dropTempView(vo)
        s.catalog.dropTempView(vc)
      }
    }
  )

  val oracle: Map[String, String] = Map(
    "d6_edit_distance" -> """
      WITH names AS (SELECT DISTINCT p_name AS n, length(p_name) AS len FROM part),
      grams AS (
        SELECT n, len, unnest(list_distinct(list_transform(
          range(1, greatest(length(n) - 2, 0) + 1), i -> substr(n, i, 3)))) AS g
        FROM names),
      cand AS (
        SELECT a.n AS n1, b.n AS n2, a.len AS l1, b.len AS l2, count(*) AS n_shared
        FROM grams a JOIN grams b
          ON a.g = b.g AND a.n < b.n AND abs(a.len - b.len) <= 1
        GROUP BY 1, 2, 3, 4),
      pairs AS (
        SELECT n1, n2, levenshtein(n1, n2) AS dist
        FROM cand
        WHERE n_shared >= greatest(l1, l2) - 5 AND levenshtein(n1, n2) <= 1),
      sym AS (
        SELECT n1, n2, dist FROM pairs
        UNION ALL SELECT n2 AS n1, n1 AS n2, dist FROM pairs
        UNION ALL SELECT n AS n1, n AS n2, 0 AS dist FROM names),
      expd AS MATERIALIZED (
        SELECT a.p_partkey AS k1, a.p_name AS n1, s.n2 AS nn2, s.dist
        FROM part a JOIN sym s ON a.p_name = s.n1)
      -- round-13 restructure (the 10x soak's disk wall): written as
      -- `JOIN part b ON s.n2 = b.p_name AND a.p_partkey < b.p_partkey`,
      -- DuckDB planned a PIECEWISE_MERGE_JOIN of part x part on the
      -- INEQUALITY alone (~2e12 pairs at 10x -> >75 GB spill). The
      -- MATERIALIZED fence pins the name-equality join order, and the
      -- least()-form keeps the key filter non-sargable so the planner
      -- hash-joins on the equality and filters the probe stream.
      SELECT e.k1, b.p_partkey AS k2, e.n1, b.p_name AS n2, e.dist::BIGINT AS dist
      FROM expd e JOIN part b ON e.nn2 = b.p_name
      WHERE least(e.k1, b.p_partkey) = e.k1 AND e.k1 <> b.p_partkey
      ORDER BY k1, k2""",
    "x5_regexp_extract" -> """
      SELECT p_partkey, array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS words,
             len(regexp_extract_all(p_name, '[a-z]+'))::BIGINT AS n_words
      FROM part ORDER BY p_partkey""",
    "q8_correlated_subquery" -> """
      SELECT c_custkey, c_name,
             (SELECT COUNT(*) FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0
             ) AS n_big
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'F')
      ORDER BY c_custkey""",
    "q7_sql_interface" -> """
      SELECT c_mktsegment, COUNT(*) AS n,
             CAST(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderstatus <> 'F'
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""
  )
}

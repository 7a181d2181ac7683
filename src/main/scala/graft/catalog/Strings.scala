package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** String-similarity and extraction operators plus the SQL entry point
  * (SURVEY.md §2.B text surface).
  *
  *   d6 edit-distance near-dup — the remaining dedup family: Levenshtein
  *      over candidate pairs BLOCKED by a cheap key (p_name's last token),
  *      never all-pairs. At 100 TB the block key is the shuffle key and
  *      per-block population bounds the quadratic cost (same shape as
  *      d5's label blocking).
  *   x5 regexp extraction — regexp_extract_all over the part names.
  *   q7 SQL interface — the same engine surface through spark.sql over
  *      registered views: a user can run plain ANSI SQL against the tables.
  */
object Strings extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // d6: Levenshtein ≤ 1 pairs of part names sharing the same last token,
    // over a bounded key slice. Spark side uses the THRESHOLD-banded
    // levenshtein (O(k·n) per pair, early-exit) — the oracle recomputes the
    // full distance. The last-token block is deliberately simple; a
    // production run swaps it for a q-gram inverted index + count filter
    // (dist ≤ k ⇒ ≥ |s|-2-3k shared trigrams), which keeps candidate sets
    // sparse when the block key alone is weak — the 10× stress run showed
    // this vocabulary's 8 block values going quadratic without it.
    "d6_edit_distance" -> { (s, dir) =>
      import s.implicits._
      val p = Tables(s, dir).part
        .filter($"p_partkey" < 2000)
        .select($"p_partkey", $"p_name",
                element_at(split($"p_name", " "), -1).as("blk"))
      p.as("a").join(p.as("b"),
          $"a.blk" === $"b.blk" && $"a.p_partkey" < $"b.p_partkey")
        .withColumn("dist", levenshtein($"a.p_name", $"b.p_name", 1))
        .filter($"dist" >= 0 && $"dist" <= 1)
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
      SELECT a.p_partkey AS k1, b.p_partkey AS k2,
             a.p_name AS n1, b.p_name AS n2,
             levenshtein(a.p_name, b.p_name)::BIGINT AS dist
      FROM (SELECT p_partkey, p_name, string_split(p_name, ' ')[-1] AS blk FROM part WHERE p_partkey < 2000) a
      JOIN (SELECT p_partkey, p_name, string_split(p_name, ' ')[-1] AS blk FROM part WHERE p_partkey < 2000) b
        ON a.blk = b.blk AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 1
      ORDER BY k1, k2""",
    "x5_regexp_extract" -> """
      SELECT p_partkey, array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS words,
             len(regexp_extract_all(p_name, '[a-z]+'))::BIGINT AS n_words
      FROM part ORDER BY p_partkey""",
    "q7_sql_interface" -> """
      SELECT c_mktsegment, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderstatus <> 'F'
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""
  )
}

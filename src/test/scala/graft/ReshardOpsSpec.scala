package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the late-round-5 additions (s3 keyset pagination,
  * x20 lexical diversity, dq10 rolling anomaly, g12 consistent-hash
  * reshard, m12 audio peak-normalize) beyond the DuckDB hash-match: each
  * test asserts the property the operator exists for, on the real sf0.001
  * tables. */
class ReshardOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("s3: every page row sits strictly after the cursor; page is full and ordered") {
    val rows = SparkEntry.queries("s3_keyset_page")(spark, sf).collect()
    assert(rows.length == 20)
    val cursor = java.time.LocalDateTime.parse("1998-03-15T00:00:00")
    val keys = rows.map(r =>
      (r.getAs[java.time.LocalDateTime](1), r.getLong(0)))
    keys.foreach { case (d, k) =>
      assert(d.isAfter(cursor) || (d.equals(cursor) && k > 4000L)) }
    // unique total order → strictly increasing, no skips/repeats within page
    assert(keys.sliding(2).forall { case Array((d1, k1), (d2, k2)) =>
      d1.isBefore(d2) || (d1.equals(d2) && k1 < k2) })
  }

  test("s3: the seek predicate reaches the parquet scan as a pushed filter") {
    val plan = SparkEntry.queries("s3_keyset_page")(spark, sf)
      .queryExecution.executedPlan.toString
    // the date bound must appear in PushedFilters (row-group min/max
    // pruning), not only as a post-scan Filter — the property that makes
    // keyset pagination O(page) instead of O(table)
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters"))
      .mkString("\n")
    assert(pushed.contains("o_orderdate"),
      s"seek bound not pushed to the scan:\n$pushed")
  }

  test("q13: all max-achievers survive; revenue recomputes exactly") {
    import spark.implicits._
    val out = SparkEntry.queries("q13_top_supplier")(spark, sf).collect()
    assert(out.nonEmpty)
    val revs = out.map(_.getLong(2))
    assert(revs.distinct.length == 1, "every surviving row ties at the max")
    val brute = Tables(spark, sf).lineitem
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg(sum(expr(
        "cast(round(l_extendedprice * 100) as bigint) * " +
          "(100 - cast(round(l_discount * 100) as bigint))")).as("r"))
      .agg(max($"r")).collect()(0).getLong(0)
    assert(revs.head == brute)
  }

  test("x20: type counts bounded by token counts; ttr in (0, 1000]") {
    val rows = SparkEntry.queries("x20_lexical_diversity")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nTyp, ttr) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nTyp >= 1 && nTyp <= nTok)
      assert(ttr == nTyp * 1000 / nTok && ttr >= 0 && ttr <= 1000)
    }
  }

  test("dq10: flags equal an exact BigInt recompute of the 28-day z-test") {
    import spark.implicits._
    val daily = Tables(spark, sf).orders
      .groupBy($"o_orderdate")
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
      .orderBy($"o_orderdate")
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), BigInt(r.getLong(1))))
    val expect = daily.indices.drop(27).map { i =>
      val w = daily.slice(i - 27, i + 1).map(_._2)
      val (n, x) = (BigInt(28), daily(i)._2)
      val (s1, sq) = (w.sum, w.map(v => v * v).sum)
      val dev = n * x - s1
      (daily(i)._1, dev * dev > 9 * (n * sq - s1 * s1))
    }.toMap
    val got = SparkEntry.queries("dq10_rolling_anomaly")(spark, sf)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0), r.getBoolean(2))).toMap
    assert(got.size == daily.length - 27)
    assert(got == expect)
  }

  test("g12: assignment is total; ring churn is an order of magnitude under mod churn") {
    import spark.implicits._
    val out = SparkEntry.queries("g12_reshard_plan")(spark, sf)
      .agg(sum($"n_docs"), sum($"n_moved_ring"), sum($"n_moved_mod"))
      .collect()(0)
    val (n, ring, mod) = (out.getLong(0), out.getLong(1), out.getLong(2))
    assert(n == Tables(spark, sf).documents.count())
    // theory: ring moves ~1/12 of docs, mod-rehash ~10/11 — a wide gap
    // that survives vnode placement variance
    assert(ring * 4 < mod, s"ring=$ring mod=$mod")
    assert(ring > 0, "growing the ring must move something")
  }

  test("v15: int8-quantized retrieval keeps near-exact recall vs brute force") {
    def topk(name: String) =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topk("v1_brute_topk")
    val sq = topk("v15_sq_ann")
    assert(sq.keySet == exact.keySet)
    // 8-bit codes lose <1% cosine precision; recall@10 stays ≥ 0.8 per
    // query and ≥ 0.95 averaged (bound loose enough for tie reshuffles)
    val recalls = exact.map { case (q, ex) => (sq(q) & ex).size.toDouble / ex.size }
    assert(recalls.forall(_ >= 0.8), s"per-query recall: $recalls")
    assert(recalls.sum / recalls.size >= 0.95)
  }

  test("d14: hits bounded by both sides; metrics are exact per-mille ratios") {
    val r = SparkEntry.queries("d14_lsh_eval")(spark, sf).collect()(0)
    val (nt, nc, nh, prec, rec) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nh <= math.min(nt, nc))
    assert(prec == nh * 1000 / math.max(nc, 1))
    assert(rec == nh * 1000 / math.max(nt, 1))
    // d2's banding is tuned for J >= 0.5 — it must find most true pairs
    assert(rec >= 800, s"LSH recall collapsed: $rec pm")
  }

  test("g13: weights are floor(sqrt(n)); temperature flattens vs proportional") {
    val rows = SparkEntry.queries("g13_temperature_mix")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (n, w, _) =>
      assert(w == math.sqrt(n.toDouble).toLong) }
    val budget = rows.map(_._3).sum
    assert(budget <= 200 && budget > 200 - rows.length * 2,
      s"targets should consume ~the budget: $budget")
    // α = 0.5 compresses the spread: target ratio < count ratio
    val (ns, ts) = (rows.map(_._1), rows.map(_._3))
    assert(ts.max.toDouble / ts.min < ns.max.toDouble / ns.min)
  }

  test("g15: splits are disjoint+exhaustive per language; train fraction near 80%") {
    import spark.implicits._
    val out = SparkEntry.queries("g15_stratified_split")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val docs = Tables(spark, sf).documents
      .groupBy($"lang").agg(count(lit(1)).as("n"), sum($"doc_id").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // per-language split counts and id-checksums re-add to the whole
    // language — no doc dropped, none double-assigned
    out.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.map(_._3).sum == docs(lang)._1, s"count leak in $lang")
      assert(rs.map(_._4).sum == docs(lang)._2, s"id-sum leak in $lang")
    }
    // the hash is uniform enough that train lands near 80% per language
    out.groupBy(_._1).foreach { case (lang, rs) =>
      val total = rs.map(_._3).sum.toDouble
      val train = rs.find(_._2 == "train").map(_._3).getOrElse(0L).toDouble
      assert(train / total > 0.6 && train / total < 0.95,
        s"train fraction off for $lang: ${train / total}")
    }
  }

  test("g16: exactly min(20, |stratum|) docs per language, no window over the corpus") {
    import spark.implicits._
    val out = SparkEntry.queries("g16_exact_sample")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = Tables(spark, sf).documents.groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(out(lang) == math.min(20L, n), s"$lang: ${out(lang)} of $n")
    }
  }

  test("dq11: the release gate both releases and suppresses; counts cover the corpus") {
    val out = SparkEntry.queries("dq11_k_anonymity")(spark, sf).collect()
      .map(r => (r.getLong(3), r.getBoolean(4)))
    assert(out.exists(_._2) && out.exists(!_._2),
      "fixture does not exercise both release outcomes")
    out.foreach { case (n, released) => assert(released == (n >= 5L)) }
    assert(out.map(_._1).sum == Tables(spark, sf).documents.count())
  }

  test("m12: gain is the exact floor ratio to target peak; peak within int16") {
    val rows = SparkEntry.queries("m12_audio_normalize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (peak, gain) = (r.getLong(2), r.getLong(3))
      assert(peak >= 0 && peak <= 32768)
      val p = math.max(peak, 1L)
      assert(gain * p <= 30000000L && (gain + 1) * p > 30000000L)
    }
  }
}

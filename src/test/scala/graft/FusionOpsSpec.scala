package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the round-5 retrieval/curation additions (v13 RRF
  * fusion, a11 count-min sketch, m10 scene cuts, m11 silence spans, v14
  * label propagation, r9 interval sweep, u10 changelog compaction, c4
  * budget selection, g11 winsorize, x19 vocab coverage, q11 Q17) beyond
  * the DuckDB hash-match: each test asserts the property the operator
  * exists for, on the real sf0.001 tables. */
class FusionOpsSpec extends AnyFunSuite {

  test("w12: offset-0 row equals cohort size; retention never exceeds it") {
    import spark.implicits._
    val out = SparkEntry.queries("w12_retention_cohorts")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every cohort has its day-0 row (the cohort definition), and no
    // later offset retains more users than day 0
    out.groupBy(_._1).foreach { case (c, rows) =>
      val day0 = rows.find(_._2 == 0L)
      assert(day0.isDefined, s"cohort $c missing day-0 row")
      rows.foreach { case (_, off, n) =>
        assert(n <= day0.get._3, s"cohort $c offset $off retains $n > day0 ${day0.get._3}")
      }
    }
    // day-0 sizes sum to the distinct-user count (cohorts partition users)
    val nUsers = Tables(spark, sf).events.select($"user_id").distinct().count()
    assert(out.filter(_._2 == 0L).map(_._3).sum == nUsers)
  }

  test("w11: stage counts cover all users; ordered-sequence property holds per user") {
    import spark.implicits._
    val out = SparkEntry.queries("w11_funnel_stages")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val nUsers = Tables(spark, sf).events
      .select($"user_id").distinct().count()
    assert(out.map(_._2).sum == nUsers, "stages don't partition the users")
    // latency only accrues past stage 1, and never negative
    out.foreach { case (stage, _, lat) =>
      if (stage <= 1) assert(lat == 0L, s"latency at stage $stage")
      else assert(lat > 0L, s"non-positive latency at stage $stage")
    }
    // independent per-user recompute of the deepest stage on raw rows
    val ev = Tables(spark, sf).events
      .select($"user_id", $"event_type", unix_micros($"ts").as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = ev.groupBy(_._1).values.map { rows =>
      def minAfter(t: String, after: Long): Option[Long] = {
        val c = rows.filter(r => r._2 == t && r._3 > after).map(_._3)
        if (c.isEmpty) None else Some(c.min)
      }
      val tv = rows.filter(_._2 == "view").map(_._3)
        .reduceOption(_ min _)
      tv.flatMap(v => minAfter("click", v)
          .flatMap(c => minAfter("purchase", c))).map(_ => 3L)
        .orElse(tv.flatMap(v => minAfter("click", v)).map(_ => 2L))
        .orElse(tv.map(_ => 1L)).getOrElse(0L)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    out.foreach { case (stage, n, _) =>
      assert(want.getOrElse(stage, 0L) == n, s"stage $stage count: got $n want ${want.get(stage)}")
    }
  }
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("v13: rrf is exactly the two-term reciprocal sum; ranks dense per query") {
    import spark.implicits._
    val out = SparkEntry.queries("v13_rrf_fusion")(spark, sf).cache()
    // recompute the fusion score from the component ranks (0 = absent)
    val bad = out.withColumn("expect",
        when($"kw_rank" > 0, lit(1.0) / ($"kw_rank" + 60)).otherwise(lit(0.0)) +
        when($"em_rank" > 0, lit(1.0) / ($"em_rank" + 60)).otherwise(lit(0.0)))
      .filter($"rrf" =!= $"expect")
    assert(bad.count() == 0)
    // ranks are dense 1..n within each query
    val dense = out.groupBy($"q_id")
      .agg(count(lit(1)).as("n"), max($"rank").as("mx"), min($"rank").as("mn"))
      .filter($"mn" =!= 1 || $"mx" =!= $"n")
    assert(dense.count() == 0)
    // a doc ranked in BOTH lists always beats a doc holding the same ranks
    // in only one list: 2 terms > either term alone — spot-check that every
    // both-lists doc outranks any single-list doc with equal-or-worse ranks
    val both = out.filter($"kw_rank" > 0 && $"em_rank" > 0)
    assert(both.filter($"rrf" <= 1.0 / 61.0).count() == 0)
    out.unpersist()
  }

  test("c6: each composed retrieval stage equals its standalone entry") {
    import spark.implicits._
    val out = SparkEntry.queries("c6_rag_retrieval")(spark, sf).cache()
    // semantic stage == v16 verbatim: every c6 row with an em_rank carries
    // exactly v16's rank for that (q, doc)
    val v16 = SparkEntry.queries("v16_graph_beam_search")(spark, sf)
      .select($"q_id", $"neighbor_id".as("doc_id"), $"rank".as("v16_rank"))
    val semBad = out.filter($"em_rank" > 0)
      .join(v16, Seq("q_id", "doc_id"), "left")
      .filter($"v16_rank".isNull || $"v16_rank" =!= $"em_rank")
    assert(semBad.count() == 0, "c6 semantic ranks drifted from v16")
    // fusion formula == v13's reciprocal-rank sum
    val bad = out.withColumn("expect",
        when($"kw_rank" > 0, lit(1.0) / ($"kw_rank" + 60)).otherwise(lit(0.0)) +
        when($"em_rank" > 0, lit(1.0) / ($"em_rank" + 60)).otherwise(lit(0.0)))
      .filter($"rrf" =!= $"expect")
    assert(bad.count() == 0)
    // lexical hits point at a real x15 chunk of that doc
    val x15 = SparkEntry.queries("x15_chunk_pack")(spark, sf)
      .select($"doc_id", $"chunk_idx".as("best_chunk"))
    val chunkBad = out.filter($"kw_rank" > 0)
      .join(x15, Seq("doc_id", "best_chunk"), "left_anti")
    assert(chunkBad.count() == 0, "best_chunk not an x15 chunk")
    // semantic-only rows carry the -1 sentinel; both sides contribute rows
    assert(out.filter($"kw_rank" === 0 && $"best_chunk" =!= -1).count() == 0)
    assert(out.filter($"kw_rank" > 0).count() > 0)
    assert(out.filter($"em_rank" > 0).count() > 0)
    out.unpersist()
  }

  test("c11: composed recall holds a floor and attribution partitions the hits") {
    val out = SparkEntry.queries("c11_rag_recall_eval")(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSet == (0L until 10L).toSet)
    out.foreach { r =>
      val (nTruth, nHit) = (r.getAs[Long]("n_truth"), r.getAs[Long]("n_hit"))
      // truth ⊇ the 10 exact-cosine ids; hits can't exceed truth
      assert(nTruth >= 10 && nHit <= nTruth)
      // the three attribution buckets partition the hit set exactly
      assert(r.getAs[Long]("n_hit_both") + r.getAs[Long]("n_hit_kw_only") +
        r.getAs[Long]("n_hit_em_only") == nHit,
        s"attribution doesn't partition hits for q=${r.getLong(0)}")
      assert(r.getAs[Long]("recall_bp") == nHit * 10000 / nTruth)
    }
    // composed recall floor: the fused chain must keep finding the
    // majority of the exact two-leg truth (measured ~0.70 mean here;
    // collapse below half means a leg or the fusion broke)
    val mean = out.map(_.getAs[Long]("recall_bp")).sum / out.length
    info(s"mean composed recall = $mean bp")
    assert(mean >= 5000L, s"composed RAG recall collapsed: $mean bp")
  }

  test("a11: count-min never underestimates and is exact when no collision") {
    import spark.implicits._
    val out = SparkEntry.queries("a11_cms_sketch")(spark, sf)
    assert(out.filter(!$"overestimates").count() == 0)
    assert(out.filter($"cms_est" < $"exact_n").count() == 0)
  }

  test("m10: first frame is never a cut; flag matches the threshold exactly") {
    import spark.implicits._
    val out = SparkEntry.queries("m10_scene_cut")(spark, sf).cache()
    assert(out.filter($"frame_idx" === 0 &&
      ($"is_cut" || $"diff" =!= 0)).count() == 0)
    assert(out.filter($"is_cut" =!= ($"diff" > 50000)).count() == 0)
    out.unpersist()
  }

  test("m11: silence spans are maximal (never adjacent) and ordered") {
    import spark.implicits._
    val out = SparkEntry.queries("m11_silence_spans")(spark, sf).cache()
    assert(out.filter($"start_chunk" > $"end_chunk").count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"media_id").orderBy($"start_chunk")
    // a span starting right after the previous span's end would mean the
    // island merge failed
    val adj = out.withColumn("prev_end", lag($"end_chunk", 1).over(w))
      .filter($"prev_end".isNotNull && $"start_chunk" <= $"prev_end" + 1)
    assert(adj.count() == 0)
    out.unpersist()
  }

  test("v14: labels are component minima (label <= id, shared along edges)") {
    import spark.implicits._
    val out = SparkEntry.queries("v14_label_prop")(spark, sf).cache()
    assert(out.filter($"community" > $"vec_id").count() == 0)
    // community sizes add up to the vertex count
    val total = out.count()
    val bySize = out.select($"community", $"community_size").distinct()
      .agg(sum($"community_size")).first().getLong(0)
    assert(bySize == total)
    out.unpersist()
  }

  test("r9: sweep starts positive, ends at zero (every interval closes)") {
    import spark.implicits._
    val rows = SparkEntry.queries("r9_interval_sweep")(spark, sf)
      .orderBy($"event_date").collect()
    assert(rows.head.getLong(1) > 0)
    assert(rows.last.getLong(1) == 0)
    assert(rows.forall(_.getLong(1) >= 0))
  }

  test("u10: compaction drops I..D keys and nets the rest to one op") {
    import spark.implicits._
    val out = SparkEntry.queries("u10_changelog_compact")(spark, sf).cache()
    assert(out.groupBy($"c_custkey").count().filter($"count" > 1).count() == 0)
    assert(out.filter($"c_custkey" % 3 === 1).count() == 0)
    assert(out.filter($"c_custkey" % 3 === 0 && $"net_op" =!= "I").count() == 0)
    assert(out.filter($"c_custkey" % 3 === 2 && $"net_op" =!= "D").count() == 0)
    // deletes carry no values; upserts always do
    assert(out.filter($"net_op" === "D" && $"bal".isNotNull).count() == 0)
    assert(out.filter($"net_op" =!= "D" && $"bal".isNull).count() == 0)
    out.unpersist()
  }

  test("c4: selection respects the per-language token budget") {
    import spark.implicits._
    val out = SparkEntry.queries("c4_budget_select")(spark, sf).cache()
    assert(out.filter($"cum_tokens" > 2000).count() == 0)
    // per language the running totals are consistent: max cum == sum of tokens
    val bad = out.groupBy($"lang")
      .agg(max($"cum_tokens").as("mx"), sum($"n_tokens").as("tot"))
      .filter($"mx" =!= $"tot")
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("g11: bounds ordered, clip counts bounded by the tail definition") {
    import spark.implicits._
    val out = SparkEntry.queries("g11_winsorize")(spark, sf).cache()
    assert(out.filter($"p5_cents" > $"p95_cents").count() == 0)
    // winsorized sum lies between n*lo and n*hi
    val bad = out.filter($"sum_winsorized" < $"n" * $"p5_cents" ||
      $"sum_winsorized" > $"n" * $"p95_cents")
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("x19: coverage curve is monotone (top50 <= top90 <= distinct <= total)") {
    import spark.implicits._
    val out = SparkEntry.queries("x19_vocab_coverage")(spark, sf)
    assert(out.filter($"n_top50" > $"n_top90" ||
      $"n_top90" > $"n_distinct" || $"n_distinct" > $"n_tokens").count() == 0)
  }

  test("q11: threshold join returns the single summary row") {
    val out = SparkEntry.queries("q11_small_qty_revenue")(spark, sf).collect()
    assert(out.length == 1)
  }
}

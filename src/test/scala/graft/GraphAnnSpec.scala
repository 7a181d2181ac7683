package graft

import org.scalatest.funsuite.AnyFunSuite

/** v16's graph beam search: the walk must stay inside the stored graph's
  * reachable ball, emit exactly-reranked true cosines, and still find a
  * useful share of what brute force finds — the property a graph index
  * exists for (its ceiling is the stored graph's connectivity: in-cell
  * top-3 edges, so the floor here is the v3 1-probe analog). */
class GraphAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("v16: per-query results are ranked true cosines over a bounded visited set") {
    import spark.implicits._
    val rows = SparkEntry.queries("v16_graph_beam_search")(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 10L).toSet, s"missing queries: ${byQ.keySet}")
    byQ.values.foreach { rs =>
      // ranks are 1..n contiguous (n ≤ 10 — the visited ball can be small)
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq)
      assert(rs.length <= 10)
      val cs = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        "cosines not non-increasing in rank")
      // no self-hit: the query's own node never appears as its neighbor
      assert(rs.forall(r => r.getLong(2) != r.getLong(0)))
    }
    // visited-ball bound: 1 + Hops·BeamW·maxDeg ids per query — the walk
    // cannot have touched more than the frontier budget allows, so every
    // emitted neighbor is within BeamHops symmetrized hops of the query
    val e = Tables(spark, sf).embeddings
      .withColumn("v", $"embedding".cast("array<double>"))
    val edges = SparkEntry.queries("v5_knn_graph")(spark, sf)
      .select($"src_id", $"neighbor_id").collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      var ball = Set(qid)
      for (_ <- 1 to 3)
        ball = ball ++ ball.flatMap(id => edges.getOrElse(id, Set.empty))
      rs.foreach(r => assert(ball.contains(r.getLong(2)),
        s"neighbor ${r.getLong(2)} outside the 3-hop ball of query $qid"))
    }
  }

  test("v16: beam search recalls a useful share of the exact top-k") {
    val exact = SparkEntry.queries("v1_brute_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val beam = SparkEntry.queries("v16_graph_beam_search")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect beam).size.toDouble / exact.size
    // ceiling = stored-graph connectivity (in-cell edges only); collapse
    // below this floor means the walk or the frontier cut broke
    assert(recall >= 0.3, s"graph-ANN recall collapsed: $recall")
  }

  test("v17: long links lift recall over the in-cell-only graph") {
    val exact = SparkEntry.queries("v1_brute_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallOf(q: String): Double = {
      val got = SparkEntry.queries(q)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val r16 = recallOf("v16_graph_beam_search")
    val r17 = recallOf("v17_graph_search_longlinks")
    info(f"recall@10: v16=$r16%.2f v17(long links)=$r17%.2f")
    // connectivity only ADDS reachable candidates under full visited
    // memory + exact rerank; the build-time escalation must not hurt
    assert(r17 >= r16, s"long links reduced recall: $r17 < $r16")
    assert(r17 >= 0.4, s"long-link recall floor broken: $r17")
  }

  test("v23: hierarchical routing matches v17 recall on fewer touched edges") {
    val exact = SparkEntry.queries("v1_brute_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallOf(q: String): Double = {
      val got = SparkEntry.queries(q)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val r17 = recallOf("v17_graph_search_longlinks")
    val r23 = recallOf("v23_graph_hier_route")
    info(f"recall@10: v17=$r17%.2f v23(hier route)=$r23%.2f")
    assert(r23 >= r17, s"hierarchical routing lost recall: $r23 < $r17")
    // efficiency: the routed entry over the pure (lower-degree) v5 graph
    // must expand fewer frontier edges than v17's chain-link wander —
    // the point of paying for the coarse layer
    val (_, t17) = catalog.Similarity.beamWalk(spark, sf,
      catalog.Similarity.v17Edges(spark, sf), None, countTouched = true)
    val (_, t23) = catalog.Similarity.beamWalk(spark, sf,
      catalog.Similarity.v5Edges(spark, sf),
      Some(catalog.Similarity.hierRouteSeed(spark, sf)), countTouched = true)
    info(s"touched frontier edges: v17=$t17 v23=$t23")
    assert(t23 < t17, s"routing did not reduce touched edges: $t23 >= $t17")
  }

  test("v23: derived descent depth does not lose recall vs the old constant 4") {
    // round-9 advice #5: RouteHops is now ceil(log2 k)+1 from the trained
    // centroid count. The derived-depth seed must route at least as well
    // as the retired constant-4 run — a deeper monotone descent can only
    // grow the visited cell set, so equality is the floor, regression a bug.
    val exact = SparkEntry.queries("v1_brute_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallOfSeed(seed: org.apache.spark.sql.DataFrame): Double = {
      val (out, _) = catalog.Similarity.beamWalk(spark, sf,
        catalog.Similarity.v5Edges(spark, sf), Some(seed), countTouched = false)
      val got = out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val rDerived = recallOfSeed(catalog.Similarity.hierRouteSeed(spark, sf))
    val rConst4 = recallOfSeed(
      catalog.Similarity.hierRouteSeed(spark, sf, hopsOverride = Some(4)))
    info(f"recall@10: derived-depth=$rDerived%.2f constant-4=$rConst4%.2f")
    assert(rDerived >= rConst4,
      s"derived descent depth lost recall: $rDerived < $rConst4")
  }

  test("v26: hop-recall sweep is monotone; the 3-hop point equals v16's recall") {
    val sweep = SparkEntry.queries("v26_hop_recall_sweep")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).sortBy(_._1)
    assert(sweep.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // the h-hop visited set contains the (h−1)-hop one → recall monotone
    assert(sweep.sliding(2).forall(w => w(1)._2 >= w(0)._2),
      s"recall not monotone in hops: ${sweep.toSeq}")
    // hops=3 IS v16's walk: its recall must equal v16's measured recall
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce, count, lit, sum}
    val v16 = SparkEntry.queries("v16_graph_beam_search")(spark, sf)
      .select($"q_id", $"neighbor_id").withColumn("hit", lit(1L))
    val truth = SparkEntry.queries("v1_brute_topk")(spark, sf)
      .select($"q_id", $"neighbor_id")
    val r16 = truth.join(v16, Seq("q_id", "neighbor_id"), "left")
      .agg(sum(coalesce($"hit", lit(0L))), count(lit(1))).head()
    assert(sweep.last._2 == r16.getLong(0) * 10000 / r16.getLong(1),
      "the 3-hop sweep point diverged from v16's own walk")
  }

  test("v24: PQ-scored navigation holds recall; emitted cosines are exact") {
    import spark.implicits._
    val exact = SparkEntry.queries("v1_brute_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallOf(q: String): Double = {
      val got = SparkEntry.queries(q)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val r16 = recallOf("v16_graph_beam_search")
    val r24 = recallOf("v24_pq_graph_search")
    info(f"recall@10: v16(exact nav)=$r16%.2f v24(PQ nav)=$r24%.2f")
    // the quantization only degrades NAVIGATION; the stored-graph
    // connectivity ceiling (v16's 0.3 floor) must still hold
    assert(r24 >= 0.3, s"PQ navigation collapsed recall: $r24")
    // exact-rerank contract: every emitted cosine is the TRUE cosine —
    // recomputed with the serial-fold kernel over the raw embeddings
    val rows = SparkEntry.queries("v24_pq_graph_search")(spark, sf).collect()
    val need = rows.flatMap(r => Seq(r.getLong(0), r.getLong(2))).toSet
    val vecs = Tables(spark, sf).embeddings
      .filter($"vec_id".isin(need.toSeq: _*))
      .select($"vec_id", $"embedding".cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def sdot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc = acc + a(i) * b(i); i += 1 }
      acc
    }
    rows.foreach { r =>
      val (q, n) = (vecs(r.getLong(0)), vecs(r.getLong(2)))
      val truth = sdot(q, n) / (math.sqrt(sdot(q, q)) * math.sqrt(sdot(n, n)))
      assert(r.getDouble(3) == truth,
        s"v24 emitted a non-exact cosine for (${r.getLong(0)}, ${r.getLong(2)})")
    }
  }

  test("v25: personalized ranks equal a serial integer twin; mass stays in the seed ball") {
    import spark.implicits._
    val edges = SparkEntry.queries("v5_knn_graph")(spark, sf)
      .select("src_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val outdeg = edges.groupBy(_._1).map { case (k, g) => k -> g.length.toLong }
    val adj = edges.groupBy(_._1).map { case (k, g) => k -> g.map(_._2) }
    val seeds = outdeg.keys.filter(_ < 10).toSeq.sorted
    val ns = seeds.size.toLong
    var rank: Map[Long, Long] = seeds.map(s => s -> 1000000000000L / ns).toMap
    for (_ <- 1 to 3) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((id, r) <- rank) {
        val c = (85L * r) / (100L * outdeg(id))
        if (c > 0) adj(id).foreach(d => in(d) += c)
      }
      rank = (seeds.map(s => s -> 0L).toMap.keySet ++ in.keySet).iterator
        .map(id => id ->
          ((if (id < 10) 150000000000L / ns else 0L) + in(id))).toMap
    }
    val want = rank.toSeq.filter(_._1 >= 10)
      .sortBy { case (id, r) => (-r, id) }.take(20)
    val got = SparkEntry.queries("v25_pagerank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, "PPR diverged from the serial integer twin")
    // personalization is real: nonzero mass reaches only the seeds' 3-hop
    // ball, a strict subset of the graph's nodes
    assert(rank.keySet.size < outdeg.keys.size,
      "PPR mass covered every node — not personalized on this fixture")
    assert(got.nonEmpty && got.forall(_._2 > 0))
  }

  test("v27: reached ball grows monotonically; depth 3 agrees with v25's own top-20") {
    val rows = SparkEntry.queries("v27_ppr_sweep")(spark, sf).collect()
      .sortBy(_.getAs[Long]("iters"))
    assert(rows.map(_.getAs[Long]("iters")).toSeq == Seq(1L, 2L, 3L))
    // the k-hop reached set contains the (k-1)-hop one by construction
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_reached") <= b.getAs[Long]("n_reached"))
      case _ =>
    }
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0 && hits <= 20)
      assert(r.getAs[Long]("overlap_bp") == hits * 10000 / 20)
    }
    // depth-3 ranks ARE v25's ranks — the sweep's last point must agree
    // with the shipped entry's top-20 id set
    val v25Ids = SparkEntry.queries("v25_pagerank")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(v25Ids.size == math.min(20, v25Ids.size))
    // overlap(3 vs 4) should be at least overlap(1 vs 4): deeper walks
    // only refine toward the reference
    assert(rows.last.getAs[Long]("n_hits") >= rows.head.getAs[Long]("n_hits"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** d19's keeper rule must genuinely differ from d9's min-id rule — if the
  * score degenerates (as a constant-quality corpus would make a
  * ratio-based score do), the entry silently collapses into d9 and tests
  * nothing new. Keeper optimality is pinned against the TRUE group
  * (doc ∪ its near-dup partners from the shared pair table): the keeper
  * must be the exact (clean_chars desc, doc_id asc) argmax.
  */
class QualityKeeperSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("d19: keeper is the max-clean-chars group member and diverges from d9") {
    import spark.implicits._
    val d19 = SparkEntry.queries("d19_quality_keeper")(spark, sf)
      .select($"doc_id", $"keeper").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d9 = SparkEntry.queries("d9_dedup_reps")(spark, sf)
      .select($"doc_id", $"rep").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d19.keySet == d9.keySet)
    val nonSelf = d19.filter { case (d, k) => d != k }
    assert(nonSelf.nonEmpty, "fixture must have near-dup groups")
    assert(d19.exists { case (d, k) => d9(d) != k },
      "quality keeper must diverge from min-id rep somewhere on the fixture")
    // keeper must dominate the doc itself on (clean_chars desc, id asc)
    val chars = Tables(spark, sf).documents
      .select($"doc_id", org.apache.spark.sql.functions
        .expr(catalog.Dedup.cleanCharsExpr).cast("long").as("cc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact argmax over the TRUE group: {doc} ∪ its near-dup partners
    // from the same pair table the entry consumes
    val pairs = catalog.Dedup.stagedMinhashPairs(spark, sf)
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (d, ps) => d -> ps.map(_._2).toSet }
    d19.foreach { case (d, k) =>
      val group = nbrs.getOrElse(d, Set.empty) + d
      val best = group.toSeq.sortBy(m => (-chars(m), m)).head
      assert(k == best,
        s"keeper for $d must be the group argmax $best, got $k")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** c10's continuous curation chain: per-stage store contents must match
  * the standalone gate semantics recomputed independently, and an
  * at-least-once replay of the WHOLE stream over the populated stores
  * must append nothing (byte-identical output, unchanged store counts) —
  * e18/e29's anti-join convention composed. */
class StreamCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("c10: stage counts match standalone gates; full replay byte-identical") {
    import spark.implicits._
    val stores = (
      Scratch.dir("c10spec_q").resolve("q").toString,
      Scratch.dir("c10spec_d").resolve("d").toString,
      Scratch.dir("c10spec_l").resolve("l").toString,
      Scratch.dir("c10spec_c").resolve("c").toString)
    val first = rows(catalog.Streams.runContinuousCuration(spark, sf, Some(stores)))
    assert(first.nonEmpty)
    val docs = Tables(spark, sf).documents
    // stage 1 — quarantine holds exactly the injected corrupt rows (e30's
    // gate: content-addressed raw lines, so the count is exact)
    val nCorrupt = docs.filter($"doc_id" % 37 === 5).count()
    assert(nCorrupt > 0, "fixture has no corrupt rows — stage 1 vacuous")
    assert(spark.read.parquet(stores._1).count() == nCorrupt,
      "quarantine store != injected corrupt rows")
    // stage 2 — the collapsed digest index == d1's min-keeper set over the
    // clean rows, recomputed independently
    val expIdx = docs.filter($"doc_id" % 37 =!= 5)
      .withColumn("digest",
        expr("md5(trim(regexp_replace(lower(text), '[^a-z ]', '')))"))
      .groupBy($"digest").agg(min($"doc_id").as("keeper_doc_id"))
    val gotIdx = spark.read.parquet(stores._2)
      .groupBy($"digest").agg(min($"keeper_doc_id").as("keeper_doc_id"))
    assert(gotIdx.exceptAll(expIdx).count() == 0 &&
           expIdx.exceptAll(gotIdx).count() == 0,
      "digest index drifted from the d1 keeper set over clean rows")
    // stages 3/4 — every LSH keeper lands in the corpus exactly once
    val lshIds = spark.read.parquet(stores._3).select($"doc_id")
    assert(lshIds.distinct().count() == lshIds.count(), "LSH index duplicated a keeper")
    assert(first.map(_._1).toSet ==
      lshIds.collect().map(_.getLong(0)).toSet,
      "corpus store != LSH keeper set")
    val counts1 = Seq(stores._1, stores._2, stores._3, stores._4)
      .map(p => spark.read.parquet(p).count())
    // replay: same feed, no checkpoint — every micro-batch re-arrives;
    // the per-store anti-joins must keep everything byte-identical
    val second = rows(catalog.Streams.runContinuousCuration(spark, sf, Some(stores)))
    assert(second == first, "replay changed the curated corpus")
    val counts2 = Seq(stores._1, stores._2, stores._3, stores._4)
      .map(p => spark.read.parquet(p).count())
    assert(counts2 == counts1, s"replay appended rows: $counts1 -> $counts2")
  }

  test("c12: lineage partitions the input — every doc exactly once, all classes witnessed") {
    import spark.implicits._
    // planted fixture: the synthetic corpus has no exact duplicates, so
    // plant every disposition class deterministically — two corrupt-id
    // rows (% 37 == 5), one exact-twin pair, one cross-batch near-dup
    // pair (one changed word), and unique released docs
    val twin = "identical twin text body planted for the exact gate to collapse cleanly"
    def near(w: String) = ("the quick brown fox jumps over the lazy dog while " +
      s"seven wizards brew strong potions $w")
    val rows = Seq(
      1L -> "a unique document about alpha topics with its own words here",
      2L -> "a unique document about beta topics with different words entirely",
      5L -> "this row gets its id corrupted by the feed trap",
      10L -> twin, 20L -> twin,
      30L -> near("tonight"), 31L -> near("today"),
      42L -> "another corrupted row lost to the ingest trap",
      55L -> "a final unique document about gamma topics closing the fixture")
    val dir = java.nio.file.Files.createTempDirectory("c12fix").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("c12_curation_lineage")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // exhaustive + disjoint: one lineage row per input doc
    assert(out.length == rows.length, s"lineage rows: ${out.toSeq}")
    assert(out.map(_._1).toSet == rows.map(_._1).toSet)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(5L)._2 == "quarantined" && byId(42L)._2 == "quarantined")
    assert(byId(10L)._2 != "exact_dup", "keeper misclassified as exact dup")
    assert(byId(20L) == ((20L, "exact_dup", 10L)), s"twin evidence: ${byId(20L)}")
    assert(byId(30L)._2 == "released", "near-dup keeper not released")
    assert(byId(31L)._2 == "near_dup", s"planted near-dup not dropped: ${byId(31L)}")
    Seq(1L, 2L, 55L).foreach(id =>
      assert(byId(id)._2 == "released", s"unique doc $id not released"))
    // evidence: every exact_dup's keeper is itself accounted for as a
    // NON-exact-dup (a keeper survives the exact stage by definition)
    val keeperless = out.filter(_._2 == "exact_dup").map(_._3).toSet --
      out.filter(r => r._2 == "near_dup" || r._2 == "released").map(_._1).toSet
    assert(keeperless.isEmpty, s"exact-dup keepers unaccounted: $keeperless")
  }
}

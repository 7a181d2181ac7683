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
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** e29's streaming near-dup gate: the persistent index must (a) partition
  * the corpus into keepers + witnessed drops, (b) never retain two
  * est-Jaccard ≥ 0.5 bucket-mates (unless the bucket was cap-cut), and
  * (c) replay the whole stream over its own populated index without
  * changing a byte (at-least-once ingestion). */
class StreamNearDupGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def estJ(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / 16.0

  test("e29: drops are witnessed, keeper bucket-mates stay below the dup bar") {
    import spark.implicits._
    val out = graft.catalog.Streams.runNearDupGate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables(spark, sf).documents
      .select($"doc_id", graft.functions.TextKernels.minhashUdf($"text").as("sig"),
        graft.functions.TextKernels.bandsUdf(
          graft.functions.TextKernels.minhashUdf($"text")).as("bands"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    val ids = docs.map(_._1)
    val (lo, hi) = (ids.min, ids.max)
    val step = (hi - lo) / 2 + 1
    def batchOf(id: Long): Long = if (id < lo + step) 0L else 1L
    val sigOf = docs.map(d => d._1 -> d._2).toMap
    val bandsOf = docs.map(d => d._1 -> d._3).toMap
    // arrived batch recorded in the index matches the range the doc came in
    out.foreach { case (id, arrived) => assert(arrived == batchOf(id)) }
    // every dropped doc has a witness: est >= 0.5 vs an earlier-batch
    // keeper or ANY smaller-id same-batch doc (chain-free contract)
    val dropped = ids.filterNot(out.contains)
    assert(dropped.nonEmpty, "fixture has no near-dups to gate")
    dropped.foreach { d =>
      val witness = ids.exists { w =>
        w != d && estJ(sigOf(d), sigOf(w)) >= 0.5 && (
          (out.contains(w) && batchOf(w) < batchOf(d)) ||
            (batchOf(w) == batchOf(d) && w < d))
      }
      assert(witness, s"doc $d dropped with no est>=0.5 witness")
    }
    // no two keepers share a band bucket at est >= 0.5 — unless that
    // bucket exceeds MaxBucket over the whole corpus (then every per-hop
    // domain could have cap-cut it)
    val bucketPop = scala.collection.mutable.Map[(Int, Long), Int]()
    docs.foreach { case (_, _, bands) =>
      bands.zipWithIndex.foreach { case (h, i) =>
        bucketPop((i, h)) = bucketPop.getOrElse((i, h), 0) + 1
      }
    }
    val keepers = out.keys.toArray.sorted
    for {
      i <- keepers.indices; j <- (i + 1) until keepers.length
      (x, y) = (keepers(i), keepers(j))
      shared = bandsOf(x).zipWithIndex.exists { case (h, b) =>
        bandsOf(y)(b) == h && bucketPop((b, h)) <= graft.catalog.Dedup.MaxBucket
      }
      if shared
    } assert(estJ(sigOf(x), sigOf(y)) < 0.5,
      s"keepers $x,$y are uncapped bucket-mates at est>=0.5")
  }

  test("e29: replaying the stream over the populated index appends nothing") {
    val idx = Scratch.dir("e29_spec_idx").resolve("idx").toString
    val first = graft.catalog.Streams.runNearDupGate(spark, sf, Some(idx))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val replay = graft.catalog.Streams.runNearDupGate(spark, sf, Some(idx))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(replay == first)
    // raw index row count unchanged too (no duplicate keeper rows)
    assert(spark.read.parquet(idx).count() == first.size)
  }
}

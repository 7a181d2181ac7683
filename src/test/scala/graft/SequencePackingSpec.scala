package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** g18's two-pass bucket-offset prefix must reproduce the SERIAL prefix sum
  * exactly — the property that makes the scalable plan correct. Token counts
  * are taken from the same shared expression both engines use, so this spec
  * isolates the prefix/window arithmetic. */
class SequencePackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("g18 == serial exclusive prefix + window math") {
    import spark.implicits._
    val nToks = Tables(spark, sf).documents
      .select($"doc_id", expr(s"size(${graft.catalog.Tx.wsExpr})").cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val want = nToks.map { case (id, nt) =>
      val start = acc; acc += nt
      val winStart = start / 512
      val winEnd = (start + math.max(nt, 1) - 1) / 512
      (id, nt, start, winStart, winEnd, start % 512, winEnd - winStart + 1)
    }.toSeq
    val got = SparkEntry.queries("g18_sequence_packing")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want,
      s"first diff: ${want.zip(got).find { case (a, b) => a != b }}")
    // fixture must actually cross window boundaries
    assert(want.exists(_._7 > 1), "no doc spans two windows — vacuous")
  }

  /** Serial replay of g19's harmonic class algorithm over (id, n_tok). */
  private def serialHarmonic(docs: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long, Long)] = {
    val withCls = docs.map { case (id, nt) =>
      val cls = if (nt > 512) 0L else 512L / math.max(nt, 1L)
      (id, nt, cls)
    }
    val caps = withCls.map(_._3).distinct.sorted
      .map(c => c -> (if (c == 0) 1L else c)).toMap
    val counts = withCls.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    var off = 0L
    val offMap = caps.keys.toSeq.sorted.map { c =>
      val o = c -> off; off += (counts(c) + caps(c) - 1) / caps(c); o
    }.toMap
    withCls.groupBy(_._3).toSeq.flatMap { case (c, ds) =>
      ds.sortBy(_._1).zipWithIndex.map { case ((id, nt, _), rnk) =>
        (id, nt, c, offMap(c) + rnk / caps(c), rnk % caps(c))
      }
    }.sortBy(_._1)
  }

  /** Serial first-fit-decreasing bin count (the quality yardstick). */
  private def ffdBins(lens: Seq[Long]): Int = {
    val bins = scala.collection.mutable.ArrayBuffer[Long]()
    lens.filter(_ <= 512).sortBy(-_).foreach { n =>
      bins.indexWhere(_ + n <= 512) match {
        case -1 => bins += n
        case i  => bins(i) += n
      }
    }
    bins.size + lens.count(_ > 512)
  }

  test("g19 == serial harmonic replay; capacity/no-split/density invariants; quality vs FFD") {
    import spark.implicits._
    val rows = SparkEntry.queries("g19_boundary_pack")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val docs = Tables(spark, sf).documents
      .select($"doc_id", expr(s"size(${graft.catalog.Tx.wsExpr})").cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // exact equality with the serial statement of the algorithm
    assert(rows == serialHarmonic(docs))
    // every doc exactly once, one window each (no split by construction)
    assert(rows.map(_._1).distinct.size == docs.size)
    // capacity invariant: every packable window's token sum <= 512
    val overfull = rows.filter(_._3 > 0).groupBy(_._4)
      .collect { case (w, ds) if ds.map(_._2).sum > 512 => w }
    assert(overfull.isEmpty, s"windows over 512 tokens: $overfull")
    // window ids dense 0..W-1
    val wins = rows.map(_._4).distinct.sorted
    assert(wins == (0L until wins.size.toLong))
    // quality: within 1.5x of serial FFD on the fixture (measured 1.09x at
    // sf0.1 — the small-SF gap is partial-window overhead, O(#classes))
    val ffd = ffdBins(docs.map(_._2))
    assert(wins.size <= math.ceil(ffd * 1.5).toLong, s"harmonic ${wins.size} vs ffd $ffd")
    assert(wins.size >= ffd, "harmonic cannot beat FFD")
  }

  test("g19 oversize + empty docs: dedicated windows, no crash, invariants hold") {
    import spark.implicits._
    val synth = Seq(
      (1L, 600L), (2L, 513L), (3L, 512L), (4L, 1L), (5L, 0L),
      (6L, 256L), (7L, 256L), (8L, 256L), (9L, 100L), (10L, 5000L))
      .toDF("doc_id", "n_tok")
    val got = graft.catalog.Analytics.binPack(synth).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(_._1)
    assert(got == serialHarmonic(
      Seq((1L, 600L), (2L, 513L), (3L, 512L), (4L, 1L), (5L, 0L),
          (6L, 256L), (7L, 256L), (8L, 256L), (9L, 100L), (10L, 5000L))))
    // oversize docs (600, 513, 5000) are class 0, alone in their windows
    val cls0 = got.filter(_._3 == 0)
    assert(cls0.map(_._1).toSet == Set(1L, 2L, 10L))
    assert(cls0.map(_._4).distinct.size == 3, "each oversize doc gets its own window")
    assert(cls0.forall(_._5 == 0))
    // the two 256-token docs pair up (cap 2), the third starts a new window
    val c2 = got.filter(_._3 == 2).map(_._4)
    assert(c2.distinct.size == 2)
  }
}

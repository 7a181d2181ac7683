package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** e27's production claim, pinned batch by batch: a vector ingested in
  * micro-batch k is FINDABLE from batch k+1 on — it sits in the persistent
  * edge store with index-vector anchors, so the symmetrized beam walk can
  * reach it from old nodes — and the append is idempotent under replay.
  * The oracle gate already pins the final search result; this spec pins the
  * in-between states the oracle cannot see (the store between batches). */
class StreamGraphSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("e27: batch-k vectors findable at batch k+1; replay appends nothing") {
    val dir = TestSpark.sf
    val all = Tables(spark, dir).embeddings
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
      .select($"vec_id", $"v", $"norm2")
    val idx = all.filter(pmod($"vec_id", lit(10)) =!= 7)
    val nb = Tables(spark, dir).embeddings
      .filter(pmod($"vec_id", lit(10)) === 7)
      .select($"vec_id", $"embedding")
    val cents =
      catalog.Quantizer.centroidsOnIndexFor(idx, dir, "idx7", iters = 2, dim = 64)
    val data = catalog.Quantizer.assign(idx, cents)
      .select($"cell", $"vec_id", $"v", $"norm2")
    val idxIds = idx.select($"vec_id").as[Long].collect().toSet
    val edges = Scratch.dir("spec_e27").resolve("edges").toString

    // the same 4 id-ranged batches the staged ingest fixture carries,
    // driven one at a time so the store can be inspected BETWEEN batches
    val bounds = nb.agg(min($"vec_id"), max($"vec_id")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val step = (hi - lo) / 4 + 1
    val batches = (0 until 4).map { i =>
      nb.filter($"vec_id" >= lo + i * step && $"vec_id" < lo + (i + 1) * step)
    }
    var seen = Set.empty[Long]
    batches.zipWithIndex.foreach { case (b, k) =>
      if (k > 0) {
        val bySrc = spark.read.parquet(edges)
          .select($"src_id", $"neighbor_id").as[(Long, Long)]
          .collect().groupBy(_._1)
        seen.foreach { id =>
          val anchors = bySrc.getOrElse(id, Array.empty).map(_._2)
          assert(anchors.nonEmpty,
            s"vector $id (ingested before batch $k) missing from the edge store")
          assert(anchors.forall(idxIds.contains),
            s"vector $id anchored to a non-index node: ${anchors.mkString(",")}")
        }
      }
      catalog.Streams.insertGraphEdges(b, data, cents, edges)
      seen ++= b.select($"vec_id").as[Long].collect()
    }
    assert(seen.nonEmpty)
    val nEdges = spark.read.parquet(edges).count()
    // at-least-once replay: re-inserting batch 0 must append nothing
    catalog.Streams.insertGraphEdges(batches(0), data, cents, edges)
    assert(spark.read.parquet(edges).count() == nEdges, "replay duplicated edges")
    // every streamed vector ends findable
    val srcs = spark.read.parquet(edges).select($"src_id").as[Long].collect().toSet
    assert(seen.subsetOf(srcs))

    // end-to-end: the shipped query searches FROM a streamed vector —
    // q_id = 7 is in the new partition, so its walk starts on streamed edges
    val res = SparkEntry.queries("e27_stream_graph_search")(spark, dir).collect()
    val q7 = res.filter(_.getLong(0) == 7L)
    assert(q7.nonEmpty, "streamed vector 7 not searchable")
    assert(q7.map(_.getLong(1)).sorted.toSeq == (1L to q7.length).toSeq)
  }
}

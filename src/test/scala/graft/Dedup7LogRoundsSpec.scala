package graft

import org.scalatest.funsuite.AnyFunSuite

/** d7's connected components must converge in O(log n) driver rounds, not
  * graph diameter: a 100 TB near-dup CHAIN would otherwise mean O(chain)
  * sequential Spark jobs. The pointer-jumping step doubles the distance the
  * min label travels each round (d_{t+1} = 2·d_t + 2), so a planted
  * 64-chain (diameter 63 — plain propagation needs 63+ rounds) must finish
  * in ≤ ⌈log₂ n⌉ + 2 rounds including the final no-change round. */
class Dedup7LogRoundsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Parquet round-trip, like production inputs: non-nullable LocalRelation
    * columns make Catalyst's union constraint rewrite throw (upstream
    * quirk), and every real caller feeds source-backed frames. */
  private def viaParquet(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("cc").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("64-chain converges in ≤ log2(64)+2 rounds to per-component min labels") {
    import spark.implicits._
    val edges = viaParquet((0L until 63L).map(i => (i, i + 1)).toDF("d1", "d2"))
    val nodes = viaParquet((0L until 64L).toDF("doc_id"))
    val (labels, rounds) = catalog.Dedup.connectedComponents(edges, nodes)
    assert(rounds <= 8, s"took $rounds rounds on a 64-chain")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 64 && got.values.forall(_ == 0L),
      "every chain node must take the component min label 0")
  }

  test("two components keep separate min labels") {
    import spark.implicits._
    val edges = viaParquet(Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("d1", "d2"))
    val nodes = viaParquet(Seq(10L, 11L, 12L, 20L, 21L, 30L).toDF("doc_id"))
    val (labels, _) = catalog.Dedup.connectedComponents(edges, nodes)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
                      20L -> 20L, 21L -> 20L, 30L -> 30L))
  }
}

package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Proves the co-located-join story: bucketing both fact tables on the join
  * key lets the sort-merge join run with NO shuffle exchange — at 100 TB
  * this is the difference between re-shuffling every query and paying the
  * shuffle once at ingest. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed-by-key join plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val t = Tables(spark, TestSpark.sf)
    val B = 4

    t.orders.write.bucketBy(B, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b")
      .mode("overwrite").format("parquet").saveAsTable("orders_b")
    t.lineitem.write.bucketBy(B, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b")
      .mode("overwrite").format("parquet").saveAsTable("lineitem_b")

    // force SMJ so the test checks bucket alignment, not broadcast avoidance
    val joined = spark.table("lineitem_b").hint("merge")
      .join(spark.table("orders_b"), $"l_orderkey" === $"o_orderkey")
      .select($"o_orderkey", $"l_linenumber", $"o_totalprice")

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")

    // and it computes the same thing as the unbucketed join
    val want = t.lineitem.join(t.orders, $"l_orderkey" === $"o_orderkey").count()
    assert(joined.count() == want)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("v2 deployment shape: persisted band buckets join with no corpus-side exchange") {
    import org.apache.spark.sql.functions._
    val wh = Files.createTempDirectory("graft_whv2").toString
    val e = Tables(spark, TestSpark.sf).embeddings
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("sig", graft.functions.TextKernels.lshSigUdf($"v"))
      .select($"vec_id", $"sig")
    val buckets = catalog.Similarity.bandBuckets(e)

    // ingest-time: signatures exploded to band buckets, persisted
    // bucketBy(band) — the one-time shuffle every later query amortizes
    buckets.write.bucketBy(8, "band_idx", "band_val")
      .sortBy("band_idx", "band_val")
      .option("path", s"$wh/corpus_bands")
      .mode("overwrite").format("parquet").saveAsTable("corpus_bands")

    val qb = buckets.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"band_idx", $"band_val")
    val joined = spark.table("corpus_bands").hint("merge")
      .join(qb, Seq("band_idx", "band_val"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id")

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(plan.contains("Bucketed: true"), s"corpus scan not bucketed:\n$plan")
    // exactly ONE hash exchange — the (tiny) query side repartitioning into
    // the corpus's bucket layout; the corpus itself is read in place
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(nExchanges == 1, s"expected only the query-side exchange, got $nExchanges:\n$plan")

    // same candidate set as the unbucketed v2 candidate join
    val want = buckets.as("c").join(qb, Seq("band_idx", "band_val"))
      .filter($"vec_id" =!= $"q_id").select($"q_id", $"vec_id").distinct().count()
    assert(joined.distinct().count() == want)
    spark.sql("DROP TABLE IF EXISTS corpus_bands")
  }
}

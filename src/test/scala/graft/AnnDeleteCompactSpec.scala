package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** v21's delete→compact lifecycle: the compacted store must equal the
  * tombstone-masked store (collapse-on-read and compaction are two views
  * of one delete), search results must never surface a deleted vector,
  * and — the property dirty-cell-only compaction EXISTS for — clean
  * cells' files must come from the initial copy job, not the overwrite
  * (proved by the writer-job UUID embedded in every part filename).
  */
class AnnDeleteCompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def fixture() = {
    import spark.implicits._
    val e = Tables(spark, sf).embeddings
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
      .select($"vec_id", $"v", $"norm2")
    val cents = catalog.Quantizer.centroidsFor(e, sf, iters = 2, dim = 64)
    (e, cents)
  }

  test("v21: compacted store == postings minus tombstones; no deleted id survives") {
    import spark.implicits._
    val (e, cents) = fixture()
    val post = spark.read.parquet(catalog.Similarity.v21Postings(spark, sf, e, cents))
    val comp = spark.read.parquet(catalog.Similarity.compactedPostings(spark, sf, e, cents))
    val masked = post.join(catalog.Similarity.v21Tombstones(e),
      Seq("vec_id"), "left_anti")
    assert(comp.count() == masked.count())
    assert(comp.join(masked, Seq("vec_id"), "left_anti").count() == 0)
    assert(comp.filter(pmod($"vec_id", lit(181)) === 3).count() == 0)
    assert(post.filter(pmod($"vec_id", lit(181)) === 3).count() > 0,
      "fixture must actually contain deleted vectors")
  }

  test("v21: only dirty cells rewritten; results exclude deleted vectors") {
    import spark.implicits._
    val (e, cents) = fixture()
    val pPath = catalog.Similarity.v21Postings(spark, sf, e, cents)
    val cPath = catalog.Similarity.compactedPostings(spark, sf, e, cents)
    val dirty = spark.read.parquet(pPath)
      .join(catalog.Similarity.v21Tombstones(e), Seq("vec_id"), "left_semi")
      .select("cell").distinct().as[Int].collect().toSet
    val all = spark.read.parquet(pPath).select("cell")
      .distinct().as[Int].collect().toSet
    val uuidRe = "part-\\d+-([0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12})".r
    def jobIds(cell: Int): Set[String] = {
      val d = java.nio.file.Paths.get(cPath, s"cell=$cell")
      val ls = java.nio.file.Files.list(d)
      try ls.iterator().asScala
        .map(_.getFileName.toString)
        .flatMap(n => uuidRe.findFirstMatchIn(n).map(_.group(1)))
        .toSet
      finally ls.close()
    }
    val cleanIds = (all -- dirty).flatMap(jobIds)
    val dirtyIds = dirty.flatMap(jobIds)
    assert(dirty.nonEmpty, "fixture must dirty at least one cell")
    assert((all -- dirty).nonEmpty, "fixture must leave at least one clean cell")
    assert(cleanIds.size == 1,
      s"clean cells must all come from the single copy job: $cleanIds")
    assert((cleanIds & dirtyIds).isEmpty,
      "dirty cells must come from the overwrite job, clean from the copy job")
    val res = SparkEntry.queries("v21_ann_delete_compact")(spark, sf)
    assert(res.filter(pmod($"neighbor_id", lit(181)) === 3).count() == 0)
    assert(res.count() > 0)
  }

  test("v21: a fully-tombstoned cell's directory is deleted, not orphaned") {
    import spark.implicits._
    // dynamic partition overwrite only replaces partitions PRESENT in the
    // written data — a cell whose every row is deleted would otherwise
    // survive as an orphan directory full of deleted vectors
    val (e, cents) = fixture()
    val pPath = catalog.Similarity.v21Postings(spark, sf, e, cents)
    val post = spark.read.parquet(pPath)
    val victim = post.groupBy($"cell").count()
      .orderBy($"count", $"cell").select($"cell").as[Int].head()
    val tomb = post.filter($"cell" === victim).select($"vec_id")
    val nTomb = tomb.count()
    val cPath = catalog.Similarity.compactedPostings(
      spark, sf, e, cents, Some(tomb), tag = "v21dead")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(cPath, s"cell=$victim")),
      s"fully-dead cell $victim must be deleted from the store")
    val comp = spark.read.parquet(cPath)
    assert(comp.filter($"cell" === victim).count() == 0)
    assert(comp.count() == post.count() - nTomb)
  }
}

package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The hot-key guards in Dedup (MaxBucket / MaxDf): planted viral keys —
  * one band bucket / one shingle shared by hundreds of documents — must be
  * cut from candidate generation (the B² quadratic), while ordinary
  * near-dup pairs keep surfacing. */
class DedupHotKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("hotkey").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("d2: a viral band bucket (150 identical docs) is cut; small groups pair") {
    val viral = (0L until 150L).map(i => i -> "the viral boilerplate every crawler copy has seen")
    val pair = Seq(200L -> "a genuinely unique document body with its own words here",
                   201L -> "a genuinely unique document body with its own words here")
    val dir = writeDocs(viral ++ pair)
    val out = SparkEntry.queries("d2_minhash_lsh")(spark, dir).collect()
    // every bucket of the viral group has 150 > MaxBucket members → no pairs
    assert(!out.exists(_.getLong(0) < 150), "viral bucket leaked candidate pairs")
    // the 2-copy group pairs normally (identical signatures, est = 1.0)
    assert(out.exists(r => r.getLong(0) == 200L && r.getLong(1) == 201L))
  }

  test("d8: a viral simhash block (150 identical signatures) is cut; pair survives") {
    val viral = (0L until 150L).map(i => i -> "the viral boilerplate every crawler copy has seen")
    val pair = Seq(200L -> "a genuinely unique document body with its own words here",
                   201L -> "a genuinely unique document body with its own words here")
    val dir = writeDocs(viral ++ pair)
    val out = SparkEntry.queries("d8_simhash_pairs")(spark, dir).collect()
    // identical texts → identical simhash → every 8-bit block bucket has
    // 150 > MaxBucket members → cut from candidate generation
    assert(!out.exists(r => r.getLong(0) < 150 && r.getLong(1) < 150),
      "viral simhash block leaked candidate pairs")
    // the 2-copy group pairs normally (hamming 0)
    assert(out.exists(r => r.getLong(0) == 200L && r.getLong(1) == 201L &&
      r.getLong(2) == 0L))
  }

  test("d10: viral 62-bit-signature blocks are cut; pair survives with hamming 0") {
    val viral = (0L until 150L).map(i => i -> "the viral boilerplate every crawler copy has seen")
    val pair = Seq(200L -> "a genuinely unique document body with its own words here",
                   201L -> "a genuinely unique document body with its own words here")
    val dir = writeDocs(viral ++ pair)
    val out = SparkEntry.queries("d10_simhash64_pairs")(spark, dir).collect()
    assert(!out.exists(r => r.getLong(0) < 150 && r.getLong(1) < 150),
      "viral simhash64 block leaked candidate pairs")
    assert(out.exists(r => r.getLong(0) == 200L && r.getLong(1) == 201L &&
      r.getLong(2) == 0L))
  }

  test("d4: a viral shingle (df=300) is cut; clean duplicate pair survives") {
    val viral = (0L until 300L).map { i =>
      i -> s"common viral boilerplate prefix u${i}a u${i}b u${i}c u${i}d u${i}e"
    }
    val pair = Seq(1000L -> "totally distinct pair text one two three four five six",
                   1001L -> "totally distinct pair text one two three four five six")
    val dir = writeDocs(viral ++ pair)
    val out = SparkEntry.queries("d4_ngram_jaccard")(spark, dir).collect()
    // the shared viral shingle has df 300 > MaxDf → cut; the docs' other
    // shingles are unique → the 300 viral docs produce NO pairs
    assert(!out.exists(_.getLong(0) < 300), "viral shingle leaked pairs")
    // the duplicate pair's shingles all have df=2 → full-strength match
    val p = out.filter(r => r.getLong(0) == 1000L && r.getLong(1) == 1001L)
    assert(p.length == 1 && p.head.getAs[Double]("jaccard") >= 0.99)
  }

  test("d4/c6 plan pin: the MaxDf cap is groupBy + anti join, never a window over h") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    Seq("d4_ngram_jaccard", "c6_rag_retrieval").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.optimizedPlan
      // a count-over-h window ships every exploded row of a viral shingle
      // to one partition before the cap discards it; the converged shape
      // (d15/d16's) map-side combines the df count instead
      val winOverH = plan.collect {
        case w: LWindow
            if w.partitionSpec.exists(_.references.exists(_.name == "h")) => w
      }
      assert(winOverH.isEmpty, s"$name caps df via a window over h")
    }
  }
}

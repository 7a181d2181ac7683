package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipelines.Corpus

/** The composed curation pipeline: stage counts shrink monotonically, the
  * near-dedup stage actually removes planted near-duplicates, and the run
  * is deterministic. */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("curate: monotone stage counts, deterministic, enriched output") {
    val docs = Tables(spark, "/root/testdata/sf0.01").documents
    val (out, stages) = Corpus.curate(docs)
    val byName = stages.map(s => s.name -> s.rows).toMap
    assert(stages.map(_.rows) == stages.map(_.rows).sorted.reverse,
      s"stage counts not monotone: $stages")
    assert(byName("input") == 500)
    assert(byName("lang") > 0 && byName("quality") > 0 && byName("near_dedup") > 0)
    // near-dedup must actually drop something at sf0.01 (planted near-dups)
    assert(byName("near_dedup") < byName("exact_dedup"),
      s"near-dedup removed nothing: $stages")
    assert(out.columns.toSet.intersect(
      Set("doc_id", "text", "lang_pred", "quality_score", "n_tokens")).size == 5)

    val (out2, stages2) = Corpus.curate(docs)
    assert(stages2 == stages)
    assert(out2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("curate withStats=false: identical survivors, no stage counts") {
    // round-14: the lazy path must produce the SAME survivor rows as the
    // counted path (it is the same plan minus the count() actions/caches)
    val docs = Tables(spark, "/root/testdata/sf0.01").documents
    val (counted, stages) = Corpus.curate(docs)
    val (lazyOut, noStages) = Corpus.curate(docs, withStats = false)
    assert(noStages.isEmpty)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lang_pred", "n_tokens", "quality_score")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    assert(key(lazyOut) == key(counted))
    assert(stages.nonEmpty)
  }
}

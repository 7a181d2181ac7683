package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.catalog.Text
import graft.functions.TextKernels

/** End-to-end training-corpus curation — the composition a 100 TB
  * pretraining-data pipeline runs nightly, built entirely from this
  * library's verified operators:
  *
  *   1. language filter   (x3 kernel: marker-word language ID)
  *   2. quality filter    (x2 kernel: punct/digit/stopword linear score)
  *   3. exact dedup       (d1: md5-digest groupBy, keep lowest doc_id)
  *   4. near dedup        (d2: MinHash + LSH bands; greedy drop of the
  *                         higher doc_id per matched pair)
  *   5. enrich            (x1 token stats carried on the survivors)
  *
  * Shuffle budget at scale: one digest groupBy (step 3), one band-bucket
  * join + one semi-join (step 4). Steps 1-2-5 are pure per-row projection.
  * The greedy pair-drop is the standard first-pass policy (transitive
  * closure, when required, runs as iterative connected components over the
  * SAME candidate-pair frame — documented, not needed for the demo corpus).
  */
object Corpus {

  final case class Stage(name: String, rows: Long)

  /** Curate `documents(doc_id, text, …)`; returns the survivors enriched
    * with prediction/quality/token columns, plus per-stage row counts.
    *
    * `withStats = false` (round-14) builds the IDENTICAL survivor plan but
    * skips the five per-stage count() actions and the three intermediate
    * stage caches they exist to serve — a caller that only consumes the
    * survivors (c1's oracle entry) was paying five extra jobs plus cache
    * materialization per run. The one genuinely multi-consumer frame
    * (keepers: feeds the signature pass AND the anti-join) stays
    * persisted either way, so no subtree ever executes twice. */
  def curate(docs: DataFrame,
             keepLangs: Set[String] = Set("en", "de"),
             minQuality: Double = 0.8,
             estJaccard: Double = 0.5,
             withStats: Boolean = true): (DataFrame, Seq[Stage]) = {
    val spark = docs.sparkSession
    import spark.implicits._

    val n0 = if (withStats) docs.count() else -1L

    // 1-2: per-row scoring, one pass
    val scored = docs
      .withColumn("lang_pred", TextKernels.predictLangUdf(Text.markers)($"text"))
      .withColumn("qc", TextKernels.qualityCountsUdf(Text.stopwords.toSet)($"text"))
      .withColumn("tl", greatest(length($"text"), lit(1)))
      .withColumn("quality_score",
        lit(1.0) - ($"qc.punct_cnt".cast("double") / $"tl") * 2.0 -
          ($"qc.digit_cnt".cast("double") / $"tl"))
      .drop("qc", "tl")
    val langKept0 = scored.filter($"lang_pred".isin(keepLangs.toSeq: _*))
    val langKept = if (withStats) langKept0.cache() else langKept0
    val n1 = if (withStats) langKept.count() else -1L
    val qualKept0 = langKept.filter($"quality_score" >= minQuality)
    val qualKept = if (withStats) qualKept0.cache() else qualKept0
    val n2 = if (withStats) qualKept.count() else -1L

    // 3: exact dedup on content digest (deterministic keeper) —
    // multi-consumer below (signatures + anti-join), so always persisted
    val keepers = qualKept
      .withColumn("digest", md5(expr("trim(regexp_replace(lower(text), '[^a-z ]', ''))")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"digest").orderBy($"doc_id")))
      .filter($"rn" === 1).drop("digest", "rn").cache()
    val n3 = if (withStats) keepers.count() else -1L

    // 4: MinHash+LSH near-dedup — drop the higher doc_id of each candidate
    // pair whose estimated Jaccard clears the threshold
    val sig = keepers.select($"doc_id",
        TextKernels.minhashUdf($"text").as("sig"))
      .withColumn("bands", TextKernels.bandsUdf($"sig"))
    val buckets = sig.select($"doc_id", $"sig",
      posexplode($"bands").as(Seq("band_idx", "band_hash")))
    val dropIds = buckets.as("a").join(buckets.as("b"),
        $"a.band_idx" === $"b.band_idx" && $"a.band_hash" === $"b.band_hash" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
              $"a.sig".as("sig_a"), $"b.sig".as("sig_b")).distinct()
      .withColumn("est",
        expr("cast(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) as double)") / 16.0)
      .filter($"est" >= estJaccard)
      .select($"d2".as("doc_id")).distinct()
    val curated0 = keepers.join(dropIds, Seq("doc_id"), "left_anti")
      .withColumn("st", TextKernels.tokenStatsUdf($"text"))
      .withColumn("n_tokens", $"st.n_tokens").drop("st")
    if (!withStats) return (curated0, Seq.empty)
    val curated = curated0.cache()
    val n4 = curated.count()
    // curated is materialized above; release the intermediate stage caches
    langKept.unpersist(blocking = false)
    qualKept.unpersist(blocking = false)
    keepers.unpersist(blocking = false)

    (curated, Seq(Stage("input", n0), Stage("lang", n1), Stage("quality", n2),
                  Stage("exact_dedup", n3), Stage("near_dedup", n4)))
  }
}

package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryPack, Tables}

/** Deduplication operators over the `documents` / `embeddings` tables — the
  * training-data-pipeline surface (north-star mandate; the reference has no
  * dedup — SURVEY.md §2.B). Five families:
  *
  *   d1 exact dedup        — hash-groupBy on a content digest
  *   d2 MinHash + LSH      — shingle → 16 minhashes → 4 bands → bucket join
  *   d3 SimHash            — 32-bit frequency-weighted token simhash
  *   d4 n-gram Jaccard     — candidate pairs via shared shingle, exact Jaccard
  *   d5 embedding cosine   — near-dup pairs within k-means quantizer cells
  *   d7 dup clusters       — connected components over exact+near edges
  *   d8 SimHash pairs      — hamming ≤ 3 via 4 × 8-bit pigeonhole blocks
  *   d9 dedup reps         — O(N) per-doc canonical representative
  *   d10 SimHash64 pairs   — d8 at scale: 62-bit sig, 4 × 16-bit blocks
  *
  * Determinism rules (see Tx): all hashes are integer folds identical on both
  * engines; cosine is a serial left-fold of doubles in identical op order, so
  * even its low bits match DuckDB.
  *
  * Scale notes (100 TB):
  *  - d1 shuffles a 16-byte digest + doc_id, never the document body;
  *  - d2/d4 signature/shingle computation is per-row (scan → project, no
  *    shuffle); the only shuffle is the band-bucket / shingle equi-join whose
  *    width is (band_hash, doc_id) — candidate pairs, not full texts. Skewed
  *    buckets (a shingle shared by millions of docs) would be salted or
  *    frequency-capped upstream (drop shingles with df > threshold — the
  *    standard "stop-shingle" cut);
  *  - d3 is pure per-row projection; d8 pairs signatures by pigeonhole
  *    blocking (hamming ≤ k ⇒ some block of k+1 disjoint blocks matches);
  *  - d5 blocks on ENGINE-COMPUTED k-means cells (Quantizer: integer-exact
  *    Lloyd updates, shuffle-free literal-centroid assignment) so the
  *    quadratic rerank is per-block, and per-vector norms are precomputed
  *    before the join.
  */
object Dedup extends QueryPack {
  import Tx._
  import graft.functions.TextKernels
  import TextKernels.{AB, NBands, RowsPerBand}

  /** Hot-key guards (identical on both engines — see d2/d4 notes). A band
    * bucket with B members emits B² candidate pairs and a shingle with
    * document frequency D emits D² join rows; these caps bound both
    * quadratics. Sized well above any organic cluster in the testdata so
    * results are unchanged there; a planted viral key (DedupHotKeySpec)
    * stays subquadratic. */
  val MaxBucket = 128
  val MaxDf = 128

  // ---- DuckDB-side SQL generators (Spark side uses the compiled kernels in
  // graft.functions.TextKernels — identical arithmetic, see its scaladoc) ---

  private[catalog] val shingleHashesSql =
    s"list_transform(${shinglesSql(4)}, s -> ${polyHashSql("s")})"

  /** 16-slot minhash signature from base-hash array `hs` (empty → P). */
  private[catalog] def sigSql(hs: String): String =
    "[" + AB.map { case (a, b) =>
      s"coalesce(list_min(list_transform($hs, x -> ($a * x + $b) % $P)), $P)"
    }.mkString(", ") + "]"

  /** band hashes: fold `rpb` signature slots per band (1-based slots);
    * defaults are the shipped d2 geometry. */
  private[catalog] def bandsSql(sig: String, nb: Int = NBands,
                                rpb: Int = RowsPerBand): String =
    "[" + (0 until nb).map { b =>
      (0 until rpb).foldLeft("0::BIGINT") { (acc, j) =>
        s"(($acc * 1000003 + $sig[${b * rpb + j + 1}]) % $P)"
      }
    }.mkString(", ") + "]"

  /** 32-bit simhash over per-token hashes `hs` (frequency-weighted: all
    * tokens, not distinct). Bit j set iff sum over tokens of ±1 (sign of
    * hash bit j) is > 0. */
  private[catalog] def simhashSql(hs: String): String =
    (0 until 32).map { j =>
      s"(case when list_reduce(list_prepend(0::BIGINT, $hs), " +
        s"(a, x) -> a + ((((x // ${1L << j}) % 2) * 2) - 1)) > 0 then ${1L << j} else 0 end)"
    }.mkString("(", " + ", ")")


  /** second hash stream, DuckDB side (multiplier 37 — TextKernels.polyHash2). */
  private def polyHash2Sql(s: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length($s)+1), i -> unicode($s[i]))), " +
      s"(a, x) -> (a*37 + x) % $P)"

  /** 62-bit simhash, DuckDB side: bits 0..30 from hs1, 31..61 from hs2. */
  private def simhash62Sql(hs1: String, hs2: String): String = {
    def bits(hs: String, base: Int): String = (0 until 31).map { j =>
      s"(case when list_reduce(list_prepend(0::BIGINT, $hs), " +
        s"(a, x) -> a + ((((x // ${1L << j}) % 2) * 2) - 1)) > 0 then ${1L << (base + j)} else 0 end)"
    }.mkString(" + ")
    s"(${bits(hs1, 0)} + ${bits(hs2, 31)})"
  }

  /** The LSH pair table persisted to scratch parquet once per session —
    * the stored near-dup index d2 serves, d9 compacts, and d7 clusters,
    * exactly as a deployment builds pairs once at ingest and lets every
    * downstream consumer read the materialized table (v9's stored-graph
    * reasoning applied to dedup). */
  private[graft] def stagedMinhashPairs(s: SparkSession, dir: String): DataFrame = {
    val path = graft.Scratch.staged(s"mh_pairs#$dir", "mh_pairs") { p =>
      minhashPairs(s, dir).write.mode("overwrite").parquet(p)
    }
    graft.Scratch.parquet(s, path)
  }

  /** d7's (doc_id, cluster) label table staged to scratch parquet once per
    * (JVM, dir) — connected components over exact-digest star edges ∪ LSH
    * near pairs. d7 serves it (plus member counts) and g25 keys its
    * leakage-safe split off it; a deployment materializes cluster ids once
    * at dedup time and every split/audit job reads the table (the
    * stagedMinhashPairs / c10-store reasoning applied one level up). */
  private[graft] def stagedClusterLabels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = graft.Scratch.staged(s"d7_labels#$dir", "d7_labels") { p =>
      val docs = Tables(s, dir).documents
      val digests = docs.select($"doc_id", expr(digestExpr).as("digest"))
      val keepers = digests.groupBy($"digest").agg(min($"doc_id").as("keeper"))
      val exactEdges = digests.join(keepers, "digest")
        .filter($"doc_id" =!= $"keeper")
        .select($"keeper".as("d1"), $"doc_id".as("d2"))
      val edges = exactEdges.union(stagedMinhashPairs(s, dir).select($"d1", $"d2"))
      connectedComponents(edges, docs.select($"doc_id"))._1
        .select($"doc_id", $"cluster")
        .write.mode("overwrite").parquet(p)
    }
    graft.Scratch.parquet(s, path)
  }

  /** d2's pair pipeline, reused by d7's cluster builder:
    * (d1, d2, est_jaccard) with est ≥ 0.5, unordered. */
  private def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sig = Tables(s, dir).documents
      .withColumn("sig", TextKernels.minhashUdf($"text"))
      .withColumn("bands", TextKernels.bandsUdf($"sig"))
      .select($"doc_id", $"sig", $"bands")
    val buckets = sig
      .select($"doc_id", posexplode($"bands").as(Seq("band_idx", "band_hash")))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy($"band_idx", $"band_hash")
    val capped = buckets
      .withColumn("bn", count(lit(1)).over(wB))
      .filter($"bn" <= MaxBucket)
      .drop("bn")
    val pairIds = capped.as("a").join(capped.as("b"),
        $"a.band_idx" === $"b.band_idx" && $"a.band_hash" === $"b.band_hash" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .distinct()
    pairIds
      .join(sig.select($"doc_id".as("d1"), $"sig".as("sig_a")), Seq("d1"))
      .join(sig.select($"doc_id".as("d2"), $"sig".as("sig_b")), Seq("d2"))
      .withColumn("est_jaccard",
        expr("cast(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), b -> b)) as double)") / 16.0)
      .filter($"est_jaccard" >= 0.5)
      .select($"d1", $"d2", $"est_jaccard")
  }

  /** d20's per-geometry candidate pairs: the d2 bucket pipeline with the
    * banding fold inlined as a Spark `aggregate` lambda (codegen; the
    * identical integer fold to bandsSql), bucket cap as groupBy+semi. */
  private def bandCandidates(s: SparkSession, dir: String,
                             nb: Int, rpb: Int): DataFrame = {
    import s.implicits._
    val sig = Tables(s, dir).documents
      .withColumn("sig", TextKernels.minhashUdf($"text"))
      .select($"doc_id", $"sig")
    val bandExpr = s"transform(sequence(0, ${nb - 1}), bi -> " +
      s"aggregate(slice(sig, bi * $rpb + 1, $rpb), cast(0 as bigint), " +
      s"(acc, x) -> (acc * 1000003 + x) % $P))"
    val buckets = sig.select($"doc_id",
      posexplode(expr(bandExpr)).as(Seq("band_idx", "band_hash")))
    val ok = buckets.groupBy($"band_idx", $"band_hash")
      .agg(count(lit(1)).as("bn")).filter($"bn" <= MaxBucket)
      .select($"band_idx", $"band_hash")
    val capped = buckets.join(ok, Seq("band_idx", "band_hash"), "left_semi")
    capped.as("a").join(capped.as("b"),
        $"a.band_idx" === $"b.band_idx" &&
          $"a.band_hash" === $"b.band_hash" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2")).distinct()
  }

  /** d20's oracle candidate chain for one banding geometry. */
  private def bandCandSql(nb: Int, rpb: Int): String = s"""
      WITH sig AS (
        SELECT doc_id, ${sigSql("hs")} AS sig
        FROM (SELECT doc_id, $shingleHashesSql AS hs
              FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1),
      bk AS (
        SELECT doc_id, b.band_idx, bands[b.band_idx + 1] AS band_hash
        FROM (SELECT doc_id, ${bandsSql("sig", nb, rpb)} AS bands FROM sig) t
        CROSS JOIN (SELECT unnest(range(0, $nb)) AS band_idx) b),
      bkc AS (
        SELECT * FROM bk
        QUALIFY COUNT(*) OVER (PARTITION BY band_idx, band_hash)
          <= $MaxBucket)
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bkc a JOIN bkc b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id"""

  /** The same normalized-content digest d1 groups on. */
  private[catalog] val digestExpr = "md5(trim(regexp_replace(lower(text), '[^a-z ]', '')))"

  /** d19's integer quality score — the CLEAN-CHARACTER COUNT: text length
    * penalized by punctuation (×2) and digits, clamped at zero. Pure
    * integer arithmetic (no division, no ratio), so both engines compare
    * identical values; among near-identical copies it keeps the longest /
    * cleanest one. One definition for both engines (they differ only in
    * the regexp flag). */
  private[catalog] def cleanCharsSql(spark: Boolean): String = {
    val g = if (spark) "" else ", 'g'"
    s"""greatest(0, length(text)
       - 2 * (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', ''$g)))
       - (length(text) - length(regexp_replace(text, '[0-9]', ''$g))))"""
  }
  private[graft] val cleanCharsExpr = cleanCharsSql(spark = true)

  /** Connected components by min-label propagation WITH pointer jumping:
    * each round runs (a) one edge relax — every node takes the min of its
    * own and its neighbors' labels (one hash-join + min-aggregate) — and
    * (b) one pointer jump — every node then takes its label's label
    * (labels are node ids, so a self-join; labels only decrease and every
    * label is itself a labeled node, so the lookup never misses). The relax
    * alone needs diameter rounds — O(n) driver-loop Spark jobs on a
    * pathological near-dup CHAIN — while the jump doubles the distance the
    * min has traveled, bounding rounds by O(log n) (pointer-doubling /
    * hash-to-min shape; Dedup7LogRoundsSpec pins ≤ ⌈log₂ n⌉ + 2 on a
    * planted chain). Both steps are monotone min-folds, so the fixpoint is
    * the per-component min label — identical to plain propagation and to
    * the oracle's recursive-CTE reachability min. Labels are
    * localCheckpoint'ed each round to keep lineage flat; convergence is a
    * single COUNT of strictly-decreased labels.
    *
    * Returns (labels(doc_id, cluster), rounds). */
  def connectedComponents(edges: DataFrame, nodes: DataFrame): (DataFrame, Int) = {
    val s = edges.sparkSession
    import s.implicits._
    val sym = edges.union(edges.select($"d2".as("d1"), $"d1".as("d2"))).distinct()
      .localCheckpoint()
    var labels = nodes.select($"doc_id", $"doc_id".as("cluster")).localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      val nb = sym
        .join(labels.select($"doc_id".as("src"), $"cluster".as("c")), $"d1" === $"src")
        .select($"d2".as("doc_id"), $"c".as("cluster"))
      // checkpoint before the self-join: keeps lineage flat AND the jump
      // then joins two scans of one materialized RDD (Catalyst's Union
      // constraint rewrite also chokes on the unioned self-join lineage)
      val relaxed = labels.union(nb)
        .groupBy($"doc_id").agg(min($"cluster").as("cluster"))
        .localCheckpoint()
      val next = relaxed.as("x")
        .join(relaxed.select($"doc_id".as("lid"), $"cluster".as("lc")).as("y"),
          $"x.cluster" === $"lid")
        .select($"x.doc_id".as("doc_id"), least($"x.cluster", $"lc").as("cluster"))
        .localCheckpoint()
      changed = next.select($"doc_id", $"cluster".as("n"))
        .join(labels, "doc_id").filter($"n" < $"cluster").count()
      labels = next
      rounds += 1
    }
    (labels, rounds)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // d1: exact dedup — group by content digest of normalized text, keep the
    // lowest doc_id as canonical (deterministic; dropDuplicates keeps an
    // arbitrary row). At scale only (digest, doc_id) shuffles.
    // d13: EXACT-SUBSTRING dedup (the "deduplicate-text-datasets" operator,
    // Lee et al. 2022): find every 32-char window that occurs ≥2 times
    // ANYWHERE in the corpus, then merge each doc's duplicated windows into
    // contiguous spans and report per-doc duplicated-character mass — the
    // signal used to cut boilerplate/memorization-prone spans before
    // training. Plan: one generator pass emits (hash, doc, pos) per window
    // (row count = corpus chars — the honest cost the suffix-array
    // formulation also pays), a count-≥2 aggregate finds repeated hashes,
    // a hash join marks positions, and span merging is gaps-and-islands
    // with per-doc windows (partitioned by doc_id, never global).
    "d13_substr_dedup" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documents
        .select($"doc_id", lower($"text").as("t"))
      val grams = docs.filter(length($"t") >= 32)
        .select($"doc_id", explode(expr(
          "transform(sequence(1, length(t) - 31), " +
            "i -> struct(i as i, substring(t, i, 32) as g))")).as("w"))
        .select($"doc_id", $"w.i".as("i"), md5($"w.g").as("h"))
      val dup = grams.groupBy($"h").agg(count(lit(1)).as("c"))
        .filter($"c" >= 2).select($"h")
      val pos = grams.join(dup, Seq("h")).select($"doc_id", $"i")
      val wPrev = Window.partitionBy($"doc_id").orderBy($"i")
        .rowsBetween(Window.unboundedPreceding, -1)
      val spans = pos
        .withColumn("ns",
          when($"i" > coalesce(max($"i" + 32).over(wPrev), lit(-1L)), 1L)
            .otherwise(0L))
        .withColumn("sid", sum($"ns").over(
          Window.partitionBy($"doc_id").orderBy($"i")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"doc_id", $"sid")
        .agg(min($"i").as("s"), (max($"i") + 32).as("e"))
      val perDoc = spans.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_spans"), sum($"e" - $"s").as("dup_chars"))
      val nGrams = pos.groupBy($"doc_id").agg(count(lit(1)).as("n_dup_grams"))
      docs.select($"doc_id")
        .join(nGrams, Seq("doc_id"), "left")
        .join(perDoc, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_dup_grams", lit(0L)).as("n_dup_grams"),
          coalesce($"n_spans", lit(0L)).as("n_spans"),
          coalesce($"dup_chars", lit(0L)).as("dup_chars"))
        .orderBy($"doc_id")
    },
    "d1_exact_dedup" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .withColumn("digest", md5(expr("trim(regexp_replace(lower(text), '[^a-z ]', ''))")))
        .groupBy($"digest")
        .agg(min($"doc_id").as("keeper_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy($"keeper_doc_id")
    },
    // d11: INCREMENTAL exact dedup — the "only index new data" shape a
    // continuously-crawled corpus needs: documents already in the index
    // (stand-in: doc_id % 10 == 0) contribute digests only; the incoming
    // batch (the rest) is (a) anti-joined against the index so previously
    // seen content never re-enters, then (b) deduped within itself by
    // keeper = min doc_id. At 100 TB the index side is a digest-only
    // projection (16 bytes/doc) and both the anti-join and the group-by
    // shuffle on digest alone — the batch, not the corpus, dictates cost.
    "d11_incremental_dedup" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documents
        .select($"doc_id", md5(expr("trim(regexp_replace(lower(text), '[^a-z ]', ''))")).as("digest"))
      val indexed = docs.filter(pmod($"doc_id", lit(10)) === 0)
        .select($"digest").distinct()
      docs.filter(pmod($"doc_id", lit(10)) =!= 0)
        .join(indexed, Seq("digest"), "left_anti")
        .groupBy($"digest")
        .agg(min($"doc_id").as("keeper_doc_id"), count(lit(1)).as("n_in_batch"))
        .orderBy($"keeper_doc_id")
    },
    // d12: INCREMENTAL near-dup — d11's shape for NEAR duplicates: the
    // incoming batch's band buckets probe the index's persisted buckets
    // (index docs: doc_id % 10 == 0), so only batch×index candidates are
    // generated — never index×index (that work was done when the index was
    // built; cf. v2's bucketBy deployment shape which makes the probe
    // exchange-free). Same MaxBucket viral-bucket cap and ≥ 0.5 estimated-
    // Jaccard confirm as d2. Output: one row per flagged batch doc.
    "d12_incremental_lsh" -> { (s, dir) =>
      import s.implicits._
      // round-14: spread (the minhash kernel serialized on the single-split
      // local scan) + persist (sig feeds the band explode AND both
      // signature re-joins — the kernel ran three times; rows are id +
      // 16 ints, the c3 shape)
      val sig = Tables(s, dir).documentsSpread
        .withColumn("sig", TextKernels.minhashUdf($"text"))
        .withColumn("bands", TextKernels.bandsUdf($"sig"))
        .select($"doc_id", $"sig", $"bands")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val buckets = sig
        .select($"doc_id", posexplode($"bands").as(Seq("band_idx", "band_hash")))
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy($"band_idx", $"band_hash")
      val capped = buckets
        .withColumn("bn", count(lit(1)).over(wB))
        .filter($"bn" <= MaxBucket)
        .drop("bn")
      val idx = capped.filter(pmod($"doc_id", lit(10)) === 0)
        .select($"band_idx", $"band_hash", $"doc_id".as("idx_id"))
      val bat = capped.filter(pmod($"doc_id", lit(10)) =!= 0)
        .select($"band_idx", $"band_hash", $"doc_id".as("new_id"))
      bat.join(idx, Seq("band_idx", "band_hash"))
        .select($"new_id", $"idx_id").distinct()
        .join(sig.select($"doc_id".as("new_id"), $"sig".as("sig_a")), Seq("new_id"))
        .join(sig.select($"doc_id".as("idx_id"), $"sig".as("sig_b")), Seq("idx_id"))
        .withColumn("est_jaccard",
          expr("cast(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), b -> b)) as double)") / 16.0)
        .filter($"est_jaccard" >= 0.5)
        .groupBy($"new_id")
        .agg(count(lit(1)).as("n_index_matches"), min($"idx_id").as("first_match"))
        .orderBy($"new_id")
    },
    // d2: MinHash+LSH near-dup candidates — 16 minhashes, 4 bands × 4 rows;
    // pairs sharing any band bucket, with estimated Jaccard = matching
    // signature slots / 16 (kept when est ≥ 0.5). Two scale guards:
    //  - HOT-BUCKET CAP: a band bucket shared by B docs emits B² pairs; a
    //    viral bucket (boilerplate text) is quadratic. Buckets over
    //    `MaxBucket` members are dropped from candidate generation (their
    //    pairs can still surface via their other 3 bands) — the standard
    //    LSH stop-bucket cut. Mirrored in the oracle via QUALIFY.
    //  - ID-ONLY DEDUP: the pair distinct() shuffles only (d1, d2); the
    //    16-slot signatures rejoin AFTER dedup, so the widest shuffle
    //    carries ids, not signature payloads.
    "d2_minhash_lsh" -> { (s, dir) =>
      stagedMinhashPairs(s, dir).orderBy("d1", "d2")
    },
    // d14: LSH INDEX QUALITY EVALUATION — precision/recall of the d2
    // MinHash-LSH candidate set against d4's exact n-gram Jaccard truth
    // (pairs with true J ≥ 0.5), composed from both entries AS SHIPPED
    // (v11's self-composition discipline applied to dedup): the gate
    // breaks if the index, the exact kernel, or their agreement drifts.
    // The report is the number a curation team watches when tuning
    // bands/rows or the est threshold. Scale shape: two id-pair joins +
    // three 1-row aggregates crossed together — the metrics are a 1-row
    // report however big the corpus; at 100 TB the truth side runs on a
    // sampled stratum (d4's cap already bounds it).
    "d14_lsh_eval" -> { (s, dir) =>
      import s.implicits._
      // persists: truth and candidates each feed the hit join AND their
      // own count (d16/g17/d20's multi-consumer precedent)
      val truth = queries("d4_ngram_jaccard")(s, dir).select($"d1", $"d2")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = queries("d2_minhash_lsh")(s, dir).select($"d1", $"d2")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      truth.join(cand, Seq("d1", "d2")).agg(count(lit(1)).as("n_hit"))
        .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .select($"n_truth", $"n_cand", $"n_hit",
          expr("n_hit * 1000 div greatest(n_cand, 1)").as("precision_pm"),
          expr("n_hit * 1000 div greatest(n_truth, 1)").as("recall_pm"))
    },
    // d20: LSH BAND SWEEP — the dedup analog of v22's probe sweep and
    // v26's hop sweep (the measured-dial trilogy): the SAME 16-slot
    // signature banded three ways — 2×8 (strict: both docs must agree on
    // 8 consecutive slots; high precision, low recall), 4×4 (shipped),
    // 8×2 (loose: any 2-slot agreement buckets; high recall, quadratic-
    // leaning candidate volume held down by the MaxBucket cap). Measured
    // candidate precision/recall vs d4's exact truth is the curve a
    // curation team reads before fixing b×r — the S-curve threshold
    // s ≈ (1/b)^(1/r) made empirical. Band hashes are the same integer
    // fold on both engines (a Spark `aggregate` lambda — codegen, no
    // UDF); the bucket cap is the hot-key-safe groupBy+semi shape.
    "d20_band_sweep" -> { (s, dir) =>
      import s.implicits._
      // persists: the exact-Jaccard truth set feeds all 3 sweep points and
      // each config's candidate set feeds both its recall join and its
      // count — without the caches the d4 pair join re-runs 3× and each
      // band chain 2× (d16/g17's precedent)
      val truth = queries("d4_ngram_jaccard")(s, dir).select($"d1", $"d2")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Seq((2, 8), (4, 4), (8, 2)).map { case (nb, rpb) =>
        val cand = bandCandidates(s, dir, nb, rpb)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        truth.join(cand.withColumn("hit", lit(1L)), Seq("d1", "d2"), "left")
          .agg(count(lit(1)).as("n_truth"),
               sum(coalesce($"hit", lit(0L))).as("n_hit"))
          .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
          .select(lit(nb.toLong).as("n_bands"),
                  lit(rpb.toLong).as("rows_per_band"),
                  $"n_truth", $"n_cand", $"n_hit",
                  expr("n_hit * 1000 div greatest(n_truth, 1)").as("recall_pm"),
                  expr("n_hit * 1000 div greatest(n_cand, 1)").as("precision_pm"))
      }.reduce(_ unionByName _).orderBy($"n_bands")
    },
    // d21: FUZZY JOIN (record linkage) — the d-family's pair detectors
    // (d2/d4/d15) find duplicates WITHIN one corpus; the integration
    // question is CROSS-CATALOG: every record of a dirty feed (here:
    // middle slices of documents, the partial-text case ETL actually
    // sees) is ASSIGNED its best match in the clean catalog — an INNER
    // fuzzy join with exactly one winner per probe, not a pair list
    // (probes whose shingles are all df-capped or match no candidate
    // emit nothing; a deployment wanting them surfaced left-joins the
    // probe set back — round-9 advice pinned this wording to the code).
    // Blocking is d4's machinery verbatim (hashed 4-token
    // shingles, groupBy df-cap with anti join — a viral shingle never
    // concentrates); scoring is CONTAINMENT (|∩| / |probe|, integer bp)
    // because a slice's shingles are a subset of its origin's — plain
    // Jaccard would punish the length mismatch the operator exists to
    // tolerate. Winner = one row_number over the probe-keyed window
    // (data-scale partitioned). Scale shape (100 TB): probes explode
    // only |batch| × shingles rows against the df-capped catalog index;
    // candidates concentrate on shared informative shingles, and the
    // per-probe window is bounded by that candidate count. Probes with
    // <3 shingles carry no signal and are dropped (documented contract).
    "d21_fuzzy_join" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documentsSpread
      val a0 = docs.select($"doc_id".as("a_id"),
          array_distinct(TextKernels.shingleHashesUdf($"text")).as("hs"))
        .select($"a_id", size($"hs").cast("long").as("n_a"),
                explode($"hs").as("h"))
        // consumed by the df cap AND the capped join — unpersisted, the
        // corpus-side shingle kernel ran twice (round-14, d16 discipline)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hot = a0.groupBy($"h").agg(count(lit(1)).as("df"))
        .filter($"df" > MaxDf).select($"h")
      val ea = a0.join(hot, Seq("h"), "left_anti")
      val eb = docs.filter($"doc_id" % 7 === 3)
        .select(($"doc_id" + 1000000000L).as("b_id"),
          array_distinct(
            TextKernels.shingleHashesUdf(substring($"text", 21, 160))).as("hs"))
        .filter(size($"hs") >= 3)
        .select($"b_id", size($"hs").cast("long").as("n_b"),
                explode($"hs").as("h"))
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy($"b_id")
        .orderBy(expr("(n_inter * 10000) div n_b").desc, $"a_id")
      eb.join(ea, Seq("h"))
        .groupBy($"b_id", $"a_id", $"n_b", $"n_a")
        .agg(count(lit(1)).as("n_inter"))
        .withColumn("rk", row_number().over(wB))
        .filter($"rk" === 1)
        .select($"b_id", $"a_id", $"n_inter",
                expr("(n_inter * 10000) div n_b").as("cont_bp"),
                ($"a_id" === $"b_id" - 1000000000L).as("is_origin"))
        .orderBy($"b_id")
    },
    // d22: LINKAGE BLOCKING-RECALL EVAL — the self-evaluation convention
    // (v11 scores v2, d14 scores d2, c11 scores c6) applied to d21: the
    // only approximations in the blocked fuzzy join are the MaxDf
    // stop-shingle cut and the <3-shingle probe drop, so the EXACT
    // assignment (same containment argmax, NO df cap) is recomputed for
    // a bounded eval sample (probes with doc_id < 100 — v1's eval-set
    // convention; exact truth stays |eval|-bounded at any corpus size)
    // and d21's winners are scored against it: agreement rate plus both
    // sides' origin-recovery counts, the number a linkage deployment
    // reads before trusting the cap.
    "d22_linkage_eval" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documentsSpread
      val ea = docs.select($"doc_id".as("a_id"),
          array_distinct(TextKernels.shingleHashesUdf($"text")).as("hs"))
        .select($"a_id", explode($"hs").as("h"))
      val eb = docs.filter($"doc_id" % 7 === 3 && $"doc_id" < 100)
        .select(($"doc_id" + 1000000000L).as("b_id"),
          array_distinct(
            TextKernels.shingleHashesUdf(substring($"text", 21, 160))).as("hs"))
        .filter(size($"hs") >= 3)
        .select($"b_id", size($"hs").cast("long").as("n_b"),
                explode($"hs").as("h"))
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy($"b_id")
        .orderBy(expr("(n_inter * 10000) div n_b").desc, $"a_id")
      val exact = eb.join(ea, Seq("h"))
        .groupBy($"b_id", $"a_id", $"n_b").agg(count(lit(1)).as("n_inter"))
        .withColumn("rk", row_number().over(wB)).filter($"rk" === 1)
        .select($"b_id", $"a_id".as("exact_a"))
      val blocked = queries("d21_fuzzy_join")(s, dir)
        .filter($"b_id" - 1000000000L < 100)
        .select($"b_id", $"a_id".as("blocked_a"))
      exact.join(blocked, Seq("b_id"), "left")
        .agg(count(lit(1)).as("n_eval"),
             sum(when($"blocked_a" <=> $"exact_a", 1L).otherwise(0L))
               .as("n_agree"),
             sum(when($"exact_a" === $"b_id" - 1000000000L, 1L).otherwise(0L))
               .as("n_origin_exact"),
             sum(when($"blocked_a" === $"b_id" - 1000000000L, 1L).otherwise(0L))
               .as("n_origin_blocked"))
        .withColumn("agree_bp",
          expr("n_agree * 10000 div greatest(n_eval, 1)"))
    },
    // d3: per-doc 32-bit simhash signature (frequency-weighted tokens).
    // Near-dup pairing at scale joins on 16-bit signature halves.
    "d3_simhash" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select($"doc_id", TextKernels.simhashUdf($"text").as("simhash"))
        .orderBy($"doc_id")
    },
    // d4: exact n-gram Jaccard near-dup pairs over HASHED distinct 4-token
    // shingles. One exploded self-join computes |∩| directly as the per-pair
    // match count (shingles are distinct per doc), so no pair ever re-joins
    // its full shingle array: |∪| = n1 + n2 − |∩|. The join key is an 8-byte
    // hash, not the shingle string — at 100 TB that is the difference
    // between shuffling text and shuffling longs.
    // STOP-SHINGLE CAP: a shingle with document frequency D contributes D²
    // join rows — one viral boilerplate shingle is quadratic. Shingles with
    // df > MaxDf are cut on BOTH engines (QUALIFY in the oracle); their
    // pairs' |∩| then counts only informative shingles, while |∪| keeps the
    // full per-doc counts (slight underestimate, consistent across engines).
    // The df count is a map-side-combining groupBy + anti join against the
    // (tiny) hot-shingle list — d15/d16's shape — NOT a window over h: a
    // window ships every exploded row of a viral shingle to one partition
    // before discarding it; the groupBy reduces the viral key to one row
    // and AQE broadcasts the hot list (DedupHotKeySpec pins the plan).
    "d4_ngram_jaccard" -> { (s, dir) =>
      import s.implicits._
      // round-14: spread — the shingle kernel serialized on the
      // single-split local scan
      val sh = Tables(s, dir).documentsSpread
        .select($"doc_id", TextKernels.shingleHashesUdf($"text").as("hs"))
        .select($"doc_id", size($"hs").cast("long").as("n_sh"), $"hs")
      // persists: ex0 feeds the df count and the capped set; ex feeds BOTH
      // sides of the self-join — without the caches the shingle-hash UDF
      // pass runs up to 4× (d16/g17's multi-consumer precedent)
      val ex0 = sh.select($"doc_id", $"n_sh", explode($"hs").as("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hot = ex0.groupBy($"h").agg(count(lit(1)).as("df"))
        .filter($"df" > MaxDf).select($"h")
      val ex = ex0.join(hot, Seq("h"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ex.as("a").join(ex.as("b"), $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
                 $"a.n_sh".as("n1"), $"b.n_sh".as("n2"))
        .agg(count(lit(1)).as("n_inter"))
        .withColumn("n_union", $"n1" + $"n2" - $"n_inter")
        .withColumn("jaccard", $"n_inter".cast("double") / $"n_union")
        .filter($"jaccard" >= 0.5)
        .select($"d1", $"d2", $"n_inter", $"n_union", $"jaccard")
        .orderBy($"d1", $"d2")
    },
    // d15: EXACT threshold set-similarity join — the PPJoin-family
    // complement to d2/d4: NO LSH miss (d2 is probabilistic) and NO
    // df-cap drop (d4 cuts shingles with df > MaxDf), so the output is
    // EVERY pair with true set-Jaccard ≥ 0.5 — the audit primitive you
    // reach for when d14 reads LSH recall low. The quadratic blowup is
    // killed by PREFIX FILTERING instead of capping: order each doc's
    // shingle set by (df ASC, h) — one GLOBAL rarest-first order — and
    // join docs only on their first ⌊n/2⌋+1 tokens in that order. Any
    // pair at J ≥ t must overlap within both prefixes (miss every prefix
    // token of the other and too few tokens remain to reach t), so the
    // candidate set provably contains all qualifying pairs; PPJoin's
    // length filter (2·min(n₁,n₂) ≥ max — necessary for J ≥ ½) prunes
    // further, then FULL sets verify exactly. Scale shape (100 TB):
    // candidate pairs concentrate on RARE tokens (frequent tokens fall
    // past the prefix boundary for large docs), cost ≈ Σ_h df_pfx(h)² for
    // prefix-resident h only — the exact-guarantee analog of d2's banded
    // buckets; df table + per-doc rank are one aggregate + one doc-keyed
    // window; verification touches only candidates.
    "d15_ppjoin_exact" -> { (s, dir) =>
      import s.implicits._
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"df", $"h")
      // round-14: spread (same rationale as d4)
      val sh = Tables(s, dir).documentsSpread
        .select($"doc_id",
          array_distinct(TextKernels.shingleHashesUdf($"text")).as("hs"))
        .select($"doc_id", size($"hs").cast("long").as("n_sh"), $"hs")
      // persists: ex feeds the df count, the prefix build, and both
      // verify-side joins; prefix feeds both sides of the candidate
      // self-join (d16/d4's multi-consumer precedent)
      val ex = sh.select($"doc_id", $"n_sh", explode($"hs").as("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dft = ex.groupBy($"h").agg(count(lit(1)).as("df"))
      val prefix = ex.join(dft, Seq("h"))
        .withColumn("rk", row_number().over(wDoc))
        .filter($"rk" <= expr("n_sh div 2 + 1"))
        .select($"doc_id", $"n_sh", $"h")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = prefix.as("a").join(prefix.as("b"),
          $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id" &&
            $"a.n_sh" <= $"b.n_sh" * 2 && $"b.n_sh" <= $"a.n_sh" * 2)
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .distinct()
      cand
        .join(ex.select($"doc_id".as("d1"), $"n_sh".as("n1"), $"h"), Seq("d1"))
        .join(ex.select($"doc_id".as("d2"), $"n_sh".as("n2"), $"h"), Seq("d2", "h"))
        .groupBy($"d1", $"d2", $"n1", $"n2")
        .agg(count(lit(1)).as("n_inter"))
        .withColumn("n_union", $"n1" + $"n2" - $"n_inter")
        .withColumn("jaccard", $"n_inter".cast("double") / $"n_union")
        .filter($"jaccard" >= 0.5)
        .select($"d1", $"d2", $"n_inter", $"n_union", $"jaccard")
        .orderBy($"d1", $"d2")
    },
    // d16: EXACT COSINE THRESHOLD JOIN — d15's prefix-filter skeleton
    // generalized from Jaccard-on-sets to cosine-on-tf-vectors, completing
    // the exact-guarantee family on the weighted side. Features are
    // 4-gram SHINGLE occurrence counts, not unigrams — a scale finding,
    // not a convenience: prefix filtering is selective only when feature
    // document-frequencies are small relative to the corpus, and unigram
    // vocabularies violate that on ANY natural corpus (stopwords appear
    // in nearly every document with high tf, so they stay inside the 19%
    // suffix mass the t=0.9 prefix admits — measured here: the unigram
    // form emitted 11.9M candidates for 1,777 true pairs at sf0.1, 99.8 s;
    // the shingle form 256 candidates for 255 true pairs, ~2 s). Shingle
    // df is corpus-sparse, which is exactly the regime the prefix theorem
    // needs. Prefix theorem (Bayardo all-pairs, norm form): order features
    // globally by (df asc, h); for the FIRST common feature g of any pair,
    // common ⊆ suffix(g) on both sides, so by Cauchy-Schwarz
    // cos ≤ √(suffix2_x(g)·suffix2_y(g)/(n2_x·n2_y)); cos ≥ t therefore
    // forces suffix2(g) ≥ t²·n2 on BOTH sides — i.e. g lies in both docs'
    // prefixes {j : suffix2(j) ≥ t²·n2}. The candidate equi-join on
    // prefix features reaches every qualifying pair; verification is the
    // INTEGER predicate 100·dot² ≥ 81·n2₁·n2₂ (t = 0.9 as exact 81/100 —
    // no floating point until the reported cos, which is two correctly-
    // rounded IEEE ops and so engine-identical). The honest d15 bound
    // still applies: on a corpus whose TRUE qualifying pair count is
    // quadratic, exactness cannot undercut the answer size (escape hatch
    // d2/d5, audited by d14). CosineExactSpec proves recall 1.0 vs
    // plain-Scala brute force over the same shingle-tf vectors.
    "d16_cosine_threshold_join" -> { (s, dir) =>
      import s.implicits._
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"df", $"h")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      // persisted: the shingle-explode + polyhash pass feeds FOUR
      // consumers (norms, df counts, both prefix sides) — without the
      // cache the regex tokenize + hash kernel re-runs per consumer (the
      // Quantizer's eq persist precedent; ContextCleaner reclaims it once
      // the returned plan is released)
      // round-14: the tokenize→shingle→hash pass runs as the compiled
      // kernel (shingleHashesAllUdf) — the expr() form interpreted a
      // per-character aggregate() fold PER SHINGLE (d16's hot loop, ~20
      // task-seconds at sf0.1); same multiset of hashes, same tf counts
      // (TextSpec pins kernel == SQL; the d16 oracle SQL is unchanged)
      val tf = Tables(s, dir).documentsSpread
        .select($"doc_id",
          explode(TextKernels.shingleHashesAllUdf($"text")).as("h"))
        .groupBy($"doc_id", $"h").agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ex = tf.join(
        tf.groupBy($"doc_id").agg(sum($"tf" * $"tf").as("n2")), Seq("doc_id"))
      val dft = tf.groupBy($"h").agg(count(lit(1)).as("df"))
      val prefix = ex.join(dft, Seq("h"))
        .withColumn("pre2", coalesce(sum($"tf" * $"tf").over(wDoc), lit(0L)))
        .filter(($"n2" - $"pre2") * 100 >= $"n2" * 81)
        .select($"doc_id", $"h")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cand = prefix.as("a").join(prefix.as("b"),
          $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .distinct()
      cand
        .join(ex.select($"doc_id".as("d1"), $"h", $"tf".as("tf1"), $"n2".as("n2_1")),
              Seq("d1"))
        .join(ex.select($"doc_id".as("d2"), $"h", $"tf".as("tf2"), $"n2".as("n2_2")),
              Seq("d2", "h"))
        .groupBy($"d1", $"d2", $"n2_1", $"n2_2")
        .agg(sum($"tf1" * $"tf2").as("dot"))
        .filter($"dot" * $"dot" * 100 >= $"n2_1" * $"n2_2" * 81)
        .withColumn("cos",
          $"dot".cast("double") / sqrt(($"n2_1" * $"n2_2").cast("double")))
        .select($"d1", $"d2", $"dot", $"n2_1", $"n2_2", $"cos")
        .orderBy($"d1", $"d2")
    },
    // d5: embedding-cosine near-dup pairs within coarse blocks. Blocking
    // cells come from the ENGINE-COMPUTED spherical k-means quantizer
    // (Quantizer: integer-exact Lloyd updates, literal-centroid assignment
    // — no shuffle in the assign pass). Norms precomputed before the join.
    "d5_embedding_neardup" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddingsSpread
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .select($"vec_id", $"v", $"norm2")
      val cents = Quantizer.centroidsFor(e, dir, iters = 2, dim = 64)
      val cells = Quantizer.assign(e, cents)
      cells.as("a").join(cells.as("b"),
          $"a.cell" === $"b.cell" && $"a.vec_id" < $"b.vec_id")
        .withColumn("cos",
          graft.functions.VectorExprs.cosine($"a.v", $"b.v", $"a.norm2", $"b.norm2"))
        .filter($"cos" >= 0.4)
        .select($"a.vec_id".as("v1"), $"b.vec_id".as("v2"),
                $"a.cell".cast("long").as("cell"), $"cos")
        .orderBy($"v1", $"v2")
    },
    // d17: SEMANTIC DEDUP GATE (the SemDeDup shape, Abbas et al. 2023) —
    // d5 reports embedding near-dup PAIRS; d17 turns them into the
    // keep/drop DECISION a curation run executes: within each quantizer
    // cell a vector is dropped iff some SMALLER-id vector of the same cell
    // sits at cos ≥ 0.4 (min-id greedy keeper — deterministic, order-free,
    // and chain-free: one pass over the d5 candidate pairs, no transitive
    // closure). Output is the per-vector verdict + cell, the joinable gate
    // the corpus-side filter applies. Scale shape: identical to d5
    // (cell-blocked quadratic, norms precomputed before the join); the
    // verdict itself adds one id-only distinct + one left join — no
    // vectors cross either shuffle.
    "d17_semantic_dedup" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddingsSpread
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .select($"vec_id", $"v", $"norm2")
      val cents = Quantizer.centroidsFor(e, dir, iters = 2, dim = 64)
      val cells = Quantizer.assign(e, cents)
      val drops = cells.as("a").join(cells.as("b"),
          $"a.cell" === $"b.cell" && $"a.vec_id" < $"b.vec_id")
        .withColumn("cos",
          graft.functions.VectorExprs.cosine($"a.v", $"b.v", $"a.norm2", $"b.norm2"))
        .filter($"cos" >= 0.4)
        .select($"b.vec_id".as("vec_id")).distinct()
        .withColumn("is_dup", lit(true))
      cells.join(drops, Seq("vec_id"), "left")
        .select($"vec_id", $"cell".cast("long").as("cell"),
                (!coalesce($"is_dup", lit(false))).as("kept"))
        .orderBy($"vec_id")
    },
    // d18: INCREMENTAL SEMANTIC-DEDUP GATE — d17's verdict for the nightly
    // increment (the d11/d12 pattern on the embedding side). The index
    // partition (vec_id % 10 ≠ 7) carries its own d17 keeper set; the new
    // batch (vec_id % 10 == 7) assigns to the INDEX-trained centroids
    // (load-time model state, no retrain — e24's convention) and a batch
    // vector is dropped iff an index KEEPER in its cell sits at cos ≥ 0.4
    // (the index's non-keepers were already discarded — they no longer
    // exist to compare against), or a smaller-id batch cell-mate does
    // (batch-internal min-id greedy, d17's rule). Per-batch work = batch ×
    // (in-cell keepers ∪ batch cell-mates): index×index pairs never
    // re-score, so the nightly cost tracks the BATCH, not the corpus.
    "d18_incremental_semantic" -> { (s, dir) =>
      import s.implicits._
      val all = Tables(s, dir).embeddingsSpread
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .select($"vec_id", $"v", $"norm2")
      val idxE = all.filter(pmod($"vec_id", lit(10)) =!= 7)
      val batch = all.filter(pmod($"vec_id", lit(10)) === 7)
      val cents = Quantizer.centroidsOnIndexFor(idxE, dir, "idx7", iters = 2, dim = 64)
      val idxCells = Quantizer.assign(idxE, cents)
      val idxDrops = idxCells.as("a").join(idxCells.as("b"),
          $"a.cell" === $"b.cell" && $"a.vec_id" < $"b.vec_id")
        .withColumn("cos",
          graft.functions.VectorExprs.cosine($"a.v", $"b.v", $"a.norm2", $"b.norm2"))
        .filter($"cos" >= 0.4)
        .select($"b.vec_id".as("vec_id")).distinct()
      val keepers = idxCells.join(idxDrops, Seq("vec_id"), "left_anti")
      val bCells = Quantizer.assign(batch, cents)
      val dropByIdx = bCells.as("b")
        .join(keepers.select($"cell", $"v".as("kv"), $"norm2".as("kn")), Seq("cell"))
        .withColumn("cos",
          graft.functions.VectorExprs.cosine($"kv", $"b.v", $"kn", $"b.norm2"))
        .filter($"cos" >= 0.4)
        .select($"b.vec_id".as("vec_id"))
      val dropByBatch = bCells.as("a").join(bCells.as("b"),
          $"a.cell" === $"b.cell" && $"a.vec_id" < $"b.vec_id")
        .withColumn("cos",
          graft.functions.VectorExprs.cosine($"a.v", $"b.v", $"a.norm2", $"b.norm2"))
        .filter($"cos" >= 0.4)
        .select($"b.vec_id".as("vec_id"))
      val drops = dropByIdx.union(dropByBatch).distinct()
        .withColumn("is_dup", lit(true))
      bCells.join(drops, Seq("vec_id"), "left")
        .select($"vec_id", $"cell".cast("long").as("cell"),
                (!coalesce($"is_dup", lit(false))).as("kept"))
        .orderBy($"vec_id")
    },
    // d8: SimHash near-dup PAIRS — hamming ≤ 3 over the d3 signature.
    // Pigeonhole blocking: 3 differing bits across 4 disjoint 8-bit blocks
    // leave at least one block identical, so the candidate equi-join on
    // (block_idx, block_val) reaches every qualifying pair; the exact
    // popcount(xor) then filters. Same hot-block cap as d2/d4 (a block
    // value shared by B docs emits B² candidates; viral values are cut on
    // both engines via QUALIFY). The candidate distinct carries only
    // (id, id, sig, sig) — two longs beyond the ids, unlike d2's 16-slot
    // signatures, so no post-dedup rejoin is needed. At 100 TB the
    // signature would widen to 64 bits (4 × 16-bit blocks) so block values
    // stay selective; the plan shape is unchanged.
    "d8_simhash_pairs" -> { (s, dir) =>
      import s.implicits._
      val sh = Tables(s, dir).documents
        .select($"doc_id", TextKernels.simhashUdf($"text").as("simhash"))
      val blocks = sh.select($"doc_id", $"simhash",
        posexplode(array(
          expr("simhash % 256"),
          expr("(simhash div 256) % 256"),
          expr("(simhash div 65536) % 256"),
          expr("(simhash div 16777216) % 256"))).as(Seq("block_idx", "block_val")))
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy($"block_idx", $"block_val")
      val capped = blocks
        .withColumn("bn", count(lit(1)).over(wB))
        .filter($"bn" <= MaxBucket)
        .drop("bn")
      capped.as("a").join(capped.as("b"),
          $"a.block_idx" === $"b.block_idx" && $"a.block_val" === $"b.block_val" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
                $"a.simhash".as("s1"), $"b.simhash".as("s2"))
        .distinct()
        .withColumn("hamming", expr("cast(bit_count(s1 ^ s2) as bigint)"))
        .filter($"hamming" <= 3)
        .select($"d1", $"d2", $"hamming")
        .orderBy($"d1", $"d2")
    },
    // d10: d8's SCALE variant — the 62-bit signature (two independent hash
    // streams) splits into 4 blocks of ~16 bits, so block values stay
    // selective at corpus sizes where d8's 8-bit blocks saturate
    // (2^16 values per block vs 2^8; the pigeonhole guarantee for
    // hamming ≤ 3 is identical). Same hot-block cap.
    "d10_simhash64_pairs" -> { (s, dir) =>
      import s.implicits._
      val sh = Tables(s, dir).documents
        .select($"doc_id", TextKernels.simhash62Udf($"text").as("simhash"))
      val blocks = sh.select($"doc_id", $"simhash",
        posexplode(array(
          expr("simhash % 65536"),
          expr("(simhash div 65536) % 65536"),
          expr("(simhash div 4294967296) % 65536"),
          expr("(simhash div 281474976710656) % 65536"))).as(Seq("block_idx", "block_val")))
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy($"block_idx", $"block_val")
      val capped = blocks
        .withColumn("bn", count(lit(1)).over(wB))
        .filter($"bn" <= MaxBucket)
        .drop("bn")
      capped.as("a").join(capped.as("b"),
          $"a.block_idx" === $"b.block_idx" && $"a.block_val" === $"b.block_val" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
                $"a.simhash".as("s1"), $"b.simhash".as("s2"))
        .distinct()
        .withColumn("hamming", expr("cast(bit_count(s1 ^ s2) as bigint)"))
        .filter($"hamming" <= 3)
        .select($"d1", $"d2", $"hamming")
        .orderBy($"d1", $"d2")
    },
    // d9: PAIR-OUTPUT COMPACTION — the deployment shape for near-dedup at
    // scale. d2/d4/d8 emit O(pairs) rows, quadratic in duplicate-group
    // size; what a 100 TB curation job actually materializes is one row
    // per document: its canonical representative rep = min(doc_id) over
    // itself and its direct near-duplicates (one-hop, not transitive —
    // d7 is the transitive version). Output is O(N) regardless of how
    // viral the duplicate groups are.
    "d9_dedup_reps" -> { (s, dir) =>
      import s.implicits._
      val pairs = stagedMinhashPairs(s, dir).select($"d1", $"d2")
      val sym = pairs.union(pairs.select($"d2".as("d1"), $"d1".as("d2")))
      val minNb = sym.groupBy($"d1".as("doc_id")).agg(min($"d2").as("min_nb"))
      Tables(s, dir).documents.select($"doc_id")
        .join(minNb, Seq("doc_id"), "left")
        .select($"doc_id",
                least($"doc_id", coalesce($"min_nb", $"doc_id")).as("rep"))
        .withColumn("is_canonical", ($"rep" === $"doc_id").cast("boolean"))
        .orderBy($"doc_id")
    },
    // d19: QUALITY-AWARE KEEPER SELECTION — d9's one-row-per-doc rep
    // compaction with the keeper practitioners actually want: among a doc
    // and its direct near-dups, keep the HIGHEST-QUALITY copy — scored by
    // CLEAN-CHARACTER COUNT (length penalized by punctuation and digits,
    // pure integer arithmetic, cleanCharsSql), so the longest/cleanest
    // copy wins, tiebreak doc_id asc. Same O(N) output and pair machinery
    // as d9 — only the argmax changed; the keeper window partitions by
    // doc (data-scale partitioned). QualityKeeperSpec pins that this
    // genuinely diverges from d9's min-id rule on the fixture.
    "d19_quality_keeper" -> { (s, dir) =>
      import s.implicits._
      val pairs = stagedMinhashPairs(s, dir).select($"d1", $"d2")
      val sym = pairs.union(pairs.select($"d2".as("d1"), $"d1".as("d2")))
      val q = Tables(s, dir).documents
        .select($"doc_id".as("d2"), expr(cleanCharsExpr).as("clean_chars"))
      val cand = Tables(s, dir).documents
        .select($"doc_id".as("d1"), $"doc_id".as("d2"))
        .union(sym)
        .join(q, Seq("d2"))
      val wPick = org.apache.spark.sql.expressions.Window
        .partitionBy($"d1").orderBy($"clean_chars".desc, $"d2")
      cand.withColumn("rn", row_number().over(wPick)).filter($"rn" === 1)
        .select($"d1".as("doc_id"), $"d2".as("keeper"),
                $"clean_chars".cast("long").as("keeper_clean_chars"))
        .withColumn("is_canonical", ($"keeper" === $"doc_id").cast("boolean"))
        .orderBy($"doc_id")
    },
    // d7: duplicate-CLUSTER assignment — connected components over the
    // union of exact-digest star edges (doc ↔ its digest keeper) and
    // minhash near-dup pairs, by min-label propagation + pointer jumping
    // to fixpoint (connectedComponents below). The min label is
    // order-independent, so the fixpoint is deterministic under any
    // parallelism — DuckDB recomputes it as reachability min over a
    // recursive CTE.
    "d7_dup_clusters" -> { (s, dir) =>
      import s.implicits._
      val wC = org.apache.spark.sql.expressions.Window.partitionBy($"cluster")
      stagedClusterLabels(s, dir)
        .withColumn("n_members", count(lit(1)).over(wC))
        .select($"doc_id", $"cluster", $"n_members")
        .orderBy($"doc_id")
    },
    // g25: LEAKAGE-SAFE TRAIN/EVAL SPLIT — the ML-pipeline operator a
    // naive hash split gets WRONG: near-duplicate documents must never
    // straddle the train/eval boundary or the eval set leaks training
    // data (the published dedup papers' core motivation). The split key
    // is the doc's d7 CLUSTER id (exact ∪ LSH-near components), so a
    // whole dup cluster lands on one side by construction; the entry
    // audits BOTH policies — the cluster split's straddling count (must
    // be 0) next to the naive doc-hash split's (the measured leak it
    // fixes). Scale shape: labels come from the staged d7 cluster table
    // (band shuffles + bounded CC rounds paid ONCE per (JVM, dir), shared
    // with d7); the audits are two bounded aggregates over that table.
    "g25_leakage_safe_split" -> { (s, dir) =>
      import s.implicits._
      val labels = stagedClusterLabels(s, dir)
      def assign(key: org.apache.spark.sql.Column) =
        labels.withColumn("split",
          when(pmod(key, lit(10)) < 8, "train").otherwise("eval"))
      val byCluster = assign($"cluster")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def straddling(a: DataFrame, method: String): DataFrame =
        a.groupBy($"cluster").agg(countDistinct($"split").as("ns"))
          .filter($"ns" > 1)
          .agg(count(lit(1)).as("value"))
          .select(lit(method).as("method"), lit("straddling").as("item"),
                  $"value")
      val docs = byCluster.groupBy($"split")
        .agg(count(lit(1)).as("value"))
        .select(lit("cluster").as("method"),
                concat($"split", lit("_docs")).as("item"), $"value")
      val clusters = byCluster.groupBy($"split")
        .agg(countDistinct($"cluster").as("value"))
        .select(lit("cluster").as("method"),
                concat($"split", lit("_clusters")).as("item"), $"value")
      docs.unionByName(clusters)
        .unionByName(straddling(byCluster, "cluster"))
        .unionByName(straddling(assign($"doc_id"), "naive"))
        .orderBy($"method", $"item")
    }
  )

  /** d21's oracle, extracted so d22 can nest the blocked winners verbatim
    * (the d2Sql/d14 pattern). */
  private val d21Sql = s"""
      WITH a0 AS (
        SELECT doc_id AS a_id, list_distinct($shingleHashesSql) AS hs
        FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0),
      ea AS (
        SELECT a_id, n_a, h FROM (
          SELECT a_id, len(hs)::BIGINT AS n_a, unnest(hs) AS h FROM a0) t
        QUALIFY COUNT(*) OVER (PARTITION BY h) <= $MaxDf),
      b0 AS (
        SELECT doc_id + 1000000000 AS b_id, list_distinct($shingleHashesSql) AS hs
        FROM (SELECT doc_id, $wsSql AS ws
              FROM (SELECT doc_id, substring(text, 21, 160) AS text
                    FROM documents WHERE doc_id % 7 = 3) s0) t0),
      eb AS (
        SELECT b_id, len(hs)::BIGINT AS n_b, unnest(hs) AS h
        FROM b0 WHERE len(hs) >= 3),
      pairs AS (
        SELECT b_id, a_id, n_b, n_a, COUNT(*)::BIGINT AS n_inter
        FROM eb JOIN ea USING (h) GROUP BY 1, 2, 3, 4)
      SELECT b_id, a_id, n_inter,
             ((n_inter * 10000) // n_b)::BIGINT AS cont_bp,
             (a_id = b_id - 1000000000) AS is_origin
      FROM pairs
      QUALIFY row_number() OVER (PARTITION BY b_id
        ORDER BY (n_inter * 10000) // n_b DESC, a_id) = 1
      ORDER BY b_id"""

  /** d2's oracle, extracted so d14 can nest it verbatim (v11's v1Sql/v2Sql
    * pattern). */
  private val d2Sql = s"""
      WITH sig AS (
        SELECT doc_id, ${sigSql("hs")} AS sig
        FROM (SELECT doc_id, $shingleHashesSql AS hs
              FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1),
      bk AS (
        SELECT doc_id, sig, b.band_idx, bands[b.band_idx + 1] AS band_hash
        FROM (SELECT doc_id, sig, ${bandsSql("sig")} AS bands FROM sig) t
        CROSS JOIN (SELECT unnest(range(0, $NBands)) AS band_idx) b),
      bkc AS (
        SELECT * FROM bk
        QUALIFY COUNT(*) OVER (PARTITION BY band_idx, band_hash) <= $MaxBucket),
      pairs AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.sig AS sig_a, b.sig AS sig_b
        FROM bkc a JOIN bkc b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)
      SELECT d1, d2, est_jaccard FROM (
        SELECT d1, d2,
               len(list_filter(range(1, 17), i -> sig_a[i] = sig_b[i]))::DOUBLE / 16.0 AS est_jaccard
        FROM pairs) t
      WHERE est_jaccard >= 0.5 ORDER BY d1, d2"""

  /** d4's oracle, extracted for the same d14 nesting. */
  private val d4Sql = s"""
      WITH sh AS (
        SELECT doc_id, len(hs)::BIGINT AS n_sh, hs
        FROM (SELECT doc_id, $shingleHashesSql AS hs
              FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1),
      ex AS (
        SELECT doc_id, n_sh, h FROM (SELECT doc_id, n_sh, unnest(hs) AS h FROM sh) t
        QUALIFY COUNT(*) OVER (PARTITION BY h) <= $MaxDf)
      SELECT d1, d2, n_inter, n_union, jaccard FROM (
        SELECT d1, d2, n_inter, n1 + n2 - n_inter AS n_union,
               n_inter::DOUBLE / (n1 + n2 - n_inter) AS jaccard
        FROM (
          SELECT a.doc_id AS d1, b.doc_id AS d2, a.n_sh AS n1, b.n_sh AS n2,
                 COUNT(*)::BIGINT AS n_inter
          FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY d1, d2, n1, n2) t) t2
      WHERE jaccard >= 0.5 ORDER BY d1, d2"""

  val oracle: Map[String, String] = Map(
    // d21: the same blocked containment join replayed — the df cap is
    // d4's QUALIFY form, the winner the identical (score DESC, a_id) rank.
    "d21_fuzzy_join" -> d21Sql,
    // d22: exact truth (NO df cap) for the bounded eval probes, d21's
    // blocked winners nested verbatim; winners compared per probe.
    "d22_linkage_eval" -> s"""
      WITH xa0 AS (
        SELECT doc_id AS a_id, list_distinct($shingleHashesSql) AS hs
        FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0),
      xea AS (SELECT a_id, unnest(hs) AS h FROM xa0),
      xb0 AS (
        SELECT doc_id + 1000000000 AS b_id, list_distinct($shingleHashesSql) AS hs
        FROM (SELECT doc_id, $wsSql AS ws
              FROM (SELECT doc_id, substring(text, 21, 160) AS text
                    FROM documents
                    WHERE doc_id % 7 = 3 AND doc_id < 100) s0) t0),
      xeb AS (SELECT b_id, len(hs)::BIGINT AS n_b, unnest(hs) AS h
              FROM xb0 WHERE len(hs) >= 3),
      ex AS (
        SELECT b_id, a_id FROM (
          SELECT b_id, a_id, n_b, COUNT(*)::BIGINT AS n_inter
          FROM xeb JOIN xea USING (h) GROUP BY 1, 2, 3) p
        QUALIFY row_number() OVER (PARTITION BY b_id
          ORDER BY (n_inter * 10000) // n_b DESC, a_id) = 1),
      bl AS (SELECT b_id, a_id AS blocked_a FROM ($d21Sql) d
             WHERE b_id - 1000000000 < 100),
      j AS (SELECT ex.b_id, ex.a_id AS exact_a, bl.blocked_a
            FROM ex LEFT JOIN bl USING (b_id))
      SELECT COUNT(*)::BIGINT AS n_eval,
             SUM(CASE WHEN blocked_a IS NOT DISTINCT FROM exact_a
                 THEN 1 ELSE 0 END)::BIGINT AS n_agree,
             SUM(CASE WHEN exact_a = b_id - 1000000000
                 THEN 1 ELSE 0 END)::BIGINT AS n_origin_exact,
             SUM(CASE WHEN blocked_a = b_id - 1000000000
                 THEN 1 ELSE 0 END)::BIGINT AS n_origin_blocked,
             (SUM(CASE WHEN blocked_a IS NOT DISTINCT FROM exact_a
                  THEN 1 ELSE 0 END) * 10000
               // greatest(COUNT(*), 1))::BIGINT AS agree_bp
      FROM j""",
    "d13_substr_dedup" -> """
      WITH grams AS (
        SELECT doc_id, i, md5(substr(t, i, 32)) AS h
        FROM (SELECT doc_id, lower(text) AS t,
                     unnest(range(1, greatest(length(text) - 30, 1))) AS i
              FROM documents) g),
      dh AS (SELECT h FROM grams GROUP BY h HAVING COUNT(*) >= 2),
      pos AS (SELECT doc_id, i FROM grams JOIN dh USING (h)),
      sp AS (
        SELECT doc_id, i,
               CASE WHEN i > COALESCE(MAX(i + 32) OVER (
                      PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS ns
        FROM pos),
      isl AS (
        SELECT doc_id, i,
               SUM(ns) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM sp),
      spans AS (
        SELECT doc_id, sid, MIN(i) AS s, MAX(i) + 32 AS e
        FROM isl GROUP BY doc_id, sid),
      per AS (
        SELECT doc_id, COUNT(*)::BIGINT AS n_spans,
               SUM(e - s)::BIGINT AS dup_chars
        FROM spans GROUP BY doc_id),
      ng AS (SELECT doc_id, COUNT(*)::BIGINT AS n_dup_grams FROM pos GROUP BY doc_id)
      SELECT d.doc_id, COALESCE(ng.n_dup_grams, 0)::BIGINT AS n_dup_grams,
             COALESCE(per.n_spans, 0)::BIGINT AS n_spans,
             COALESCE(per.dup_chars, 0)::BIGINT AS dup_chars
      FROM documents d
      LEFT JOIN ng ON ng.doc_id = d.doc_id
      LEFT JOIN per ON per.doc_id = d.doc_id
      ORDER BY d.doc_id""",
    "d1_exact_dedup" -> """
      SELECT md5(trim(regexp_replace(lower(text), '[^a-z ]', '', 'g'))) AS digest,
             MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
      FROM documents GROUP BY digest ORDER BY keeper_doc_id""",
    "d11_incremental_dedup" -> """
      WITH d AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '[^a-z ]', '', 'g'))) AS digest
        FROM documents)
      SELECT digest, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_in_batch
      FROM d b
      WHERE doc_id % 10 <> 0
        AND NOT EXISTS (SELECT 1 FROM d i
                        WHERE i.doc_id % 10 = 0 AND i.digest = b.digest)
      GROUP BY digest ORDER BY keeper_doc_id""",
    "d12_incremental_lsh" -> s"""
      WITH sig AS (
        SELECT doc_id, ${sigSql("hs")} AS sig
        FROM (SELECT doc_id, $shingleHashesSql AS hs
              FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1),
      bk AS (
        SELECT doc_id, sig, b.band_idx, bands[b.band_idx + 1] AS band_hash
        FROM (SELECT doc_id, sig, ${bandsSql("sig")} AS bands FROM sig) t
        CROSS JOIN (SELECT unnest(range(0, $NBands)) AS band_idx) b),
      bkc AS (
        SELECT * FROM bk
        QUALIFY COUNT(*) OVER (PARTITION BY band_idx, band_hash) <= $MaxBucket),
      pairs AS (
        SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS idx_id,
               n.sig AS sig_a, i.sig AS sig_b
        FROM bkc n JOIN bkc i
          ON n.band_idx = i.band_idx AND n.band_hash = i.band_hash
         AND n.doc_id % 10 <> 0 AND i.doc_id % 10 = 0)
      SELECT new_id, COUNT(*) AS n_index_matches, MIN(idx_id) AS first_match
      FROM (
        SELECT new_id, idx_id,
               len(list_filter(range(1, 17), i -> sig_a[i] = sig_b[i]))::DOUBLE / 16.0 AS est_jaccard
        FROM pairs) t
      WHERE est_jaccard >= 0.5
      GROUP BY new_id ORDER BY new_id""",
    // d20: one d4 truth, three banding geometries (scoped subqueries —
    // v22's convention); candidate counts pre-est-filter by design
    "d20_band_sweep" -> Seq((2, 8), (4, 4), (8, 2)).map { case (nb, rpb) =>
      s"""SELECT n_bands, rows_per_band, n_truth, n_cand, n_hit,
             (n_hit * 1000 // GREATEST(n_truth, 1))::BIGINT AS recall_pm,
             (n_hit * 1000 // GREATEST(n_cand, 1))::BIGINT AS precision_pm
         FROM (
           SELECT ${nb}::BIGINT AS n_bands, ${rpb}::BIGINT AS rows_per_band,
             (SELECT COUNT(*) FROM ($d4Sql) x)::BIGINT AS n_truth,
             (SELECT COUNT(*) FROM (${bandCandSql(nb, rpb)}) y)::BIGINT
               AS n_cand,
             (SELECT COUNT(*) FROM ($d4Sql) x
              JOIN (${bandCandSql(nb, rpb)}) y USING (d1, d2))::BIGINT
               AS n_hit) s"""
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) t ORDER BY n_bands"),
    "d2_minhash_lsh" -> d2Sql,
    "d14_lsh_eval" -> s"""
      WITH truth AS (SELECT d1, d2 FROM ($d4Sql) t),
      cand AS (SELECT d1, d2 FROM ($d2Sql) c),
      h AS (SELECT COUNT(*)::BIGINT AS n_hit
            FROM truth JOIN cand USING (d1, d2)),
      nt AS (SELECT COUNT(*)::BIGINT AS n_truth FROM truth),
      nc AS (SELECT COUNT(*)::BIGINT AS n_cand FROM cand)
      SELECT n_truth, n_cand, n_hit,
             (n_hit * 1000 // greatest(n_cand, 1))::BIGINT AS precision_pm,
             (n_hit * 1000 // greatest(n_truth, 1))::BIGINT AS recall_pm
      FROM h CROSS JOIN nt CROSS JOIN nc""",
    "d3_simhash" -> s"""
      SELECT doc_id, (${simhashSql("hs")})::BIGINT AS simhash
      FROM (SELECT doc_id, list_transform(ws, t -> ${polyHashSql("t")}) AS hs
            FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1
      ORDER BY doc_id""",
    "d4_ngram_jaccard" -> d4Sql,
    // d15: same global (df, h) prefix order, same length filter, same
    // full-set verification — the prefix theorem makes both candidate
    // supersets identical, so the verified outputs match exactly
    "d15_ppjoin_exact" -> s"""
      WITH sh AS (
        SELECT doc_id, len(hs)::BIGINT AS n_sh, hs
        FROM (SELECT doc_id, list_distinct($shingleHashesSql) AS hs
              FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1),
      ex AS (SELECT doc_id, n_sh, unnest(hs) AS h FROM sh),
      dft AS (SELECT h, COUNT(*)::BIGINT AS df FROM ex GROUP BY h),
      pfx AS (
        SELECT doc_id, n_sh, h FROM (
          SELECT e.doc_id, e.n_sh, e.h,
                 row_number() OVER (PARTITION BY e.doc_id
                   ORDER BY d.df, e.h) AS rk
          FROM ex e JOIN dft d USING (h)) t
        WHERE rk <= n_sh // 2 + 1),
      cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM pfx a JOIN pfx b ON a.h = b.h AND a.doc_id < b.doc_id
         AND a.n_sh <= b.n_sh * 2 AND b.n_sh <= a.n_sh * 2),
      ver AS (
        SELECT c.d1, c.d2, e1.n_sh AS n1, e2.n_sh AS n2,
               COUNT(*)::BIGINT AS n_inter
        FROM cand c
        JOIN ex e1 ON e1.doc_id = c.d1
        JOIN ex e2 ON e2.doc_id = c.d2 AND e2.h = e1.h
        GROUP BY c.d1, c.d2, n1, n2)
      SELECT d1, d2, n_inter, n1 + n2 - n_inter AS n_union,
             n_inter::DOUBLE / (n1 + n2 - n_inter) AS jaccard
      FROM ver
      WHERE n_inter::DOUBLE / (n1 + n2 - n_inter) >= 0.5
      ORDER BY d1, d2""",
    // d16: the same prefix/verify chain over tf vectors — integer norms,
    // integer dot, integer threshold predicate; cos = two correctly-
    // rounded IEEE ops, identical on both engines.
    "d16_cosine_threshold_join" -> s"""
      WITH sgl AS (
        SELECT doc_id, unnest(${shinglesAllSql(4)}) AS sg
        FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0),
      tf AS (
        SELECT doc_id, h, COUNT(*)::BIGINT AS tf FROM (
          SELECT doc_id, ${polyHashSql("sg")} AS h FROM sgl) t
        GROUP BY doc_id, h),
      n2t AS (SELECT doc_id, SUM(tf * tf)::BIGINT AS n2 FROM tf GROUP BY doc_id),
      ex AS (SELECT tf.doc_id, tf.h, tf.tf, n2t.n2 FROM tf JOIN n2t USING (doc_id)),
      dft AS (SELECT h, COUNT(*)::BIGINT AS df FROM tf GROUP BY h),
      pfx AS (
        SELECT doc_id, h FROM (
          SELECT e.doc_id, e.h, e.n2,
                 COALESCE(SUM(e.tf * e.tf) OVER (PARTITION BY e.doc_id
                   ORDER BY d.df, e.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre2
          FROM ex e JOIN dft d USING (h)) t
        WHERE (n2 - pre2) * 100 >= n2 * 81),
      cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM pfx a JOIN pfx b ON a.h = b.h AND a.doc_id < b.doc_id),
      ver AS (
        SELECT c.d1, c.d2, e1.n2 AS n2_1, e2.n2 AS n2_2,
               SUM(e1.tf * e2.tf)::BIGINT AS dot
        FROM cand c
        JOIN ex e1 ON e1.doc_id = c.d1
        JOIN ex e2 ON e2.doc_id = c.d2 AND e2.h = e1.h
        GROUP BY c.d1, c.d2, n2_1, n2_2)
      SELECT d1, d2, dot, n2_1, n2_2,
             dot::DOUBLE / sqrt((n2_1 * n2_2)::DOUBLE) AS cos
      FROM ver
      WHERE dot * dot * 100 >= n2_1 * n2_2 * 81
      ORDER BY d1, d2""",
    "d5_embedding_neardup" -> s"""
      WITH e AS (
        SELECT vec_id, v, ${dotSql("v", "v")} AS norm2
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t),
      ${Quantizer.centroidsSql(iters = 2, dim = 64)}
      ${Quantizer.cellsSql}
      SELECT v1, v2, cell, cos FROM (
        SELECT a.vec_id AS v1, b.vec_id AS v2, a.cell::BIGINT AS cell,
               ${dotSql("a.v", "b.v")} / (sqrt(a.norm2) * sqrt(b.norm2)) AS cos
        FROM kcells a JOIN kcells b ON a.cell = b.cell AND a.vec_id < b.vec_id) t
      WHERE cos >= 0.4 ORDER BY v1, v2""",
    // d17: d5's pair chain + the min-id keeper verdict.
    "d17_semantic_dedup" -> s"""
      WITH e AS (
        SELECT vec_id, v, ${dotSql("v", "v")} AS norm2
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t),
      ${Quantizer.centroidsSql(iters = 2, dim = 64)}
      ${Quantizer.cellsSql},
      drops AS (
        SELECT DISTINCT v2 AS vec_id FROM (
          SELECT b.vec_id AS v2,
                 ${dotSql("a.v", "b.v")} / (sqrt(a.norm2) * sqrt(b.norm2)) AS cos
          FROM kcells a JOIN kcells b ON a.cell = b.cell AND a.vec_id < b.vec_id) t
        WHERE cos >= 0.4)
      SELECT c.vec_id, c.cell::BIGINT AS cell, d.vec_id IS NULL AS kept
      FROM kcells c LEFT JOIN drops d ON d.vec_id = c.vec_id
      ORDER BY c.vec_id""",
    // d18: index-trained quantizer (e over the index partition), index
    // keepers via d17's rule, batch assigned to kmc, dropped by keeper or
    // smaller-id batch cell-mate.
    "d18_incremental_semantic" -> s"""
      WITH e AS (
        SELECT vec_id, v, ${dotSql("v", "v")} AS norm2
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t
        WHERE vec_id % 10 <> 7),
      ${Quantizer.centroidsSql(iters = 2, dim = 64)}
      ${Quantizer.cellsSql},
      idrops AS (
        SELECT DISTINCT v2 AS vec_id FROM (
          SELECT b.vec_id AS v2,
                 ${dotSql("a.v", "b.v")} / (sqrt(a.norm2) * sqrt(b.norm2)) AS cos
          FROM kcells a JOIN kcells b ON a.cell = b.cell AND a.vec_id < b.vec_id) t
        WHERE cos >= 0.4),
      keepers AS (
        SELECT k.vec_id, k.v, k.norm2, k.cell
        FROM kcells k LEFT JOIN idrops d ON d.vec_id = k.vec_id
        WHERE d.vec_id IS NULL),
      bvecs AS (
        SELECT vec_id, v, ${dotSql("v", "v")} AS norm2
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t
        WHERE vec_id % 10 = 7),
      bas AS (
        SELECT k.vec_id, k.v, k.norm2, z.cell FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY acos DESC, cell) AS crank
          FROM (SELECT t.vec_id, c.cell,
                       ${dotSql("t.v", "c.cv")} / (sqrt(t.norm2) * sqrt(c.cnorm2)) AS acos
                FROM bvecs t CROSS JOIN kmc c) pp) z
        JOIN bvecs k ON k.vec_id = z.vec_id WHERE z.crank = 1),
      bdrops AS (
        SELECT DISTINCT vec_id FROM (
          SELECT bb.vec_id,
                 ${dotSql("k.v", "bb.v")} / (sqrt(k.norm2) * sqrt(bb.norm2)) AS cos
          FROM bas bb JOIN keepers k ON k.cell = bb.cell
          UNION ALL
          SELECT b2.vec_id,
                 ${dotSql("b1.v", "b2.v")} / (sqrt(b1.norm2) * sqrt(b2.norm2)) AS cos
          FROM bas b1 JOIN bas b2 ON b1.cell = b2.cell AND b1.vec_id < b2.vec_id) t
        WHERE cos >= 0.4)
      SELECT bb.vec_id, bb.cell::BIGINT AS cell, d.vec_id IS NULL AS kept
      FROM bas bb LEFT JOIN bdrops d ON d.vec_id = bb.vec_id
      ORDER BY bb.vec_id""",
    "d8_simhash_pairs" -> s"""
      WITH sh AS (
        SELECT doc_id, (${simhashSql("hs")})::BIGINT AS simhash
        FROM (SELECT doc_id, list_transform(ws, t -> ${polyHashSql("t")}) AS hs
              FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1),
      bl AS (
        SELECT doc_id, simhash, b.block_idx,
               ((simhash // ([1,256,65536,16777216])[b.block_idx + 1]) % 256) AS block_val
        FROM sh CROSS JOIN (SELECT unnest(range(0, 4)) AS block_idx) b),
      blc AS (
        SELECT * FROM bl
        QUALIFY COUNT(*) OVER (PARTITION BY block_idx, block_val) <= $MaxBucket),
      pairs AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
               a.simhash AS s1, b.simhash AS s2
        FROM blc a JOIN blc b
          ON a.block_idx = b.block_idx AND a.block_val = b.block_val
         AND a.doc_id < b.doc_id)
      SELECT d1, d2, hamming FROM (
        SELECT d1, d2, bit_count(xor(s1, s2))::BIGINT AS hamming FROM pairs) t
      WHERE hamming <= 3 ORDER BY d1, d2""",
    "d10_simhash64_pairs" -> s"""
      WITH sh AS (
        SELECT doc_id, (${simhash62Sql("hs1", "hs2")})::BIGINT AS simhash
        FROM (SELECT doc_id,
                     list_transform(ws, t -> ${polyHashSql("t")}) AS hs1,
                     list_transform(ws, t -> ${polyHash2Sql("t")}) AS hs2
              FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1),
      bl AS (
        SELECT doc_id, simhash, b.block_idx,
               ((simhash // ([1, 65536, 4294967296, 281474976710656])[b.block_idx + 1]) % 65536) AS block_val
        FROM sh CROSS JOIN (SELECT unnest(range(0, 4)) AS block_idx) b),
      blc AS (
        SELECT * FROM bl
        QUALIFY COUNT(*) OVER (PARTITION BY block_idx, block_val) <= $MaxBucket),
      pairs AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
               a.simhash AS s1, b.simhash AS s2
        FROM blc a JOIN blc b
          ON a.block_idx = b.block_idx AND a.block_val = b.block_val
         AND a.doc_id < b.doc_id)
      SELECT d1, d2, hamming FROM (
        SELECT d1, d2, bit_count(xor(s1, s2))::BIGINT AS hamming FROM pairs) t
      WHERE hamming <= 3 ORDER BY d1, d2""",
    // d19: d9's pair chain verbatim, only the keeper argmax differs
    "d19_quality_keeper" -> s"""
      WITH sig AS (
        SELECT doc_id, ${sigSql("hs")} AS sig
        FROM (SELECT doc_id, $shingleHashesSql AS hs
              FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1),
      bk AS (
        SELECT doc_id, sig, b.band_idx, bands[b.band_idx + 1] AS band_hash
        FROM (SELECT doc_id, sig, ${bandsSql("sig")} AS bands FROM sig) t
        CROSS JOIN (SELECT unnest(range(0, $NBands)) AS band_idx) b),
      bkc AS (
        SELECT * FROM bk
        QUALIFY COUNT(*) OVER (PARTITION BY band_idx, band_hash) <= $MaxBucket),
      near AS (
        SELECT d1, d2 FROM (
          SELECT d1, d2,
                 len(list_filter(range(1, 17), i -> sig_a[i] = sig_b[i]))::DOUBLE / 16.0 AS est
          FROM (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                       a.sig AS sig_a, b.sig AS sig_b
                FROM bkc a JOIN bkc b
                  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id) p) q
        WHERE est >= 0.5),
      sym AS (SELECT d1, d2 FROM near UNION ALL SELECT d2, d1 FROM near),
      q AS (SELECT doc_id AS d2, ${cleanCharsSql(spark = false)} AS clean_chars
            FROM documents),
      cand AS (
        SELECT doc_id AS d1, doc_id AS d2 FROM documents
        UNION ALL SELECT d1, d2 FROM sym),
      pick AS (
        SELECT d1, cand.d2, clean_chars,
               row_number() OVER (PARTITION BY d1
                 ORDER BY clean_chars DESC, cand.d2) AS rn
        FROM cand JOIN q ON q.d2 = cand.d2)
      SELECT d1 AS doc_id, d2 AS keeper,
             clean_chars::BIGINT AS keeper_clean_chars,
             (d2 = d1) AS is_canonical
      FROM pick WHERE rn = 1 ORDER BY doc_id""",
    "d9_dedup_reps" -> s"""
      WITH sig AS (
        SELECT doc_id, ${sigSql("hs")} AS sig
        FROM (SELECT doc_id, $shingleHashesSql AS hs
              FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1),
      bk AS (
        SELECT doc_id, sig, b.band_idx, bands[b.band_idx + 1] AS band_hash
        FROM (SELECT doc_id, sig, ${bandsSql("sig")} AS bands FROM sig) t
        CROSS JOIN (SELECT unnest(range(0, $NBands)) AS band_idx) b),
      bkc AS (
        SELECT * FROM bk
        QUALIFY COUNT(*) OVER (PARTITION BY band_idx, band_hash) <= $MaxBucket),
      near AS (
        SELECT d1, d2 FROM (
          SELECT d1, d2,
                 len(list_filter(range(1, 17), i -> sig_a[i] = sig_b[i]))::DOUBLE / 16.0 AS est
          FROM (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                       a.sig AS sig_a, b.sig AS sig_b
                FROM bkc a JOIN bkc b
                  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id) p) q
        WHERE est >= 0.5),
      sym AS (SELECT d1, d2 FROM near UNION ALL SELECT d2, d1 FROM near),
      mn AS (SELECT d1 AS doc_id, MIN(d2) AS min_nb FROM sym GROUP BY d1)
      SELECT d.doc_id,
             least(d.doc_id, COALESCE(m.min_nb, d.doc_id)) AS rep,
             (least(d.doc_id, COALESCE(m.min_nb, d.doc_id)) = d.doc_id) AS is_canonical
      FROM documents d LEFT JOIN mn m ON m.doc_id = d.doc_id
      ORDER BY d.doc_id""",
    "d7_dup_clusters" -> s"""
      WITH RECURSIVE $d7Ctes
      SELECT doc_id, cluster,
             COUNT(*) OVER (PARTITION BY cluster) AS n_members
      FROM lab ORDER BY doc_id""",
    // g25: d7's labels re-derived, then both split policies audited —
    // the cluster-keyed split must have ZERO straddling clusters and the
    // naive doc-hash split's straddling count shows the leak it fixes
    "g25_leakage_safe_split" -> s"""
      WITH RECURSIVE $d7Ctes,
      a AS (SELECT doc_id, cluster,
                   CASE WHEN cluster % 10 < 8 THEN 'train' ELSE 'eval' END AS split
            FROM lab),
      nv AS (SELECT doc_id, cluster,
                    CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'eval' END AS split
             FROM lab)
      SELECT 'cluster' AS method, split || '_docs' AS item,
             COUNT(*)::BIGINT AS value FROM a GROUP BY 2
      UNION ALL
      SELECT 'cluster', split || '_clusters', COUNT(DISTINCT cluster)::BIGINT
      FROM a GROUP BY 2
      UNION ALL
      SELECT 'cluster', 'straddling', COUNT(*)::BIGINT FROM (
        SELECT cluster FROM a GROUP BY cluster
        HAVING COUNT(DISTINCT split) > 1) z
      UNION ALL
      SELECT 'naive', 'straddling', COUNT(*)::BIGINT FROM (
        SELECT cluster FROM nv GROUP BY cluster
        HAVING COUNT(DISTINCT split) > 1) z2
      ORDER BY method, item"""
  )

  /** d7's whole cluster derivation (shared with g25): signatures → band
    * buckets → est-Jaccard near pairs ∪ exact-digest edges → recursive
    * min-reachable-id labels in `lab`. */
  private lazy val d7Ctes: String = s"""sig AS (
        SELECT doc_id, ${sigSql("hs")} AS sig
        FROM (SELECT doc_id, $shingleHashesSql AS hs
              FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1),
      bk AS (
        SELECT doc_id, sig, b.band_idx, bands[b.band_idx + 1] AS band_hash
        FROM (SELECT doc_id, sig, ${bandsSql("sig")} AS bands FROM sig) t
        CROSS JOIN (SELECT unnest(range(0, $NBands)) AS band_idx) b),
      bkc AS (
        SELECT * FROM bk
        QUALIFY COUNT(*) OVER (PARTITION BY band_idx, band_hash) <= $MaxBucket),
      near AS (
        SELECT d1, d2 FROM (
          SELECT d1, d2,
                 len(list_filter(range(1, 17), i -> sig_a[i] = sig_b[i]))::DOUBLE / 16.0 AS est
          FROM (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                       a.sig AS sig_a, b.sig AS sig_b
                FROM bkc a JOIN bkc b
                  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id) p) q
        WHERE est >= 0.5),
      dig AS (
        SELECT doc_id, md5(trim(regexp_replace(lower(text), '[^a-z ]', '', 'g'))) AS digest
        FROM documents),
      keep AS (SELECT digest, min(doc_id) AS keeper FROM dig GROUP BY digest),
      exact AS (
        SELECT k.keeper AS d1, d.doc_id AS d2
        FROM dig d JOIN keep k USING (digest) WHERE d.doc_id <> k.keeper),
      edges AS (
        SELECT d1, d2 FROM near UNION SELECT d2, d1 FROM near
        UNION SELECT d1, d2 FROM exact UNION SELECT d2, d1 FROM exact),
      reach(v, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.d2, reach.r FROM edges e JOIN reach ON e.d1 = reach.v),
      lab AS (SELECT v AS doc_id, min(r) AS cluster FROM reach GROUP BY v)"""
}

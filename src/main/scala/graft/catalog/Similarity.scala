package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryPack, Scratch, Tables}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (north-star mandate; no reference citation — SURVEY.md §2.B).
  *
  *   v1 brute-force cosine top-k — the exact baseline: broadcast the (small)
  *      query set against the full corpus, window top-k per query.
  *   v2 random-hyperplane LSH ANN — the scale path: 16-bit signatures from
  *      sign(v · h_j) for 16 fixed pseudo-random ±1 hyperplanes, banded into
  *      4 × 4-bit buckets; candidates share ≥1 bucket with the query, then
  *      exact-cosine rerank top-k within candidates.
  *
  * Determinism: hyperplane components are ±1 derived from integer bit
  * arithmetic (bit 16 of a fixed linear mix of element index i and plane j),
  * identical on both engines; every double is a serial left-fold in identical
  * op order (see Tx scaladoc), so signatures and cosines match DuckDB
  * bitwise, and top-k ties break on neighbor id.
  *
  * Scale notes (100 TB):
  *  - v1 is a broadcast nested-loop by construction (queries ≪ corpus): the
  *    corpus is scanned once, partition-parallel, nothing shuffles but the
  *    per-partition top-k (the window on q_id is a k-row-per-query shuffle
  *    after AQE; with a custom TypedImperativeAggregate it would be a
  *    partial top-k heap — planned escalation if bench demands);
  *  - v2 signatures are per-row projection (shuffle-free); the bucket join
  *    shuffles only (band, sig, id, vec) for bucket-matching rows. In a real
  *    deployment signatures are precomputed and bucket-bucketed (DISTRIBUTE
  *    BY band_hash) so queries touch only their buckets — IVF-style.
  */
object Similarity extends QueryPack {
  import graft.functions.TextKernels
  import Tx.dotSql


  // Spark side computes with the compiled kernels in TextKernels (identical
  // arithmetic — see its scaladoc); these generators emit the DuckDB oracle.

  /** ±1 hyperplane component for element i (1-based) of plane j: bit 16 of a
    * fixed linear integer mix — identical arithmetic on both engines. */
  private def signSql(i: String, j: Int): String =
    s"((((($i * 2654435761 + ${j.toLong * 998244353L}) // 65536) % 2) * 2 - 1)::DOUBLE)"

  /** 16-bit signature of double-array `v`: bit j = [v · h_j > 0]. */
  private def sigSql(v: String): String =
    (0 until 16).map { j =>
      s"(case when list_reduce(list_prepend(0::DOUBLE, list_transform(range(1, len($v)+1), " +
        s"i -> $v[i] * ${signSql("i", j)})), " +
        s"(a, x) -> a + x) > 0 then ${1L << j} else 0 end)"
    }.mkString("(", " + ", ")")

  /** 4-bit band values of a 16-bit signature. */
  private def bandsExpr(sig: String): String =
    "array(" + (0 until 4).map(b => s"($sig div ${1L << (4 * b)}) % 16").mkString(", ") + ")"
  private def bandsSql(sig: String): String =
    "[" + (0 until 4).map(b => s"($sig // ${1L << (4 * b)}) % 16").mkString(", ") + "]"

  private[catalog] val K = 10
  // v16 beam-search budget: unrolled hop count and frontier width — per-
  // query state is ≤ BeamW ids per hop regardless of corpus size.
  private val BeamHops = 3
  private val BeamW = 8

  /** Exploded (vec_id, band_idx, band_val) bucket table over a frame that
    * carries a `sig` column — the relation a deployment PERSISTS
    * `bucketBy(band_idx, band_val)` at ingest so the v2 query path joins
    * bucket-to-bucket with no corpus-side Exchange (BucketingSpec pins
    * that plan shape). */
  private[graft] def bandBuckets(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      posexplode(expr(bandsExpr("sig"))).as(Seq("band_idx", "band_val")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // v1: exact brute-force cosine top-k for query set vec_id < 10.
    // Top-k runs as a CUSTOM TYPED AGGREGATOR (functions/TopK.scala), not a
    // window: each partition keeps a k-element buffer (map-side partial
    // agg), the shuffle carries k rows per (query, partition) instead of
    // every scored candidate — at 100 TB that is the difference between
    // shuffling the corpus and shuffling k·p rows.
    "v1_brute_topk" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .select($"vec_id", $"v", $"norm2")
      val q = e.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"v".as("qv"), $"norm2".as("qn"))
      e.join(broadcast(q), $"vec_id" =!= $"q_id")
        .withColumn("cos", graft.functions.VectorExprs.cosine($"qv", $"v", $"qn", $"norm2"))
        .groupBy($"q_id")
        .agg(graft.functions.TopK.topK10($"cos", $"vec_id").as("top"))
        .select($"q_id", posexplode($"top").as(Seq("idx", "nb")))
        .select($"q_id", ($"idx" + 1).cast("long").as("rank"),
                $"nb.vec_id".as("neighbor_id"), $"nb.cos".as("cos"))
        .orderBy($"q_id", $"rank")
    },
    // v18: RANDOM-PROJECTION SKETCH SEARCH (Johnson-Lindenstrauss) — the
    // 64-dim embeddings compress to 8 signed-sum projections (±1 signs from
    // a deterministic integer hash of (k, d) — the % 2147483647 mix breaks
    // the parity structure an odd multiplier alone would leave), and the
    // ANN scan ranks by PROJECTED-space cosine: 8× fewer bytes through the
    // scan, the standard dim-reduction front of a 100 TB retrieval tier.
    // Exactness contract: components quantize to round(v·4096) ints, so
    // projections, dotp and pn2 are exact integers under any partition
    // order; cosp = dotp / sqrt(greatest(pn2q·pn2c, 1)) is two IEEE ops on
    // exact ints (the greatest() guard keeps a theoretical all-zero sketch
    // finite and engine-identical). Top-k uses the v1 TopK typed aggregator
    // (map-side k-buffers — k·p rows shuffle, never the corpus); true
    // cosine is recomputed ONLY for the reported k·|Q| pairs (id-pruned
    // joins), exposing sketch-vs-exact agreement per row — the recall
    // readout a deployment monitors when tuning the projection width.
    "v18_random_projection" -> { (s, dir) =>
      import s.implicits._
      // the ±1 signs are a PURE function of (k, d): fold them at plan-build
      // time and emit flat 64-term sums — the sketch and the dotp stay
      // inside whole-stage codegen (the HOF `aggregate` form of the same
      // arithmetic ran interpreted per candidate pair: 35× slower at sf0.1).
      // The oracle recomputes the identical hash at RUN time, so a
      // constant-folding bug here cannot self-confirm.
      val signs = Array.tabulate(8, 64) { (k, d) =>
        1L - 2L * (((1315423911L * k + 2654435761L * d) % 2147483647L) % 2)
      }
      // round-14: the folded flat form (512 signed element_at terms) moved
      // into the native SignedProjection kernel — same signed BIGINT sums
      // (wraparound addition is order-independent), one plan node instead
      // of a projection too large to codegen well; the oracle still runs
      // the folded SQL and SignedProjectionSpec pins kernel == SQL
      val e = Tables(s, dir).embeddings
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .withColumn("q", expr("transform(v, x -> cast(round(x * 4096) as bigint))"))
        .withColumn("p", graft.functions.SignedProjection.of($"q", signs))
        .withColumn("pn2", expr((1 to 8)
          .map(i => s"element_at(p, $i) * element_at(p, $i)").mkString(" + ")))
        .select($"vec_id", $"v", $"norm2", $"p", $"pn2")
      val qs = e.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"v".as("qv"), $"norm2".as("qn"),
                $"p".as("qp"), $"pn2".as("qpn2"))
      val dotpExpr = expr((1 to 8)
        .map(i => s"element_at(qp, $i) * element_at(p, $i)").mkString(" + "))
      val top = e.select($"vec_id", $"p", $"pn2")
        .join(broadcast(qs.select($"q_id", $"qp", $"qpn2")), $"vec_id" =!= $"q_id")
        .withColumn("dotp", dotpExpr)
        .withColumn("cosp", $"dotp".cast("double") /
          sqrt(expr("greatest(cast(qpn2 as double) * cast(pn2 as double), 1.0d)")))
        .groupBy($"q_id")
        .agg(graft.functions.TopK.topK10($"cosp", $"vec_id").as("top"))
        .select($"q_id", posexplode($"top").as(Seq("idx", "nb")))
        .select($"q_id", ($"idx" + 1).cast("long").as("rank"),
                $"nb.vec_id".as("neighbor_id"), $"nb.cos".as("cosp"))
      top
        .join(e.select($"vec_id".as("neighbor_id"), $"v", $"norm2",
                       $"p", $"pn2"), Seq("neighbor_id"))
        .join(broadcast(qs), Seq("q_id"))
        .withColumn("dotp", dotpExpr)
        .withColumn("cos_true",
          graft.functions.VectorExprs.cosine($"qv", $"v", $"qn", $"norm2"))
        .select($"q_id", $"rank", $"neighbor_id", $"dotp", $"cosp", $"cos_true")
        .orderBy($"q_id", $"rank")
    },
    // v2: LSH-bucketed ANN — candidates share ≥1 of 4 signature bands with
    // the query, exact-cosine rerank top-k within candidates.
    // The candidate DEDUP shuffles only (q_id, vec_id) id pairs — round-1's
    // version distinct()'d rows carrying both full vectors, which made the
    // dedup shuffle the dominant byte-mover at scale. Vectors rejoin AFTER
    // the dedup: the query side re-broadcasts, the corpus side equi-joins on
    // vec_id (each corpus vector crosses the wire once per candidate set,
    // not once per band collision).
    "v2_lsh_ann" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .withColumn("sig", TextKernels.lshSigUdf($"v"))
        .select($"vec_id", $"v", $"norm2", $"sig")
      val buckets = bandBuckets(e)
      val qb = buckets.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"band_idx", $"band_val")
      val candIds = buckets.join(broadcast(qb), Seq("band_idx", "band_val"))
        .filter($"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id")
        .distinct()
      val q = e.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"v".as("qv"), $"norm2".as("qn"))
      val cand = candIds
        .join(e.select($"vec_id", $"v", $"norm2"), Seq("vec_id"))
        .join(broadcast(q), Seq("q_id"))
      val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
      cand
        .withColumn("cos", graft.functions.VectorExprs.cosine($"qv", $"v", $"qn", $"norm2"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= K)
        .select($"q_id", $"rank".cast("long").as("rank"),
                $"vec_id".as("neighbor_id"), $"cos")
        .orderBy($"q_id", $"rank")
    },
    "v3_ivf_ann" -> ivfQuery(sampleMod = 1),
    // v22: PROBE-RECALL SWEEP — the measured tradeoff behind every
    // scaladoc that says "re-probing more cells is v3's nProbe dial":
    // the SAME trained quantizer searched at nProbe 1, 2, and 4, each
    // scored against the brute-force truth (v1) — output is the
    // (n_probe, recall) curve an operator reads before picking the dial.
    // Scale shape: the quantizer trains ONCE (memoized model state); the
    // brute-force truth is computed once and pinned as a 10·K-row
    // LITERAL frame (bounded collect — the sweep must not re-pay the
    // brute scan per branch); each sweep's IVF scan (the object under
    // measurement) re-runs per probe width. Recall is basis points by
    // integer division — exact.
    "v22_probe_recall_sweep" -> { (s, dir) =>
      import s.implicits._
      val exact = queries("v1_brute_topk")(s, dir)
        .select($"q_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
        .toDF("q_id", "neighbor_id")
      Seq(1, 2, 4).map { np =>
        val ann = ivfQuery(sampleMod = 1, nProbe = np)(s, dir)
          .select($"q_id", $"neighbor_id").withColumn("hit", lit(1L))
        exact.join(ann, Seq("q_id", "neighbor_id"), "left")
          .agg(count(lit(1)).as("n_truth"),
               sum(coalesce($"hit", lit(0L))).as("n_hit"))
          .select(lit(np.toLong).as("n_probe"), $"n_truth", $"n_hit",
                  expr("n_hit * 10000 div n_truth").as("recall_bp"))
      }.reduce(_ unionByName _).orderBy($"n_probe")
    },
    // v26: GRAPH HOP-RECALL SWEEP — v22 measures the IVF dial (nProbe);
    // this measures the GRAPH dial: recall@10 vs exact truth for beam
    // walks of 1/2/3 hops over the stored v5 edges. The measured curve is
    // what an operator reads to set the hop budget (each hop costs one
    // frontier×edge expansion round; recall is monotone in hops BY
    // CONSTRUCTION — the h-hop visited set contains the (h−1)-hop one —
    // and GraphAnnSpec pins that monotonicity). Exact truth is v1's
    // 10-query sample (v11/v22's convention); the sweep's three walks
    // share the walk shape, so cost scales with the dial, not the corpus.
    "v26_hop_recall_sweep" -> { (s, dir) =>
      import s.implicits._
      val exact = queries("v1_brute_topk")(s, dir)
        .select($"q_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
        .toDF("q_id", "neighbor_id")
      Seq(1, 2, 3).map { h =>
        val ann = beamWalk(s, dir, v5Edges(s, dir), None,
            countTouched = false, hops = h)._1
          .select($"q_id", $"neighbor_id").withColumn("hit", lit(1L))
        exact.join(ann, Seq("q_id", "neighbor_id"), "left")
          .agg(count(lit(1)).as("n_truth"),
               sum(coalesce($"hit", lit(0L))).as("n_hit"))
          .select(lit(h.toLong).as("n_hops"), $"n_truth", $"n_hit",
                  expr("n_hit * 10000 div n_truth").as("recall_bp"))
      }.reduce(_ unionByName _).orderBy($"n_hops")
    },
    // v20: FILTERED ANN — vector search under a metadata predicate (here:
    // the neighbor's document must be lang = 'en'), the production RAG
    // shape ("search my English docs"). The filter applies to the CELL
    // SCAN — a semi-join of the inverted-file entries against the
    // predicate's id set — BEFORE top-k, not to the result afterward:
    // post-filtering a top-k list returns k·selectivity rows (recall
    // collapses for selective predicates); pre-filtering fills k from
    // eligible vectors only. Scale shape (100 TB): the predicate pushes
    // to the documents scan (PushedFilters on lang), the id semi-join
    // keys on vec_id alongside the cell join — no new data-sized
    // shuffle; cells whose eligible population is thin simply return
    // fewer rows (re-probing more cells is v3's nProbe dial, not a new
    // operator). Queries themselves need not satisfy the predicate.
    "v20_filtered_ann" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .select($"vec_id", $"v", $"norm2")
      val cents = Quantizer.centroidsFor(e, dir, iters = 2, dim = 64)
      val eligible = Tables(s, dir).documents
        .filter($"lang" === "en").select($"doc_id".as("vec_id"))
      val data = Quantizer.assign(e, cents)
        .join(eligible, Seq("vec_id"), "left_semi")
        .select($"cell", $"vec_id", $"v", $"norm2")
      val probes = Quantizer.probe(e.filter($"vec_id" < 10), cents, nProbe = 2)
        .select($"cell", $"vec_id".as("q_id"), $"v".as("qv"), $"norm2".as("qn"))
      val wTop = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
      data.join(broadcast(probes), Seq("cell"))
        .filter($"vec_id" =!= $"q_id")
        .withColumn("cos",
          graft.functions.VectorExprs.cosine($"qv", $"v", $"qn", $"norm2"))
        .withColumn("rank", row_number().over(wTop))
        .filter($"rank" <= K)
        .select($"q_id", $"rank".cast("long").as("rank"),
                $"vec_id".as("neighbor_id"), $"cos")
        .orderBy($"q_id", $"rank")
    },
    // v21: ANN INDEX DELETE + COMPACTION — the lifecycle leg v8/v9 leave
    // out: vectors LEAVE the index (takedowns, stale docs). The postings
    // store is parquet partitionBy(cell) — the inverted-file layout on
    // disk. Deletes arrive as an id-only tombstone set; compaction
    // (a) finds the DIRTY cells (a semi join of postings against the
    // tombstones — only cells that actually contain a deleted vector),
    // (b) rewrites ONLY those cell partitions via dynamic partition
    // overwrite (k12's mechanism pointed at index maintenance), leaving
    // every clean cell's files untouched. Search then reads the compacted
    // store with NO per-query anti join — the read-path cost of deletion
    // is zero after compaction. Scale shape (100 TB): tombstones are
    // 8 B/row and broadcast; the rewrite bill is proportional to dirty
    // cells, not index size; AnnDeleteCompactSpec pins compacted search ==
    // tombstone-masked search (collapse-on-read and compaction agree) and
    // that clean-cell files are byte-identical after compaction.
    "v21_ann_delete_compact" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .select($"vec_id", $"v", $"norm2")
      val cents = Quantizer.centroidsFor(e, dir, iters = 2, dim = 64)
      val compacted = Scratch.parquet(s, compactedPostings(s, dir, e, cents))
      val probes = Quantizer.probe(e.filter($"vec_id" < 10), cents, nProbe = 2)
        .select($"cell", $"vec_id".as("q_id"), $"v".as("qv"), $"norm2".as("qn"))
      val wTop = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
      compacted.join(broadcast(probes), Seq("cell"))
        .filter($"vec_id" =!= $"q_id")
        .withColumn("cos",
          graft.functions.VectorExprs.cosine($"qv", $"v", $"qn", $"norm2"))
        .withColumn("rank", row_number().over(wTop))
        .filter($"rank" <= K)
        .select($"q_id", $"rank".cast("long").as("rank"),
                $"vec_id".as("neighbor_id"), $"cos")
        .orderBy($"q_id", $"rank")
    },
    // v5: kNN GRAPH construction — EVERY vector's top-3 neighbors within its
    // IVF cell (the graph a semantic-dedup / diversity-sampling stage
    // consumes). The self-join keys on cell id, so candidate pairs are
    // Σ|cell|² instead of N² — with CellTarget-sized cells that is
    // N·CellTarget, linear in the corpus. The rerank fans in through the
    // TopKByCos typed aggregator (map-side partial top-3 heaps), so the
    // post-join shuffle carries 3 rows per (source, partition) instead of
    // sorting every scored pair — the same escalation v1 shipped. Vectors
    // missing a same-cell neighbor drop out — at scale you re-probe those
    // against adjacent cells, the v3 probe shape.
    "v5_knn_graph" -> { (s, dir) =>
      import s.implicits._
      // served from the staged edge table (built once per (JVM, dir),
      // shared with v7/v9/v14/v24) — a deployment builds the graph at
      // index time and every consumer, including the "show me the graph"
      // query itself, reads the persisted edges
      stagedKnnGraph(s, dir).orderBy($"src_id", $"rank")
    },
    // v7: CENTRALITY over the kNN graph — PageRank-style power iteration
    // (2 rounds, damping 0.85) as a graph-structural quality signal (the
    // harmonic-centrality idea web-corpus curation uses). All-integer
    // arithmetic: scores are 10⁶-scaled, contributions use floor division,
    // so every round is exact under any partition order. Each round is one
    // join + one aggregate keyed by node (the d7 loop shape); the final
    // top-20 is TakeOrderedAndProject, never a global sort.
    "v7_knn_centrality" -> { (s, dir) =>
      import s.implicits._
      // Centrality CONSUMES the graph v5 builds — a deployment runs it over
      // the persisted edge table, not by rebuilding the graph inline (the
      // same stored-graph reasoning as v9). Staged to scratch parquet once
      // per session; every power-iteration branch (out-degrees + one join
      // per round) then reads the tiny edge parquet instead of re-running
      // the quantize+score pipeline per DAG branch. Values are unchanged:
      // edges are (id, id) integer pairs, and parquet round-trips them
      // exactly.
      val edges = stagedKnnGraph(s, dir).select($"src_id", $"neighbor_id")
      val out = edges.groupBy($"src_id").agg(count(lit(1)).as("outd"))
      var score = out.select($"src_id".as("id"), lit(1000000L).as("sc"))
      for (_ <- 1 to 2) {
        val contrib = edges.join(out, Seq("src_id"))
          .join(score, $"src_id" === $"id")
          .select($"neighbor_id".as("id"), expr("sc div outd").as("c"))
          .groupBy($"id").agg(sum($"c").as("in_sum"))
        score = score.select($"id")
          .join(contrib, Seq("id"), "left")
          .select($"id",
            expr("150000 + (85 * coalesce(in_sum, 0L)) div 100").as("sc"))
      }
      score.select($"id".as("vec_id"), $"sc".as("score"))
        .orderBy($"score".desc, $"vec_id").limit(20)
    },
    // v4: v3's IVF with the quantizer trained on the DETERMINISTIC 1/4
    // SAMPLE (vec_id % 4 == 0) — Lloyd's passes scan a quarter of the
    // table, only the final assignment reads everything. At 100 TB the
    // training sample is what makes in-engine quantizer training feasible;
    // the oracle re-trains on the same sample, so the model (and therefore
    // every cell and neighbor) still matches bitwise.
    "v4_ivf_sampled" -> ivfQuery(sampleMod = 4),
    // v8: INCREMENTAL ANN ADD-BATCH — the maintenance path a continuously-
    // embedded corpus needs (round-4 missing #2): the IVF index (cells +
    // trained centroids) already EXISTS, built over the index partition
    // (vec_id % 10 ≠ 7); an incoming batch (vec_id % 10 = 7) is placed by
    // assigning each new vector to its nearest EXISTING centroid — a pure
    // literal-centroid projection, no retraining, no Lloyd pass — and
    // reported with its top-3 nearest in-cell index neighbors (the insert
    // position a graph/IVF index records). d12's shape applied to v3's
    // cells: the scoring join probes batch×index only — index vectors
    // NEVER re-score against each other (CurationOpsSpec pins both the
    // pair population and the single-broadcast-join plan); cost scales
    // with |batch|·CellTarget, not the index size.
    "v8_ivf_add_batch" -> { (s, dir) =>
      import s.implicits._
      val all = Tables(s, dir).embeddings
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .select($"vec_id", $"v", $"norm2")
      val idx = all.filter(pmod($"vec_id", lit(10)) =!= 7)
      val batch = all.filter(pmod($"vec_id", lit(10)) === 7)
      // the trained model is index-build-time state (memoized per session,
      // like a deployment loading the persisted quantizer)
      val cents = Quantizer.centroidsOnIndexFor(idx, dir, "idx7", iters = 2, dim = 64)
      val data = Quantizer.assign(idx, cents)
        .select($"cell", $"vec_id", $"v", $"norm2")
      val probes = Quantizer.assign(batch, cents)
        .select($"cell", $"vec_id".as("q_id"), $"v".as("qv"), $"norm2".as("qn"))
      data.join(broadcast(probes), Seq("cell"))
        .withColumn("cos",
          graft.functions.VectorExprs.cosine($"qv", $"v", $"qn", $"norm2"))
        .groupBy($"q_id", $"cell")
        .agg(graft.functions.TopK.topK3($"cos", $"vec_id").as("top"))
        .select($"q_id", $"cell", posexplode($"top").as(Seq("idx", "nb")))
        .select($"q_id", $"cell".cast("long").as("cell"),
                ($"idx" + 1).cast("long").as("rank"),
                $"nb.vec_id".as("neighbor_id"), $"nb.cos".as("cos"))
        .orderBy($"q_id", $"rank")
    },
    // v9: INCREMENTAL kNN-GRAPH MAINTENANCE — v8 taken to its conclusion:
    // the batch does not just probe the index, it UPDATES the graph.
    // (a) new nodes get top-3 edges over (index ∪ batch) within their
    // placement cell; (b) existing nodes' edges update by re-ranking their
    // STORED top-3 unioned with candidates scored ONLY against the batch
    // (cell-local) — the incremental-graph algorithm where index×index
    // pairs are never re-scored: per batch, the new scoring work is
    // |batch|·CellTarget (new edges) + |affected cells|·CellTarget·|batch
    // in cell| (updates), independent of total graph size. Nodes in
    // untouched cells re-rank their stored 3 edges to an identical result,
    // so the oracle needs no affected-cell filter — re-ranking a node's
    // old edges alone is the identity.
    "v9_knn_graph_update" -> { (s, dir) =>
      import s.implicits._
      val all = Tables(s, dir).embeddings
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .select($"vec_id", $"v", $"norm2")
      val idx = all.filter(pmod($"vec_id", lit(10)) =!= 7)
      val batch = all.filter(pmod($"vec_id", lit(10)) === 7)
      // same trained index model as v8 (memoized — build-time state)
      val cents = Quantizer.centroidsOnIndexFor(idx, dir, "idx7", iters = 2, dim = 64)
      val data = Quantizer.assign(idx, cents)
        .select($"cell", $"vec_id", $"v", $"norm2")
      val bas = Quantizer.assign(batch, cents)
        .select($"cell", $"vec_id".as("b_id"), $"v".as("bv"), $"norm2".as("bn"))
      val oldEdges = stagedIndexKnnGraph(s, dir)
      // (a) new-node edges over index ∪ batch, cell-local
      val pool = data.unionByName(bas.select($"cell", $"b_id".as("vec_id"),
        $"bv".as("v"), $"bn".as("norm2")))
      val newEdges = top3(
        pool.join(broadcast(bas), Seq("cell")).filter($"vec_id" =!= $"b_id")
          .withColumn("cos",
            graft.functions.VectorExprs.cosine($"bv", $"v", $"bn", $"norm2"))
          .select($"b_id", $"vec_id".as("nb_id"), $"cos"), "b_id")
      // (b) stored edges ∪ batch-only candidates, re-ranked per index node
      val cand = data.join(broadcast(bas), Seq("cell"))
        .withColumn("cos",
          graft.functions.VectorExprs.cosine($"v", $"bv", $"norm2", $"bn"))
        .select($"vec_id".as("s_id"), $"b_id".as("nb_id"), $"cos")
      val updated = top3(
        oldEdges.select($"src_id".as("s_id"), $"neighbor_id".as("nb_id"), $"cos")
          .unionByName(cand), "s_id")
      updated.withColumn("is_new", lit(false))
        .unionByName(newEdges.withColumn("is_new", lit(true)))
        .orderBy($"src_id", $"rank")
    },
    // v10: MMR-DIVERSIFIED SELECTION — retrieval alone returns near-
    // duplicates of the same best hit; maximal-marginal-relevance re-picks
    // k'=3 of the top-10 so each addition maximizes rel(q,c) − max_{s∈S}
    // sim(c,s) (λ=1/2 MMR with the constant dropped — same argmax). The
    // diversity-aware sampling step a curation pipeline runs after ANN.
    // Candidate pooling is v1's broadcast + partial top-k heaps over the
    // corpus; after the top-k, greedy selection is PER-QUERY local work
    // over ≤k candidates, so it runs as ONE flatMapGroups (one exchange to
    // co-locate each query's pool) with the greedy rounds in plain Scala —
    // round 12 replaced the 3-round unrolled join chain, whose ~15
    // k-row shuffle exchanges dominated the entry's cost (2.4 s of
    // scheduling for microseconds of arithmetic; the round-11 verdict's
    // item 8). Every cosine below is the SAME serial left-to-right fold as
    // the VectorExprs.DotProduct kernel and the oracle's list_reduce, so
    // scores stay bitwise identical; selection stays distributed (executor-
    // side per group — at 1M queries the groups spread over the cluster).
    "v10_mmr_diversify" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .select($"vec_id", $"v", $"norm2")
      val q = e.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"v".as("qv"), $"norm2".as("qn"))
      val top = e.join(broadcast(q), $"vec_id" =!= $"q_id")
        .withColumn("rel",
          graft.functions.VectorExprs.cosine($"qv", $"v", $"qn", $"norm2"))
        .groupBy($"q_id")
        .agg(graft.functions.TopK.topK10($"rel", $"vec_id").as("top"))
        .select($"q_id", explode($"top").as("nb"))
        .select($"q_id", $"nb.vec_id".as("vec_id"), $"nb.cos".as("rel"))
      val cand = top.join(e, Seq("vec_id"))
        .select($"q_id", $"vec_id", $"rel", $"v", $"norm2")
        .as[(Long, Long, Double, Seq[Double], Double)]
      val picked = cand.groupByKey(_._1).flatMapGroups { (qid, it) =>
        // serial-fold cosine, bitwise-identical to the codegen'd kernel
        def cos(a: Seq[Double], b: Seq[Double], na: Double, nb: Double): Double = {
          val n = math.min(a.length, b.length)
          var acc = 0.0
          var i = 0
          while (i < n) { acc += a(i) * b(i); i += 1 }
          acc / (math.sqrt(na) * math.sqrt(nb))
        }
        val pool = it.toArray
        val selected = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double)]()
        val chosen = scala.collection.mutable.ArrayBuffer[(Long, Seq[Double], Double)]()
        var pick = 1L
        while (pick <= 3L && chosen.size < pool.length) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < pool.length) {
            val c = pool(i)
            if (!chosen.exists(_._1 == c._2)) {
              // pick 1 scores pure relevance; later picks subtract the max
              // similarity to the already-selected set (IEEE max + subtract,
              // the same ops the unrolled plan and the oracle perform)
              val score =
                if (pick == 1L) c._3
                else c._3 - chosen.iterator
                  .map(s => cos(c._4, s._2, c._5, s._3)).max
              // argmax under the oracle's SORT order (row_number OVER
              // ORDER BY score DESC, vec_id): NaN sorts LARGEST — a
              // zero-norm candidate (cosine 0/0) must beat every real
              // score even in a MIXED round, not only the all-NaN one
              // (round-12 advice). java.lang.Double.compare is exactly
              // that total order with NaN on top; fold -0.0 into 0.0
              // first so the IEEE tie stays a vec_id tiebreak like SQL's.
              val sk = if (score == 0.0) 0.0 else score
              val bk = if (bestScore == 0.0) 0.0 else bestScore
              val c0 = if (best < 0) 1 else java.lang.Double.compare(sk, bk)
              if (c0 > 0 || (c0 == 0 && best >= 0 && c._2 < pool(best)._2)) {
                best = i; bestScore = score
              }
            }
            i += 1
          }
          val b = pool(best)
          selected += ((qid, pick, b._2, bestScore))
          chosen += ((b._2, b._4, b._5))
          pick += 1L
        }
        selected.iterator
      }
      picked.toDF("q_id", "pick", "vec_id", "score")
        .orderBy($"q_id", $"pick")
    },
    // v11: ANN RECALL EVALUATION — the index-quality monitor a deployment
    // runs before trusting an approximate index: v2's LSH top-10 scored
    // against v1's exact top-10, recall@10 per query. Composes the two
    // retrieval entries AS SHIPPED (self-composition through the query
    // map, like the c-pipelines), so this gate breaks if either retrieval
    // OR their agreement drifts. Integer-exact: hit counts and a floor
    // percentage; at 100 TB the exact side runs on a small sampled query
    // set — recall is a statistic, not a per-query product.
    "v11_ann_recall" -> { (s, dir) =>
      import s.implicits._
      val exact = queries("v1_brute_topk")(s, dir)
        .select($"q_id", $"neighbor_id")
      val ann = queries("v2_lsh_ann")(s, dir)
        .select($"q_id", $"neighbor_id").withColumn("hit", lit(1L))
      exact.join(ann, Seq("q_id", "neighbor_id"), "left")
        .groupBy($"q_id")
        .agg(sum(coalesce($"hit", lit(0L))).as("n_hit"))
        .withColumn("recall_pct", expr(s"n_hit * 100 div $K"))
        .orderBy($"q_id")
    },
    // v12: PRODUCT-QUANTIZATION ANN — the memory-compression path of the
    // ANN family: the 64-dim vector becomes M=4 sub-codes into per-subspace
    // 16-entry codebooks (here sample-initialized from the first 16 rows —
    // swapping in per-subspace Lloyd's is exactly the Quantizer pattern),
    // so the index stores 4 bytes/vector instead of 512. Retrieval is
    // asymmetric distance (ADC): score queries against RECONSTRUCTED
    // vectors (concatenated chosen sub-centroids), take a candidate pool,
    // then exact-cosine rerank the true vectors — output cosines are
    // exact. Scale shape (100 TB): encoding is a pure projection against
    // literal codebooks (model state, like v3's centroids — no shuffle);
    // ADC scans the 128x-smaller code/reconstruction table broadcast-vs-
    // queries (a deployment precomputes per-query lookup tables of
    // query-sub x codebook dots, making the scan additions only); only
    // the PqCand candidate pool per query touches full vectors. The
    // codebook argmin, ADC ordering, and rerank are engine-bitwise (serial
    // -fold dots, ties on code / vec_id asc) so the DuckDB twin matches.
    "v12_pq_ann" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .select($"vec_id", $"v", $"norm2")
      val coded = pqReconFrame(e, dir)
      val qs = e.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"v".as("qv"), $"norm2".as("qn"))
      val wCand = Window.partitionBy($"q_id").orderBy($"adc".desc, $"vec_id")
      val cand = coded.crossJoin(broadcast(qs))
        .filter($"vec_id" =!= $"q_id")
        .withColumn("adc", graft.functions.VectorExprs.cosine(
          $"qv", $"recon", $"qn", $"rn2"))
        .withColumn("crank", row_number().over(wCand))
        .filter($"crank" <= PqCand)
        .select($"q_id", $"qv", $"qn", $"vec_id")
      val wTop = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
      cand.join(e, Seq("vec_id"))
        .withColumn("cos", graft.functions.VectorExprs.cosine(
          $"qv", $"v", $"qn", $"norm2"))
        .withColumn("rank", row_number().over(wTop))
        .filter($"rank" <= K)
        .select($"q_id", $"rank".cast("long").as("rank"),
                $"vec_id".as("neighbor_id"), $"cos")
        .orderBy($"q_id", $"rank")
    },
    // v15: SCALAR-QUANTIZATION (int8) ANN — the OTHER standard embedding
    // compression next to v12's PQ: each corpus vector stores as 64 int8
    // codes + one double scale (16× vs float64, 4× vs float32), with
    // code_i = round(v_i/scale), scale = max|v_i|/127. Queries stay EXACT
    // (they arrive uncompressed); candidates rank by cosine against the
    // DEQUANTIZED corpus vector (recon_i = code_i·scale), and the top-Cand
    // pool reranks against exact vectors — v12's two-stage shape with a
    // per-vector (not codebook) model, so there is NO training step: the
    // encode is a pure projection, the natural choice when the corpus
    // churns too fast to retrain codebooks.
    // Determinism: scale/round/recon are single IEEE ops identical on both
    // engines; every dot is the serial-fold kernel pair (VectorExprs.dot ==
    // dotSql); ties break on vec_id.
    // Scale shape (100 TB): encoding is per-row projection — zero shuffle;
    // the candidate scan reads ~72 B/vector instead of 512 B (the memory-
    // bandwidth win IS the operator); rerank touches Cand full vectors per
    // query; at deployment the codes column is the only thing the hot scan
    // reads (column pruning does the rest).
    "v15_sq_ann" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .select($"vec_id", $"v", $"norm2")
      val coded = e
        .withColumn("scale", expr("array_max(transform(v, x -> abs(x))) / 127.0D"))
        .withColumn("recon", expr(
          "transform(v, x -> cast(round(x / scale) as double) * scale)"))
        .withColumn("rn2", graft.functions.VectorExprs.dot($"recon", $"recon"))
        .select($"vec_id", $"recon", $"rn2")
      val qs = e.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"v".as("qv"), $"norm2".as("qn"))
      val wCand = Window.partitionBy($"q_id").orderBy($"adc".desc, $"vec_id")
      val cand = coded.crossJoin(broadcast(qs))
        .filter($"vec_id" =!= $"q_id")
        .withColumn("adc", graft.functions.VectorExprs.cosine(
          $"qv", $"recon", $"qn", $"rn2"))
        .withColumn("crank", row_number().over(wCand))
        .filter($"crank" <= PqCand)
        .select($"q_id", $"qv", $"qn", $"vec_id")
      val wTop = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
      cand.join(e, Seq("vec_id"))
        .withColumn("cos", graft.functions.VectorExprs.cosine(
          $"qv", $"v", $"qn", $"norm2"))
        .withColumn("rank", row_number().over(wTop))
        .filter($"rank" <= K)
        .select($"q_id", $"rank".cast("long").as("rank"),
                $"vec_id".as("neighbor_id"), $"cos")
        .orderBy($"q_id", $"rank")
    },
    // v19: IVF-PQ RESIDUAL ADC — the production composition of v3's coarse
    // quantizer and v12's product quantizer (the FAISS IVFPQ shape): PQ
    // codes quantize the RESIDUAL v − centroid(cell), not the raw vector.
    // Residuals concentrate near zero once the coarse quantizer has
    // absorbed the cluster mean, so the same 4-byte code budget spends its
    // 16 codewords on a much tighter distribution — the reason every
    // production IVF index encodes residuals. Search = v3's 2-cell probe
    // restricted scan × v12's ADC ordering (query vs reconstructed
    // centroid + sub-codes) → exact-cosine rerank of the PqCand pool.
    // Scale shape (100 TB): cell assignment and PQ encoding are pure
    // projections against literal/broadcast model state (centroids k×dim,
    // codebooks M×16×16 doubles) — no shuffle; the ADC scan touches only
    // the ~2/k of the code table in probed cells (inverted-file property)
    // at ~4 B/vector of index payload; only PqCand full vectors per query
    // are read at rerank. Determinism: every dot is the shared serial
    // fold; argmin ties break on code asc, rank ties on vec_id asc — the
    // codebook seeds are the residuals of rows vec_id < PqKs under the
    // SAME assignment math, so both engines derive identical model state.
    "v19_ivfpq_ann" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .select($"vec_id", $"v", $"norm2")
      val cents = Quantizer.centroidsFor(e, dir, iters = 2, dim = 64)
      val centsDf = broadcast(
        cents.map(c => (c.cell, c.cv.toSeq)).toDF("cell", "cv"))
      val books = pqResidualBooksFor(e, dir, cents)
      val data = Quantizer.assign(e, cents)
        .join(centsDf, Seq("cell"))
        .withColumn("r", expr("zip_with(v, cv, (x, c) -> x - c)"))
        .select($"cell", $"vec_id", $"cv", $"r")
      def sub(m: Int) = slice($"r", m * PqSub + 1, PqSub)
      def pick(m: Int) = array_min(array(books(m).map { c =>
        struct(
          (lit(c.cn2) - lit(2.0) * graft.functions.VectorExprs.dot(
            sub(m), typedLit(c.csub.toSeq))).as("score"),
          lit(c.code).as("code"),
          typedLit(c.csub.toSeq).as("csub"))
      }: _*))
      val coded = data.withColumn("rsub",
          flatten(array((0 until PqM).map(m => pick(m).getField("csub")): _*)))
        .withColumn("recon", expr("zip_with(cv, rsub, (a, b) -> a + b)"))
        .withColumn("rn2", graft.functions.VectorExprs.dot($"recon", $"recon"))
        .select($"cell", $"vec_id", $"recon", $"rn2")
      val probes = Quantizer.probe(e.filter($"vec_id" < 10), cents, nProbe = 2)
        .select($"cell", $"vec_id".as("q_id"), $"v".as("qv"), $"norm2".as("qn"))
      val wCand = Window.partitionBy($"q_id").orderBy($"adc".desc, $"vec_id")
      val cand = coded.join(broadcast(probes), Seq("cell"))
        .filter($"vec_id" =!= $"q_id")
        .withColumn("adc", graft.functions.VectorExprs.cosine(
          $"qv", $"recon", $"qn", $"rn2"))
        .withColumn("crank", row_number().over(wCand))
        .filter($"crank" <= PqCand)
        .select($"q_id", $"qv", $"qn", $"vec_id")
      val wTop = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
      cand.join(e, Seq("vec_id"))
        .withColumn("cos", graft.functions.VectorExprs.cosine(
          $"qv", $"v", $"qn", $"norm2"))
        .withColumn("rank", row_number().over(wTop))
        .filter($"rank" <= K)
        .select($"q_id", $"rank".cast("long").as("rank"),
                $"vec_id".as("neighbor_id"), $"cos")
        .orderBy($"q_id", $"rank")
    },
    // v13: HYBRID RETRIEVAL via RECIPROCAL-RANK FUSION — the production
    // search shape: a LEXICAL ranking (shingle-hash Jaccard against the
    // query document, d4's capped-join kernel pointed query-vs-corpus
    // instead of all-pairs) fused with a SEMANTIC ranking (v1's exact
    // cosine top-k, composed AS SHIPPED through the query map) by
    // RRF(d) = Σ_lists 1/(60 + rank_list(d)) — rank-only fusion, so the
    // two scores never need a common scale. Determinism: each RRF term is
    // ONE exact-IEEE division of integers and the fusion ONE addition in
    // fixed (keyword, embedding) order, so scores are engine-bitwise;
    // ties (e.g. kw-only rank r vs em-only rank r) break on doc_id.
    // Scale shape (100 TB): the lexical side shuffles only 8-byte shingle
    // hashes with the d4 stop-shingle cap (df ≤ MaxDf kills the quadratic
    // boilerplate bucket); the semantic side is v1's broadcast + partial
    // top-k heaps; fusion itself touches ≤ 2k rows per query — a full
    // outer join of two k-row lists, independent of corpus size.
    "v13_rrf_fusion" -> { (s, dir) =>
      import s.implicits._
      val sh = Tables(s, dir).documents
        .select($"doc_id", TextKernels.shingleHashesUdf($"text").as("hs"))
        .select($"doc_id", size($"hs").cast("long").as("n_sh"), $"hs")
      val wH = Window.partitionBy($"h")
      val ex = sh.select($"doc_id", $"n_sh", explode($"hs").as("h"))
        .withColumn("df", count(lit(1)).over(wH))
        .filter($"df" <= Dedup.MaxDf)
        .drop("df")
        // consumed by the query-side filter AND the corpus-side join —
        // unpersisted, the shingle-hash UDF + explode + df-cap window ran
        // twice (round-14, the d16 multi-consumer discipline)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val q = ex.filter($"doc_id" < 10)
        .select($"doc_id".as("q_id"), $"n_sh".as("qn"), $"h")
      val wKw = Window.partitionBy($"q_id").orderBy($"jaccard".desc, $"doc_id")
      val kw = ex.join(q, Seq("h"))
        .filter($"doc_id" =!= $"q_id")
        .groupBy($"q_id", $"doc_id", $"qn", $"n_sh")
        .agg(count(lit(1)).as("n_inter"))
        .withColumn("jaccard",
          $"n_inter".cast("double") / ($"qn" + $"n_sh" - $"n_inter"))
        .withColumn("krank", row_number().over(wKw).cast("long"))
        .filter($"krank" <= K)
        .select($"q_id", $"doc_id", $"krank")
      val em = queries("v1_brute_topk")(s, dir)
        .select($"q_id", $"neighbor_id".as("doc_id"), $"rank".as("erank"))
      val wR = Window.partitionBy($"q_id").orderBy($"rrf".desc, $"doc_id")
      kw.join(em, Seq("q_id", "doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / ($"krank" + 60), lit(0.0)) +
            coalesce(lit(1.0) / ($"erank" + 60), lit(0.0)))
        .withColumn("rank", row_number().over(wR).cast("long"))
        .filter($"rank" <= K)
        .select($"q_id", $"rank", $"doc_id",
                coalesce($"krank", lit(0L)).as("kw_rank"),
                coalesce($"erank", lit(0L)).as("em_rank"), $"rrf")
        .orderBy($"q_id", $"rank")
    },
    // v28: TRIANGLE COUNTING on the kNN graph — the local-density signal
    // (clustering structure) a curation pipeline reads next to v7's
    // centrality and v14's communities: a vector in many triangles sits in
    // a tight semantic clique (redundancy candidate); triangle-free nodes
    // are isolates/bridges. DEGREE-ORDERED orientation (Schank–Wagner /
    // Cohen's MapReduce form): each undirected edge points from its
    // lower-(degree, id) endpoint, so every wedge enumerates at the
    // triangle's LOWEST-degree apex and total wedge work is O(m^1.5)
    // instead of Σdeg² — the hub-safe bound that survives skewed degree
    // distributions at 100 TB. Closure is an equi-join against the
    // canonical (min,max) edge table; every join carries 8-byte ids only.
    // The oracle recomputes triangles order-free as a<b<c joins.
    "v28_triangle_count" -> { (s, dir) =>
      import s.implicits._
      val g = stagedKnnGraph(s, dir).select($"src_id", $"neighbor_id")
      val und = g.select(least($"src_id", $"neighbor_id").as("a"),
                         greatest($"src_id", $"neighbor_id").as("b"))
        .filter($"a" =!= $"b").distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val deg = und.select(explode(array($"a", $"b")).as("v"))
        .groupBy($"v").agg(count(lit(1)).as("d"))
      val or = und
        .join(deg.select($"v".as("a"), $"d".as("da")), Seq("a"))
        .join(deg.select($"v".as("b"), $"d".as("db")), Seq("b"))
        .select(when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"),
            struct($"a".as("s"), $"b".as("t")))
          .otherwise(struct($"b".as("s"), $"a".as("t"))).as("e"))
        .select($"e.s".as("s"), $"e.t".as("t"))
      val wedges = or.as("x").join(or.as("y"),
          col("x.s") === col("y.s") && col("x.t") < col("y.t"))
        .select(col("x.s").as("va"), col("x.t").as("vb"), col("y.t").as("vc"))
      val tri = wedges.join(und,
          least($"vb", $"vc") === $"a" && greatest($"vb", $"vc") === $"b")
        .select($"va", $"vb", $"vc")
      tri.select(explode(array($"va", $"vb", $"vc")).as("vec_id"))
        .groupBy($"vec_id").agg(count(lit(1)).as("n_triangles"))
        .orderBy($"vec_id")
    },
    // v14: COMMUNITY DETECTION on the kNN graph — bounded-round min-label
    // propagation over the STORED edge table (v5's graph, read from
    // scratch parquet exactly like v7): symmetrize the top-3 edges, then
    // 2 unrolled rounds of label(v) ← min(label(v), min_{u∈N(v)} label(u)).
    // The integer-exact sibling of d7's pointer-jumping CC, pointed at the
    // similarity graph instead of dup pairs — the clusters a curation
    // pipeline samples across for diversity. Scale shape (100 TB): each
    // round is ONE join + min-aggregate keyed by vertex id (labels are
    // 8-byte longs, the decoded vectors never move); rounds unroll like
    // v7's power iteration, and a deployment runs O(log n) rounds with
    // the d7 convergence loop.
    "v14_label_prop" -> { (s, dir) =>
      import s.implicits._
      val g = stagedKnnGraph(s, dir).select($"src_id", $"neighbor_id")
      val und = g.unionByName(
          g.select($"neighbor_id".as("src_id"), $"src_id".as("neighbor_id")))
        .distinct()
      val s0 = und.select($"src_id".as("id")).distinct()
        .withColumn("lbl", $"id")
      def step(l: DataFrame): DataFrame = {
        val nmin = und
          .join(l.select($"id".as("neighbor_id"), $"lbl".as("nlbl")),
                Seq("neighbor_id"))
          .groupBy($"src_id".as("id")).agg(min($"nlbl").as("nmin"))
        l.join(nmin, Seq("id"), "left")
          .select($"id", least($"lbl", coalesce($"nmin", $"lbl")).as("lbl"))
      }
      val s2 = step(step(s0))
      val sizes = s2.groupBy($"lbl").agg(count(lit(1)).as("community_size"))
      s2.join(sizes, Seq("lbl"))
        .select($"id".as("vec_id"), $"lbl".as("community"), $"community_size")
        .orderBy($"vec_id")
    },
    // v25: PERSONALIZED PAGERANK (seed-teleport power iteration,
    // integer-exact) — v7 measures GLOBAL centrality ("which nodes are
    // hubs"); the retrieval question is PERSONALIZED relevance: random
    // walks that restart at a query SEED SET rank nodes by multi-hop
    // proximity to the seeds — graph-structural expansion beyond what
    // one beam walk (v16) reaches, the classic recommendation /
    // related-docs primitive. Three unrolled iterations of
    // r' = 0.15·[id ∈ S]/|S| + 0.85·Σ r(u)/deg(u) over the STORED kNN
    // edges (v5's table), 1e12-scaled BIGINT with `div` — each node's
    // contribution is divided ONCE on the source side, so both engines
    // truncate identically and ranks match bit-for-bit. Unlike v7's
    // dense vector, the PPR mass is SPARSE: only the seeds' k-hop ball
    // ever holds rank, and the zero-contribution filter keeps each
    // iteration's shuffle at |reachable ball| rows, not |V| — at 100 TB
    // the cost tracks the seed neighborhood, not the corpus. Teleport
    // is rebuilt per round from the seed frame (a full-outer merge), so
    // untouched nodes never materialize at all.
    "v25_pagerank" -> { (s, dir) =>
      import s.implicits._
      pprRanks(s, dir, iters = 3)
        .filter($"id" >= 10)
        .select($"id".as("vec_id"), $"rank".as("rank_scaled"))
        .orderBy($"rank_scaled".desc, $"vec_id")
        .limit(20)
    },
    // v27: PPR ITERATION-DEPTH SWEEP — the measured-dial convention
    // (v22 probes, v26 hops, d20 bands) applied to v25's one free
    // parameter: how many power iterations until the personalized
    // top-20 stops moving? Each depth's non-seed top-20 is scored
    // against the 4-iteration reference (overlap out of 20) next to
    // the reached-ball size — the dial a deployment reads before
    // fixing its fixpoint threshold. Reuses pprRanks verbatim (v25's
    // defaults unchanged); cost is ≤4 sparse iterations, each a
    // seed-ball-bounded join like v25's own.
    "v27_ppr_sweep" -> { (s, dir) =>
      import s.implicits._
      // each depth's ranks are the previous depth's plus one step —
      // pprRanksAll materializes each level once and feeds it into the
      // next step instead of replaying the whole chain per sweep point
      val levels = pprRanksAll(s, dir, 4)
      def top20(r: DataFrame): DataFrame = r.filter($"id" >= 10)
        .orderBy($"rank".desc, $"id").limit(20).select($"id")
      val ref = top20(levels(3))
      (1 to 3).map { k =>
        levels(k - 1).filter($"id" >= 10)
          .agg(count(lit(1)).as("n_reached"))
          .crossJoin(broadcast(top20(levels(k - 1)).join(ref, Seq("id"))
            .agg(count(lit(1)).as("n_hits"))))
          .select(lit(k.toLong).as("iters"), $"n_reached", $"n_hits",
                  expr("n_hits * 10000 div 20").as("overlap_bp"))
      }.reduce(_ unionByName _).orderBy($"iters")
    },
    // v16: GRAPH-BASED ANN SEARCH — the retrieval step that completes the
    // graph-index lifecycle (v5 build → v9 maintain → v16 SEARCH → v11-style
    // evaluate): greedy beam search over the STORED edge table, the
    // HNSW/NSG-family query shape re-expressed as bounded relational hops.
    // The walk starts at the query's own node (in-corpus queries — the
    // semantic-dedup / related-docs case), expands SYMMETRIZED stored edges
    // for BeamHops unrolled rounds (v7's unrolled-rounds convention),
    // keeps the BeamW best-scored visited nodes as the next frontier, and
    // finally exact-reranks the whole visited set to top-K. Monotone
    // best-first with full visited memory: frontier_i = top-BeamW of
    // visited_i — deterministic, and every cosine is the serial-fold
    // kernel with vec_id tiebreaks, so DuckDB replays the walk bitwise.
    // Scale shape (100 TB): per query the frontier is ≤ BeamW ids and the
    // visited set ≤ 1 + BeamHops·BeamW·deg ids — corpus-size-INDEPENDENT;
    // each hop is one broadcast join of the tiny frontier against the
    // edge table (partitioned by src_id in a deployment = point lookups)
    // plus one id-pruned vector fetch for scoring (the index-lookup
    // analog; vectors never cross a shuffle). Reachability is bounded by
    // the stored graph's in-cell edges — the recall floor GraphAnnSpec
    // pins vs v1 measures exactly that index property (the v3 1-probe
    // analog); a deployment widens it with cross-cell long links at
    // build time, which changes the EDGE TABLE, not this search.
    "v16_graph_beam_search" -> { (s, dir) =>
      import s.implicits._
      graphBeamSearch(s, dir, stagedKnnGraph(s, dir)
        .select($"src_id", $"neighbor_id"))
    },
    // v17: v16 over a LONG-LINK-AUGMENTED graph — the NSW-style escalation
    // v16's scaladoc promises: the stored in-cell edges leave the graph
    // DISCONNECTED across IVF cells (v16's recall ceiling), so the build
    // adds one chain link per node (vec_id → vec_id+1 where it exists).
    // vec_ids are assigned independently of embedding geometry, so
    // id-adjacency IS a random long-range link — the classic
    // small-world/NSW construction — and the chain makes the whole graph
    // connected: the walk can now cross cells toward the query's true
    // neighborhood. Pure build-time change; the SEARCH is v16's verbatim
    // (same hops, same frontier, same rerank), which is the point — a
    // deployment tunes recall by re-building edges, not re-writing the
    // query. Chain links cost one id-shifted self-semi-join at build
    // time; GraphAnnSpec pins that recall(v17) ≥ recall(v16) on average.
    "v17_graph_search_longlinks" -> { (s, dir) =>
      graphBeamSearch(s, dir, v17Edges(s, dir))
    },
    // v23: HIERARCHICAL (HNSW-shape) ENTRY ROUTING over the stored v5
    // edge table — the missing coarse layer: v16 enters at the query's
    // OWN node (cell-seeded: its reachable ball is its quantizer cell)
    // and v17 papers over the disconnect with chain long-links the walk
    // must wander across. v23 instead routes DOWN a CENTROID-LEVEL graph:
    //   layer 1 (coarse): the k centroids' top-3 cosine graph — model
    //     state (k ≤ N/CellTarget rows), built on the DRIVER like the
    //     quantizer itself; descent starts at a fixed global entry (min
    //     cell) and greedily hops RouteHops unrolled rounds to the best
    //     centroid (monotone: the current cell stays in the candidate
    //     set, so a local optimum is a fixed point);
    //   layer 0 (base): entry = the MEDOIDS (per-cell argmax cosine to
    //     the centroid — one aggregate, k rows, computed at build time)
    //     of the 2 best cells the descent VISITED, plus the query's own
    //     node (in-corpus queries — v16's convention); the walk from
    //     there is v16's verbatim beam search over the PURE v5 edges —
    //     no chain crutch, so every frontier expansion follows real
    //     nearest-neighbor edges.
    // Scale shape (100 TB): routing touches k-row metadata frames only
    // (broadcast joins, RouteHops ≈ log diameter); the per-query base
    // walk is corpus-size-independent like v16's but over a LOWER-degree
    // graph — GraphAnnSpec pins recall ≥ v17's AND touched frontier
    // edges < v17's on the same queries.
    "v23_graph_hier_route" -> { (s, dir) =>
      graphBeamSearch(s, dir, v5Edges(s, dir), Some(hierRouteSeed(s, dir)))
    },
    // v24: MEMORY-BOUNDED GRAPH WALK (DiskANN's query shape) — v16's beam
    // search with the frontier hops scored against the PQ-RECONSTRUCTED
    // vectors (v12's 4 B/vector codes, dequantized) instead of the full
    // 512 B float64 rows; queries stay EXACT (asymmetric distance, v12's
    // convention) and the FINAL top-K exact-reranks the visited set
    // against true vectors, so the emitted cosines are exact — only the
    // NAVIGATION is approximate. This is what makes a graph index fit in
    // RAM at 100 TB: the hot loop (frontier expansion + scoring) touches
    // codes 128× smaller than the vectors; full vectors are read once
    // per visited id at the end, not per hop. Same edges, same seed,
    // same hop/frontier budget as v16 — recall differences isolate the
    // quantization, which GraphAnnSpec measures and floors.
    "v24_pq_graph_search" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .select($"vec_id", $"v", $"norm2")
      val recon = pqReconFrame(e, dir)
        .select($"vec_id", $"recon".as("v"), $"rn2".as("norm2"))
      beamWalk(s, dir, v5Edges(s, dir), None, countTouched = false,
        hopRel = Some(recon))._1
    },
    // v6: EMBEDDING AGGREGATION — element-wise centroid of the embedding
    // column per group (here: the doc's source, via doc_id = vec_id), the
    // statistic diversity analysis and cluster monitoring consume.
    // posexplode → groupBy (group, dim) is the scale shape: the shuffle
    // key carries the dimension index, so a 64-dim corpus aggregates as 64
    // independent partial sums (map-side combined) — never a whole-vector
    // reduce on one key. Elements go through the Quantizer's fixed-point
    // projection (round(x·2²⁴) → BIGINT, proven engine-identical by the
    // v3/d5 gates), so the per-group sums are EXACT under any partition
    // order; centroid = fixed-point sums + count (the partial-aggregate
    // form — mean is sum/(n·2²⁴) downstream).
    "v6_source_centroids" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val joined = t.embeddings.join(
        t.documents.select($"doc_id".as("vec_id"), $"source"), Seq("vec_id"))
      joined
        .select($"source", posexplode($"embedding").as(Seq("dim", "x")))
        .withColumn("q", expr(s"cast(round(x * ${Quantizer.Scale}) as bigint)"))
        .groupBy($"source", $"dim")
        .agg(sum($"q").as("sq"), count(lit(1)).as("n"))
        .groupBy($"source")
        .agg(max($"n").as("n_vectors"),
             array_join(array_sort(collect_list(
               concat(lpad($"dim".cast("string"), 2, "0"), lit(":"),
                      $"sq".cast("string")))), ",").as("centroid_fp"))
        .orderBy($"source")
    }
  )

  /** v16/v17's shared walk: symmetrize `edges`, beam-search BeamHops
    * unrolled rounds from each query's own node (frontier = BeamW
    * best-scored visited ids), exact-rerank the visited set to top-K.
    * Deterministic: serial-fold cosines, vec_id tiebreaks. */
  /** Per-source top-3 of a scored (srcCol, nb_id, cos) pair table, via the
    * partial-aggregate TopK kernel (v9's edge ranking). */
  private def top3(scored: DataFrame, srcCol: String): DataFrame = {
    import scored.sparkSession.implicits._
    scored.groupBy(col(srcCol))
      .agg(graft.functions.TopK.topK3($"cos", $"nb_id").as("top"))
      .select(col(srcCol).as("src_id"), posexplode($"top").as(Seq("idx", "nb")))
      .select($"src_id", ($"idx" + 1).cast("long").as("rank"),
              $"nb.vec_id".as("neighbor_id"), $"nb.cos".as("cos"))
  }

  /** v9's stored graph: in-cell top-3 WITHIN the index partition (v5's
    * build, run once at index-build time). Staged to scratch parquet once
    * per session — the persisted-edge-table stand-in; the incremental
    * operators' cost is the UPDATE/SEARCH, not rebuilding the index they
    * read. Parquet round-trips IEEE doubles bit-exact, so downstream
    * re-ranks stay oracle-identical. Shared by v9 (incremental update) and
    * e27 (stream-fed search over the growing graph). */
  private[catalog] def stagedIndexKnnGraph(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val path = graft.Scratch.staged(s"knn_graph#$dir", "knn_graph") { p =>
      val all = Tables(s, dir).embeddings
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .select($"vec_id", $"v", $"norm2")
      val idx = all.filter(pmod($"vec_id", lit(10)) =!= 7)
      val cents = Quantizer.centroidsOnIndexFor(idx, dir, "idx7", iters = 2, dim = 64)
      val data = Quantizer.assign(idx, cents)
        .select($"cell", $"vec_id", $"v", $"norm2")
      val srcSide = data.select($"cell", $"vec_id".as("s_id"),
        $"v".as("sv"), $"norm2".as("sn"))
      top3(
        data.join(srcSide, Seq("cell")).filter($"vec_id" =!= $"s_id")
          .withColumn("cos",
            graft.functions.VectorExprs.cosine($"sv", $"v", $"sn", $"norm2"))
          .select($"s_id", $"vec_id".as("nb_id"), $"cos"), "s_id")
        .write.mode("overwrite").parquet(p)
    }
    graft.Scratch.parquet(s, path)
  }

  private[catalog] def graphBeamSearch(s: SparkSession, dir: String,
                              edges: DataFrame,
                              seed: Option[DataFrame] = None): DataFrame =
    beamWalk(s, dir, edges, seed, countTouched = false)._1

  /** The walk core. `seed` overrides the default own-node entry (v23's
    * routed medoids); `countTouched` additionally counts frontier×edge
    * expansion rows per hop (extra count() actions — GraphAnnSpec's
    * v23-vs-v17 efficiency pin only, never the query path). `hopRel`
    * overrides the CANDIDATE-side vectors the frontier hops score
    * against (v24's PQ reconstructions — queries stay exact and the
    * FINAL rerank always reads true vectors, v12's asymmetric-distance
    * convention); None scores hops exactly (v16/v17/v23). */
  private[graft] def beamWalk(s: SparkSession, dir: String, edges: DataFrame,
      seed: Option[DataFrame], countTouched: Boolean,
      hopRel: Option[DataFrame] = None,
      hops: Int = BeamHops): (DataFrame, Long) = {
    import s.implicits._
    val e = Tables(s, dir).embeddings
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
      .select($"vec_id", $"v", $"norm2")
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"norm2".as("qn"))
    // persisted (round-14, guide §2.4/§3.3): the fold below references the
    // undirected working set once PER HOP, and because each hop's `vis` is
    // itself consumed twice (next hop's union AND the beam's rerank), the
    // unpersisted plan re-executed this distinct — a full shuffle of the
    // edge table — 2^hops-1 ≈ 7 times per walk. One materialization is the
    // index's own undirected view; at scale that is build-time state a
    // deployment stores next to the graph, never per-query work.
    val und = edges.unionByName(
        edges.select($"neighbor_id".as("src_id"), $"src_id".as("neighbor_id")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def score(rel: DataFrame)(ids: DataFrame): DataFrame =
      ids.join(rel, Seq("vec_id")).join(broadcast(q), Seq("q_id"))
        .withColumn("cos",
          graft.functions.VectorExprs.cosine($"qv", $"v", $"qn", $"norm2"))
    val hopScore = score(hopRel.getOrElse(e)) _
    val wB = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
    val v0 = seed.map(_.select($"q_id", $"vec_id").distinct())
      .getOrElse(q.select($"q_id", $"q_id".as("vec_id")))
    var touched = 0L
    val (visited, _) = (1 to hops).foldLeft((v0, v0)) {
      case ((vis, beam), _) =>
        val cand = und
          .join(broadcast(beam.select($"q_id", $"vec_id".as("src_id"))),
                Seq("src_id"))
          .select($"q_id", $"neighbor_id".as("vec_id"))
        if (countTouched) touched += cand.count()
        // persisted: vis2 feeds BOTH the next hop's union and this hop's
        // beam rerank — unpersisted, hop i re-ran every hop < i's subtree
        // (visited-set recomputation doubled per hop). The visited set is
        // corpus-size-independent (≤ queries × Σ frontier expansions), so
        // this is bounded small state at any scale.
        val vis2 = vis.unionByName(cand).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val beam2 = hopScore(vis2)
          .withColumn("rk", row_number().over(wB)).filter($"rk" <= BeamW)
          .select($"q_id", $"vec_id")
        (vis2, beam2)
    }
    val out = score(e)(visited.filter($"vec_id" =!= $"q_id"))
      .withColumn("rank", row_number().over(wB).cast("long"))
      .filter($"rank" <= K)
      .select($"q_id", $"rank", $"vec_id".as("neighbor_id"), $"cos")
      .orderBy($"q_id", $"rank")
    (out, touched)
  }

  /** v23's coarse-descent depth is DERIVED from the trained centroid
    * count: ceil(log2 k) + 1 ≈ the top-3 centroid graph's log diameter —
    * the round-8 constant 4 could not grow with k (round-9 advice #5).
    * Integer-exact on both engines: Scala uses numberOfLeadingZeros,
    * DuckDB `length(bin(k-1))` — no floating log2 whose low bits could
    * disagree at exact powers of two. The oracle's CTE chain is unrolled
    * statically to RouteHopsMax with each hop GATED on the in-SQL derived
    * depth (an inactive hop carries the previous route through unchanged,
    * a fixed point of the monotone descent), so one static SQL string
    * replays any depth ≤ the cap. */
  private val RouteHopsMax = 12

  /** ceil(log2(max(k,2))) + 1, clamped to the oracle's static unroll. */
  private[graft] def routeHopsFor(k: Int): Int =
    math.min(RouteHopsMax,
      (32 - Integer.numberOfLeadingZeros(math.max(k, 2) - 1)) + 1)

  /** The stored v5 edge table (v16/v23's base layer). */
  private[graft] def v5Edges(s: SparkSession, dir: String): DataFrame =
    stagedKnnGraph(s, dir).select(col("src_id"), col("neighbor_id"))

  /** v17's graph: v5 edges ∪ the id-chain long links. */
  private[graft] def v17Edges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables(s, dir).embeddings.select($"vec_id")
    val chain = ids.select($"vec_id".as("src_id"),
        ($"vec_id" + 1).as("neighbor_id"))
      .join(ids.select($"vec_id".as("neighbor_id")), Seq("neighbor_id"))
      .select($"src_id", $"neighbor_id")
    v5Edges(s, dir).unionByName(chain)
  }

  /** Per-(dir) memo of v23's medoid map — index-BUILD-time state like the
    * stored v5 edge table (the full-corpus assignment pass is the build's
    * cost, not the query's); k rows, the Quantizer driver-state budget. */
  private val medoids =
    new scala.collection.concurrent.TrieMap[String, Map[Int, Long]]

  /** v23's routed entry seed: (q_id, vec_id) — the medoids of the 2 best
    * cells the coarse descent visits, plus the query's own node (scaladoc
    * on the v23 entry). The WHOLE coarse layer is metadata: k centroids
    * (the trained Quantizer model), their top-3 cosine graph, k medoids,
    * and 10 query vectors — so the descent runs ON THE DRIVER, exactly
    * where HNSW keeps its upper layers (an in-memory navigation
    * structure; a cluster run broadcasts the same k-row tables). All
    * arithmetic is the serial-fold dot + IEEE sqrt/divide the SQL twin
    * uses, with (cos desc, cell asc) tiebreaks — the oracle replays the
    * descent relationally and matches bitwise. */
  private[graft] def hierRouteSeed(s: SparkSession, dir: String,
      hopsOverride: Option[Int] = None): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir).embeddings
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
      .select($"vec_id", $"v", $"norm2")
    val cents = Quantizer.centroidsFor(e, dir, iters = 2, dim = 64)
    // serial-fold dot, identical op order to Tx.dotSql / VectorExprs.dot —
    // every driver-side cos matches its SQL twin bitwise
    def sdot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc = acc + a(i) * b(i); i += 1 }
      acc
    }
    // coarse graph: top-3 neighbors per centroid (k² driver cosines)
    val cg: Map[Int, Seq[Int]] = cents.map { a =>
      a.cell -> cents.filter(_.cell != a.cell)
        .map(b => (b.cell, sdot(a.cv, b.cv) /
          (math.sqrt(a.cn2) * math.sqrt(b.cn2))))
        .sortBy { case (cell, c) => (-c, cell) }
        .take(3).map(_._1)
    }.toMap
    // per-cell entry node: argmax cos(v, centroid), vec_id tiebreak — one
    // corpus aggregate at build time, memoized per (JVM, dir)
    val med: Map[Int, Long] = medoids.getOrElseUpdate(dir, {
      val centsDf = broadcast(
        cents.map(c => (c.cell, c.cv.toSeq, c.cn2)).toDF("cell", "cv", "cnorm2"))
      Quantizer.assign(e, cents).join(centsDf, Seq("cell"))
        .withColumn("mcos",
          graft.functions.VectorExprs.cosine($"v", $"cv", $"norm2", $"cnorm2"))
        .groupBy($"cell")
        .agg(min(struct((-$"mcos").as("neg"), $"vec_id".as("vec_id"))).as("m"))
        .select($"cell", $"m.vec_id".as("vec_id"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    })
    val qRows = e.filter($"vec_id" < 10).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val entryCell = cents.map(_.cell).min
    val centByCell = cents.map(c => c.cell -> c).toMap
    val seeds = qRows.flatMap { case (qid, qv, qn) =>
      def ccos(cell: Int): Double = {
        val c = centByCell(cell)
        sdot(qv, c.cv) / (math.sqrt(qn) * math.sqrt(c.cn2))
      }
      var route = entryCell
      var vis = Set(route)
      (1 to hopsOverride.getOrElse(routeHopsFor(cents.length))).foreach { _ =>
        val cand = (Seq(route) ++ cg(route)).distinct
        vis ++= cand
        route = cand.map(c => (c, ccos(c)))
          .sortBy { case (cell, c) => (-c, cell) }.head._1
      }
      val entry = vis.toSeq.map(c => (c, ccos(c)))
        .sortBy { case (cell, c) => (-c, cell) }.take(2).map(_._1)
      // in-corpus queries keep their own node as an entry too (v16's
      // convention — "related docs" starts at the doc); the routed
      // medoids ADD the cross-cell reach that v17 bought with chain links
      (entry.map(med) :+ qid).map(vid => (qid, vid))
    }
    seeds.toSeq.toDF("q_id", "vec_id")
  }

  /** v25/v27's shared seed-teleport PPR: `iters` sparse power iterations
    * over the stored kNN edges, 1e12-scaled BIGINT with one source-side
    * `div` per node per round (see the v25 entry comment). Returns the
    * final sparse (id, rank) frame — seeds ∪ the reached ball. */
  private def pprParts(s: SparkSession,
                       dir: String): (DataFrame, DataFrame => DataFrame) = {
    import s.implicits._
    val edges = stagedKnnGraph(s, dir)
      .select($"src_id".as("src"), $"neighbor_id".as("dst"))
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    val seeds = deg.filter($"src" < 10).select($"src".as("id"))
    val nS = seeds.agg(count(lit(1)).as("ns"))
    val r0 = seeds.crossJoin(broadcast(nS))
      .select($"id", expr("1000000000000 div ns").as("rank"))
    def step(r: DataFrame): DataFrame = {
      val c = r.join(deg.select($"src".as("id"), $"outdeg"), Seq("id"))
        .select($"id".as("src"),
                expr("(85 * rank) div (100 * outdeg)").as("c"))
        .filter($"c" > 0)
      val in = edges.join(c, Seq("src"))
        .groupBy($"dst".as("id")).agg(sum($"c").as("in_c"))
      val tele = seeds.crossJoin(broadcast(nS))
        .select($"id", expr("150000000000 div ns").as("t"))
      tele.join(in, Seq("id"), "full_outer")
        .select($"id",
          (coalesce($"t", lit(0L)) + coalesce($"in_c", lit(0L))).as("rank"))
    }
    (r0, step)
  }

  private def pprRanks(s: SparkSession, dir: String, iters: Int): DataFrame = {
    val (r0, step) = pprParts(s, dir)
    (1 to iters).foldLeft(r0)((r, _) => step(r))
  }

  /** The ranks after EACH of 1..n iterations, each level materialized
    * (x21's localCheckpoint convention) and fed into the next step — so
    * v27's sweep pays n steps total, not a fresh 1..k replay per level. */
  private def pprRanksAll(s: SparkSession, dir: String, n: Int): Seq[DataFrame] = {
    val (r0, step) = pprParts(s, dir)
    val out = Seq.newBuilder[DataFrame]
    var cur = r0
    for (_ <- 1 to n) { cur = step(cur).localCheckpoint(true); out += cur }
    out.result()
  }

  /** v5's graph persisted to scratch parquet once per session — the stored
    * edge table downstream graph consumers (v7 centrality) read, exactly as
    * a deployment reads the edge table the index build wrote. */
  private def stagedKnnGraph(s: SparkSession, dir: String): DataFrame = {
    val path = graft.Scratch.staged(s"knn_full#$dir", "knn_full") { p =>
      knnGraph(s, dir).write.mode("overwrite").parquet(p)
    }
    graft.Scratch.parquet(s, path)
  }

  /** v5's kNN graph: every vector's top-3 in-cell neighbors (see the v5
    * entry comment for the scale story); shared with v7's centrality. */
  private def knnGraph(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir).embeddings
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
      .select($"vec_id", $"v", $"norm2")
    val cents = Quantizer.centroidsFor(e, dir, iters = 2, dim = 64)
    val data = Quantizer.assign(e, cents)
      .select($"cell", $"vec_id", $"v", $"norm2")
    val src = data.select($"cell", $"vec_id".as("src_id"),
      $"v".as("sv"), $"norm2".as("sn"))
    data.join(src, Seq("cell"))
      .filter($"vec_id" =!= $"src_id")
      .withColumn("cos",
        graft.functions.VectorExprs.cosine($"sv", $"v", $"sn", $"norm2"))
      .groupBy($"src_id")
      .agg(graft.functions.TopK.topK3($"cos", $"vec_id").as("top"))
      .select($"src_id", posexplode($"top").as(Seq("idx", "nb")))
      .select($"src_id", ($"idx" + 1).cast("long").as("rank"),
              $"nb.vec_id".as("neighbor_id"), $"nb.cos".as("cos"))
  }

  /** v3: IVF ANN — coarse quantizer cells come from the ENGINE-COMPUTED
    * spherical k-means (Quantizer: integer-exact Lloyd updates, centroids
    * as driver state). Every vector is assigned to its nearest cell and
    * queries probe their 2 nearest cells — both pure per-row projections
    * over LITERAL centroids (no join, no window, no shuffle); the
    * exact-cosine rerank runs only inside the probed cells. The search join
    * keys on cell id, so each query touches ~2/8 of the corpus — the
    * inverted-file property. */
  // ---- v12 product quantization: M subspaces of PqSub dims, PqKs codes
  // each. Codebooks are model state (like the Quantizer's centroids):
  // sample-initialized from the sub-slices of seed rows vec_id < PqKs,
  // memoized per dir, inlined as literals into the encoding projection.
  private[graft] val PqM = 4
  private[graft] val PqSub = 16
  private[graft] val PqKs = 16
  private val PqCand = 50
  private case class PqCode(code: Int, csub: Array[Double], cn2: Double)
  private val pqBookCache =
    new scala.collection.concurrent.TrieMap[String, IndexedSeq[IndexedSeq[PqCode]]]
  /** v12's PQ encode as a frame: every vector's reconstruction
    * (concatenated chosen sub-centroids) + its squared norm — the
    * 4 B/vector index payload dequantized; shared by v12's ADC scan and
    * v24's PQ-scored walk. Pure projection against the literal codebooks
    * (model state), zero shuffle. */
  private def pqReconFrame(e: DataFrame, dir: String): DataFrame = {
    import e.sparkSession.implicits._
    val books = pqBooksFor(e, dir)
    def sub(m: Int) = slice($"v", m * PqSub + 1, PqSub)
    // per-subspace argmin over the 16 literal codes: min struct of
    // (score = |c|^2 - 2 t.c  [t-norm common to all codes], code, csub)
    def pick(m: Int) = array_min(array(books(m).map { c =>
      struct(
        (lit(c.cn2) - lit(2.0) * graft.functions.VectorExprs.dot(
          sub(m), typedLit(c.csub.toSeq))).as("score"),
        lit(c.code).as("code"),
        typedLit(c.csub.toSeq).as("csub"))
    }: _*))
    e.withColumn("recon",
        flatten(array((0 until PqM).map(m => pick(m).getField("csub")): _*)))
      .withColumn("rn2", graft.functions.VectorExprs.dot($"recon", $"recon"))
      .select($"vec_id", $"recon", $"rn2")
  }

  private def pqBooksFor(e: DataFrame, dir: String): IndexedSeq[IndexedSeq[PqCode]] =
    pqBookCache.getOrElseUpdate(dir, {
      val seeds = e.filter(col("vec_id") < PqKs).orderBy("vec_id")
        .select("vec_id", "v").collect()
      (0 until PqM).map { m =>
        seeds.toIndexedSeq.map { r =>
          val full = r.getSeq[Double](1).toArray
          val csub = java.util.Arrays.copyOfRange(full, m * PqSub, (m + 1) * PqSub)
          // serial left fold — the dotSql / DotProduct op order
          var s2 = 0.0; var i = 0
          while (i < csub.length) { s2 += csub(i) * csub(i); i += 1 }
          PqCode(r.getLong(0).toInt, csub, s2)
        }
      }.toIndexedSeq
    })

  // ---- v21 postings-store lifecycle: build partitionBy(cell) → tombstone
  // → dirty-cell-only dynamic-partition-overwrite compaction. Tombstones
  // are vec_id % 181 == 3 (the "deleted documents" set — id-only, 8 B/row).
  private[graft] def v21Tombstones(e: DataFrame): DataFrame =
    e.filter(pmod(col("vec_id"), lit(181)) === 3).select(col("vec_id"))

  /** The cell-partitioned postings store BEFORE any delete. */
  private[graft] def v21Postings(s: SparkSession, dir: String,
      e: DataFrame, cents: Seq[Quantizer.Centroid]): String =
    Scratch.staged(s"v21_postings#$dir", "v21_postings") { p =>
      Quantizer.assign(e, cents)
        .select(col("cell"), col("vec_id"), col("v"), col("norm2"))
        .write.partitionBy("cell").parquet(p)
    }

  /** Compact the postings store: rewrite ONLY the cell partitions that
    * contain a tombstoned vector (dynamic partition overwrite); clean
    * cells' files are copied once at staging and never touched again.
    * `tombOpt`/`tag` let AnnDeleteCompactSpec drive the fully-dead-cell
    * path with its own tombstone set. */
  private[graft] def compactedPostings(s: SparkSession, dir: String,
      e: DataFrame, cents: Seq[Quantizer.Centroid],
      tombOpt: Option[DataFrame] = None, tag: String = "v21"): String =
    Scratch.staged(s"${tag}_compact#$dir", s"${tag}_compact") { p =>
      val post = s.read.parquet(v21Postings(s, dir, e, cents))
      post.write.partitionBy("cell").parquet(p) // the live store pre-delete
      val tomb = tombOpt.getOrElse(v21Tombstones(e))
      val dirty = post.join(tomb, Seq("vec_id"), "left_semi")
        .select("cell").distinct()
      // derive the rewrite from the ORIGINAL store (never read the path
      // being overwritten): the dirty cells' surviving rows
      val rewritten = post
        .join(broadcast(dirty), Seq("cell"), "left_semi")
        .join(tomb, Seq("vec_id"), "left_anti")
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = s.conf.get(key)
      s.conf.set(key, "dynamic")
      try rewritten.select(col("vec_id"), col("v"), col("norm2"), col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(p)
      finally s.conf.set(key, prev)
      // dynamic overwrite replaces only partitions PRESENT in the written
      // data — a cell whose every row is tombstoned contributes no rows,
      // so its directory (full of deleted vectors) would survive. Delete
      // fully-dead cells explicitly; the residue pin (c8, the spec) is
      // only honest with this step.
      import s.implicits._
      val dead = dirty.join(rewritten.select("cell").distinct(),
        Seq("cell"), "left_anti").as[Int].collect()
      if (dead.nonEmpty) {
        val root = new org.apache.hadoop.fs.Path(p)
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        dead.foreach(c =>
          fs.delete(new org.apache.hadoop.fs.Path(root, s"cell=$c"), true))
      }
    }

  // ---- v19 residual PQ codebooks: seeds are the RESIDUALS (v − nearest
  // centroid) of rows vec_id < PqKs — the cell argmax runs driver-side with
  // the identical serial-fold cosine and (cos desc, cell asc) tiebreak the
  // distributed assignment uses, so the model is bitwise the one the
  // DuckDB twin derives from its assigned CTE.
  private val pqResBookCache =
    new scala.collection.concurrent.TrieMap[String, IndexedSeq[IndexedSeq[PqCode]]]
  private def pqResidualBooksFor(e: DataFrame, dir: String,
      cents: Seq[Quantizer.Centroid]): IndexedSeq[IndexedSeq[PqCode]] =
    pqResBookCache.getOrElseUpdate(dir, {
      val seeds = e.filter(col("vec_id") < PqKs).orderBy("vec_id")
        .select("vec_id", "v", "norm2").collect()
      val res = seeds.toIndexedSeq.map { r =>
        val full = r.getSeq[Double](1).toArray
        val n2 = r.getDouble(2)
        var bestCell = -1; var bestCos = Double.NegativeInfinity
        cents.sortBy(_.cell).foreach { c =>
          // serial left fold — the dotSql / VectorExprs op order
          var d = 0.0; var i = 0
          while (i < full.length) { d += full(i) * c.cv(i); i += 1 }
          val cos = d / (math.sqrt(n2) * math.sqrt(c.cn2))
          // NaN (zero-norm seed) ranks FIRST, like both twins' ORDER BY
          // cos DESC (Spark and DuckDB sort NaN greatest); strict > over
          // the cell-ascending scan keeps their `cell asc` tiebreak, and
          // bestCell can no longer stay -1 once any centroid exists.
          val key = if (cos.isNaN) Double.PositiveInfinity else cos
          if (key > bestCos) { bestCos = key; bestCell = c.cell }
        }
        val cv = cents.find(_.cell == bestCell).get.cv
        val rr = new Array[Double](full.length)
        var i = 0
        while (i < full.length) { rr(i) = full(i) - cv(i); i += 1 }
        (r.getLong(0).toInt, rr)
      }
      (0 until PqM).map { m =>
        res.map { case (code, rr) =>
          val csub = java.util.Arrays.copyOfRange(rr, m * PqSub, (m + 1) * PqSub)
          var s2 = 0.0; var i = 0
          while (i < csub.length) { s2 += csub(i) * csub(i); i += 1 }
          PqCode(code, csub, s2)
        }
      }.toIndexedSeq
    })

  private def ivfQuery(sampleMod: Int, nProbe: Int = 2):
      (SparkSession, String) => DataFrame = { (s, dir) =>
    import s.implicits._
    val e = Tables(s, dir).embeddings
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
      .select($"vec_id", $"v", $"norm2")
    val cents =
      if (sampleMod == 1) Quantizer.centroidsFor(e, dir, iters = 2, dim = 64)
      else Quantizer.centroidsSampledFor(e, dir, iters = 2, dim = 64, mod = sampleMod)
    val data = Quantizer.assign(e, cents)
      .select($"cell", $"vec_id", $"v", $"norm2")
    val probes = Quantizer.probe(e.filter($"vec_id" < 10), cents, nProbe = nProbe)
      .select($"cell", $"vec_id".as("q_id"), $"v".as("qv"), $"norm2".as("qn"))
    val wTop = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
    data.join(broadcast(probes), Seq("cell"))
      .filter($"vec_id" =!= $"q_id")
      .withColumn("cos",
        graft.functions.VectorExprs.cosine($"qv", $"v", $"qn", $"norm2"))
      .withColumn("rank", row_number().over(wTop))
      .filter($"rank" <= K)
      .select($"q_id", $"rank".cast("long").as("rank"),
              $"vec_id".as("neighbor_id"), $"cos")
      .orderBy($"q_id", $"rank")
  }

  /** v3/v4/v20 oracle: identical IVF SQL, differing only in the quantizer
    * training CTEs' sample filter and (v20) an extra predicate join on the
    * scanned cell entries. */
  private def ivfSql(sampleMod: Int, dataJoin: String = "",
                     nProbe: Int = 2): String = s"""
      WITH e AS (
        SELECT vec_id, v, ${dotSql("v", "v")} AS norm2
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t),
      ${Quantizer.centroidsSql(iters = 2, dim = 64, sampleMod = sampleMod)},
      assigned AS MATERIALIZED (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY acos DESC, cell) AS crank
        FROM (SELECT t.vec_id, c.cell,
                     ${dotSql("t.v", "c.cv")} / (sqrt(t.norm2) * sqrt(c.cnorm2)) AS acos
              FROM kq t CROSS JOIN kmc c) pp),
      data AS (
        SELECT a.cell, k.vec_id, k.v, k.norm2 FROM assigned a
        JOIN kq k ON k.vec_id = a.vec_id $dataJoin WHERE a.crank = 1),
      probes AS (
        SELECT a.cell, k.vec_id AS q_id, k.v AS qv, k.norm2 AS qn
        FROM assigned a JOIN kq k ON k.vec_id = a.vec_id
        WHERE a.crank <= $nProbe AND a.vec_id < 10)
      SELECT q_id, rank, neighbor_id, cos FROM (
        SELECT q_id, vec_id AS neighbor_id, cos,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        FROM (SELECT p.q_id, d.vec_id,
                     ${dotSql("p.qv", "d.v")} / (sqrt(p.qn) * sqrt(d.norm2)) AS cos
              FROM data d JOIN probes p ON d.cell = p.cell AND d.vec_id <> p.q_id) t0) t1
      WHERE rank <= $K ORDER BY q_id, rank"""

  /** Shared oracle CTEs: embeddings + trained cells + assignment + the
    * ranked top-3 in-cell kNN pairs (v5's graph, consumed by v5 and v7). */
  private[catalog] def knnCtes: String = s"""
      e AS (
        SELECT vec_id, v, ${dotSql("v", "v")} AS norm2
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t),
      ${Quantizer.centroidsSql(iters = 2, dim = 64, sampleMod = 1)},
      assigned AS MATERIALIZED (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY acos DESC, cell) AS crank
        FROM (SELECT t.vec_id, c.cell,
                     ${dotSql("t.v", "c.cv")} / (sqrt(t.norm2) * sqrt(c.cnorm2)) AS acos
              FROM kq t CROSS JOIN kmc c) pp),
      data AS MATERIALIZED (
        SELECT a.cell, k.vec_id, k.v, k.norm2 FROM assigned a
        JOIN kq k ON k.vec_id = a.vec_id WHERE a.crank = 1),
      knn AS MATERIALIZED (
        SELECT src_id, rank, neighbor_id, cos FROM (
          SELECT src_id, vec_id AS neighbor_id, cos,
                 row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, vec_id) AS rank
          FROM (SELECT s.vec_id AS src_id, d.vec_id,
                       ${dotSql("s.v", "d.v")} / (sqrt(s.norm2) * sqrt(d.norm2)) AS cos
                FROM data s JOIN data d ON s.cell = d.cell AND d.vec_id <> s.vec_id) t0) t1
        WHERE rank <= 3)"""

  /** v12's PQ encode as a CTE chain over `e`: codebooks from the first
    * PqKs rows, per-subspace argmin, reconstructions `precon(vec_id,
    * recon, rn2)` — shared by the v12 and v24 oracles. */
  private lazy val pqReconCtes: String = s"""
      pbooks AS (
        SELECT m, code, csub, ${dotSql("csub", "csub")} AS cn2 FROM (
          SELECT ms.m, s.vec_id AS code,
                 list_slice(s.v, ms.m * $PqSub + 1, (ms.m + 1) * $PqSub) AS csub
          FROM (SELECT vec_id, v FROM e WHERE vec_id < $PqKs) s
          CROSS JOIN (SELECT unnest(range(0, $PqM)) AS m) ms) z),
      pscored AS (
        SELECT vec_id, m, code, csub,
               cn2 - 2 * ${dotSql("tsub", "csub")} AS score
        FROM (SELECT t.vec_id, b.m, b.code, b.csub, b.cn2,
                     list_slice(t.v, b.m * $PqSub + 1, (b.m + 1) * $PqSub) AS tsub
              FROM e t CROSS JOIN pbooks b) z),
      pcoded AS (
        SELECT vec_id, m, csub FROM (
          SELECT vec_id, m, csub,
                 row_number() OVER (PARTITION BY vec_id, m
                   ORDER BY score ASC, code ASC) AS r
          FROM pscored) w WHERE r = 1),
      precon AS MATERIALIZED (
        SELECT vec_id, recon, ${dotSql("recon", "recon")} AS rn2 FROM (
          SELECT vec_id, flatten(list(csub ORDER BY m)) AS recon
          FROM pcoded GROUP BY vec_id) g)"""

  /** v16/v17 oracle: full beam-search replay over the edge pairs produced
    * by `edgeUnion` (symmetrized via DISTINCT in the `und` CTE). */
  private def beamSearchSql(edgeUnion: String): String =
    s"""
      WITH $knnCtes,
      ${beamWalkSql(edgeUnion, "e")}"""

  /** The beam walk as a WITH-list fragment (no leading WITH): und/q/vis/
    * beam chain over `edgeUnion`, every cosine scored against relation
    * `rel` (vec_id, v, norm2), ending in the final top-K SELECT. Callers
    * prepend their own CTEs — v16/v17 use the full-corpus `e`; e27 scores
    * against index ∪ streamed batch. */
  private[catalog] def beamWalkSql(edgeUnion: String, rel: String): String = s"""
      ${beamWalkCtes(edgeUnion, rel, "beamtop")}
      SELECT q_id, rank, neighbor_id, cos FROM beamtop ORDER BY q_id, rank"""

  /** The same walk as a pure CTE list ending in `$out` (q_id, rank,
    * neighbor_id, cos — top-K, unordered) so composed oracles (c6) can
    * join the search result instead of ending the query with it. */
  private[catalog] def beamWalkCtes(edgeUnion: String, rel: String,
                                    out: String,
                                    seedSql: String = "",
                                    hopRel: String = "",
                                    hops: Int = BeamHops): String = s"""
      und AS MATERIALIZED (
        SELECT DISTINCT src_id, neighbor_id FROM ($edgeUnion) u),
      q AS (SELECT vec_id AS q_id, v AS qv, norm2 AS qn FROM $rel WHERE vec_id < 10),
      vis0 AS (SELECT DISTINCT q_id, vec_id FROM (${
        if (seedSql.isEmpty) "SELECT q_id, q_id AS vec_id FROM q" else seedSql
      }) s0),
      beam0 AS (SELECT q_id, vec_id FROM vis0)
      ${(1 to hops)
        .map(i => beamHopSql(i, if (hopRel.isEmpty) rel else hopRel))
        .mkString(",", ",", "")},
      $out AS (
        SELECT q_id, rank, neighbor_id, cos FROM (
          SELECT z.q_id, z.vec_id AS neighbor_id, z.cos,
                 row_number() OVER (PARTITION BY z.q_id
                   ORDER BY z.cos DESC, z.vec_id) AS rank
          FROM (SELECT w.q_id, w.vec_id,
                       ${dotSql("p.qv", "d.v")} / (sqrt(p.qn) * sqrt(d.norm2)) AS cos
                FROM vis$hops w
                JOIN $rel d ON d.vec_id = w.vec_id
                JOIN q p ON p.q_id = w.q_id
                WHERE w.vec_id <> w.q_id) z) t
        WHERE rank <= $K)"""

  /** v23 oracle coarse hop i: candidate cells = current ∪ its centroid-
    * graph neighbors; the next route cell is the best-ccos candidate. */
  /** MATERIALIZED is load-bearing here: rcand$i references r${i-1} twice,
    * so un-materialized CTEs would inline into a 2^hops expression tree —
    * harmless at the old constant 4, exponential at the derived-depth
    * unroll cap. */
  private def routeHopSql(i: Int): String = s"""
      rcand$i AS MATERIALIZED (
        SELECT DISTINCT q_id, cell FROM (
          SELECT q_id, cell FROM r${i - 1}
          UNION ALL
          SELECT r.q_id, g.nb_cell AS cell
          FROM r${i - 1} r JOIN cg g ON g.src_cell = r.cell
          WHERE $i <= (SELECT h FROM dh)) u),
      r$i AS MATERIALIZED (
        SELECT q_id, cell FROM (
          SELECT c.q_id, c.cell,
                 row_number() OVER (PARTITION BY c.q_id
                   ORDER BY s.ccos DESC, c.cell) AS rk
          FROM rcand$i c JOIN qc s
            ON s.q_id = c.q_id AND s.cell = c.cell) t
        WHERE rk = 1)"""

  /** v16 oracle hop i: frontier expansion through `und`, visited-set union,
    * then the BeamW best-scored visited nodes become `beam$i`. */
  private def beamHopSql(i: Int, rel: String): String = s"""
      cand$i AS (
        SELECT DISTINCT b.q_id, u.neighbor_id AS vec_id
        FROM beam${i - 1} b JOIN und u ON u.src_id = b.vec_id),
      vis$i AS MATERIALIZED (
        SELECT q_id, vec_id FROM vis${i - 1}
        UNION SELECT q_id, vec_id FROM cand$i),
      beam$i AS MATERIALIZED (
        SELECT q_id, vec_id FROM (
          SELECT z.q_id, z.vec_id,
                 row_number() OVER (PARTITION BY z.q_id
                   ORDER BY z.cos DESC, z.vec_id) AS rk
          FROM (SELECT w.q_id, w.vec_id,
                       ${dotSql("p.qv", "d.v")} / (sqrt(p.qn) * sqrt(d.norm2)) AS cos
                FROM vis$i w
                JOIN $rel d ON d.vec_id = w.vec_id
                JOIN q p ON p.q_id = w.q_id) z) zz
        WHERE rk <= $BeamW)"""

  /** v10 oracle round: marginal score rel − max(sim to selected) over
    * unselected candidates, then the per-query argmax (vec_id tiebreak). */
  private def mmrRoundSql(selCte: String, outCte: String): String = s"""
      $outCte AS (
        SELECT q_id, vec_id, score FROM (
          SELECT t.q_id, t.vec_id, t.score,
                 row_number() OVER (PARTITION BY t.q_id
                   ORDER BY t.score DESC, t.vec_id) AS rk
          FROM (
            SELECT c.q_id, c.vec_id, c.rel - MAX(m.sim) AS score
            FROM cand c
            JOIN sim m ON m.q_id = c.q_id AND m.a_id = c.vec_id
            JOIN $selCte s ON s.q_id = m.q_id AND s.vec_id = m.b_id
            WHERE NOT EXISTS (SELECT 1 FROM $selCte s2
                              WHERE s2.q_id = c.q_id AND s2.vec_id = c.vec_id)
            GROUP BY c.q_id, c.vec_id, c.rel) t) t2
        WHERE rk = 1)"""

  val oracle: Map[String, String] = Map(
    "v10_mmr_diversify" -> s"""
      WITH n AS (
        SELECT vec_id, v, ${dotSql("v", "v")} AS norm2
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t),
      q AS (SELECT vec_id AS q_id, v AS qv, norm2 AS qn FROM n WHERE vec_id < 10),
      rel0 AS (
        SELECT q_id, vec_id, rel,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY rel DESC, vec_id) AS rk
        FROM (SELECT q.q_id, n.vec_id,
                     ${dotSql("q.qv", "n.v")} / (sqrt(q.qn) * sqrt(n.norm2)) AS rel
              FROM n JOIN q ON n.vec_id <> q.q_id) t0),
      cand AS (SELECT q_id, vec_id, rel FROM rel0 WHERE rk <= 10),
      cv AS (SELECT c.q_id, c.vec_id, c.rel, n.v, n.norm2
             FROM cand c JOIN n USING (vec_id)),
      sim AS (
        SELECT a.q_id, a.vec_id AS a_id, b.vec_id AS b_id,
               ${dotSql("a.v", "b.v")} / (sqrt(a.norm2) * sqrt(b.norm2)) AS sim
        FROM cv a JOIN cv b ON a.q_id = b.q_id AND a.vec_id <> b.vec_id),
      s1 AS (
        SELECT q_id, vec_id, rel AS score FROM (
          SELECT q_id, vec_id, rel,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY rel DESC, vec_id) AS rk
          FROM cand) t WHERE rk = 1),
      ${mmrRoundSql("s1", "s2")},
      sel2 AS (SELECT q_id, vec_id FROM s1
               UNION ALL SELECT q_id, vec_id FROM s2),
      ${mmrRoundSql("sel2", "s3")}
      SELECT q_id, 1::BIGINT AS pick, vec_id, score FROM s1
      UNION ALL SELECT q_id, 2::BIGINT, vec_id, score FROM s2
      UNION ALL SELECT q_id, 3::BIGINT, vec_id, score FROM s3
      ORDER BY q_id, pick""",
    "v3_ivf_ann" -> ivfSql(sampleMod = 1),
    "v20_filtered_ann" -> ivfSql(sampleMod = 1,
      dataJoin = "JOIN documents dd ON dd.doc_id = a.vec_id AND dd.lang = 'en'"),
    // v21: the compacted store is exactly the assignment minus tombstones
    "v21_ann_delete_compact" -> ivfSql(sampleMod = 1,
      dataJoin = "AND a.vec_id % 181 <> 3"),
    "v12_pq_ann" -> s"""
      WITH e AS (
        SELECT vec_id, v, ${dotSql("v", "v")} AS norm2
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t),
      $pqReconCtes,
      pqq AS (SELECT vec_id AS q_id, v AS qv, norm2 AS qn
              FROM e WHERE vec_id < 10),
      pcand AS (
        SELECT q_id, qv, qn, vec_id FROM (
          SELECT p.q_id, p.qv, p.qn, r.vec_id,
                 row_number() OVER (PARTITION BY p.q_id ORDER BY
                   ${dotSql("p.qv", "r.recon")} / (sqrt(p.qn) * sqrt(r.rn2)) DESC,
                   r.vec_id) AS crank
          FROM precon r CROSS JOIN pqq p WHERE r.vec_id <> p.q_id) z
        WHERE crank <= $PqCand)
      SELECT q_id, rank, neighbor_id, cos FROM (
        SELECT q_id, vec_id AS neighbor_id, cos,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        FROM (SELECT c.q_id, d.vec_id,
                     ${dotSql("c.qv", "d.v")} / (sqrt(c.qn) * sqrt(d.norm2)) AS cos
              FROM pcand c JOIN e d ON d.vec_id = c.vec_id) t0) t1
      WHERE rank <= $K ORDER BY q_id, rank""",
    "v15_sq_ann" -> s"""
      WITH e AS (
        SELECT vec_id, v, ${dotSql("v", "v")} AS norm2
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t),
      sqsc AS (
        SELECT vec_id, v,
               list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        FROM e),
      rec AS (
        SELECT vec_id, recon, ${dotSql("recon", "recon")} AS rn2 FROM (
          SELECT vec_id,
                 list_transform(v, x -> round(x / scale)::DOUBLE * scale) AS recon
          FROM sqsc) z),
      sqq AS (SELECT vec_id AS q_id, v AS qv, norm2 AS qn
              FROM e WHERE vec_id < 10),
      sqcand AS (
        SELECT q_id, qv, qn, vec_id FROM (
          SELECT p.q_id, p.qv, p.qn, r.vec_id,
                 row_number() OVER (PARTITION BY p.q_id ORDER BY
                   ${dotSql("p.qv", "r.recon")} / (sqrt(p.qn) * sqrt(r.rn2)) DESC,
                   r.vec_id) AS crank
          FROM rec r CROSS JOIN sqq p WHERE r.vec_id <> p.q_id) z
        WHERE crank <= $PqCand)
      SELECT q_id, rank, neighbor_id, cos FROM (
        SELECT q_id, vec_id AS neighbor_id, cos,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        FROM (SELECT c.q_id, d.vec_id,
                     ${dotSql("c.qv", "d.v")} / (sqrt(c.qn) * sqrt(d.norm2)) AS cos
              FROM sqcand c JOIN e d ON d.vec_id = c.vec_id) t0) t1
      WHERE rank <= $K ORDER BY q_id, rank""",
    // v19 twin: quantizer training (shared CTE chain) + residual codebooks
    // from the assigned seeds; argmin windows stay NARROW (score, code) —
    // csub payloads join back after the pick (the §6.5 discipline).
    "v19_ivfpq_ann" -> s"""
      WITH e AS (
        SELECT vec_id, v, ${dotSql("v", "v")} AS norm2
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t),
      ${Quantizer.centroidsSql(iters = 2, dim = 64)}${Quantizer.cellsSql},
      rdata AS MATERIALIZED (
        SELECT kc.vec_id, kc.cell, c.cv,
               list_transform(range(1, 65), i -> kc.v[i] - c.cv[i]) AS r
        FROM kcells kc JOIN kmc c ON c.cell = kc.cell),
      rbooks AS MATERIALIZED (
        SELECT m, code, csub, ${dotSql("csub", "csub")} AS cn2 FROM (
          SELECT ms.m, s.vec_id AS code,
                 list_slice(s.r, ms.m * $PqSub + 1, (ms.m + 1) * $PqSub) AS csub
          FROM (SELECT vec_id, r FROM rdata WHERE vec_id < $PqKs) s
          CROSS JOIN (SELECT unnest(range(0, $PqM)) AS m) ms) z),
      rpick AS (
        SELECT vec_id, m, code FROM (
          SELECT t.vec_id, b.m, b.code,
                 row_number() OVER (PARTITION BY t.vec_id, b.m ORDER BY
                   b.cn2 - 2 * ${dotSql(
                     s"list_slice(t.r, b.m * $PqSub + 1, (b.m + 1) * $PqSub)",
                     "b.csub")} ASC, b.code ASC) AS rr
          FROM rdata t CROSS JOIN rbooks b) w WHERE rr = 1),
      rrecon AS MATERIALIZED (
        SELECT vec_id, cell, recon, ${dotSql("recon", "recon")} AS rn2 FROM (
          SELECT d.vec_id, d.cell,
                 list_transform(range(1, 65), i -> d.cv[i] + g.rsub[i]) AS recon
          FROM (SELECT p.vec_id,
                       flatten(list(b.csub ORDER BY p.m)) AS rsub
                FROM rpick p JOIN rbooks b ON b.m = p.m AND b.code = p.code
                GROUP BY p.vec_id) g
          JOIN rdata d ON d.vec_id = g.vec_id) q0),
      rprobes AS (
        SELECT z.cell, k.vec_id AS q_id, k.v AS qv, k.norm2 AS qn FROM (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY acos DESC, cell) AS crank
            FROM (SELECT t.vec_id, c.cell,
                         ${dotSql("t.v", "c.cv")} / (sqrt(t.norm2) * sqrt(c.cnorm2)) AS acos
                  FROM kq t CROSS JOIN kmc c WHERE t.vec_id < 10) pp) zz
          WHERE crank <= 2) z
        JOIN kq k ON k.vec_id = z.vec_id),
      rcand AS (
        SELECT q_id, qv, qn, vec_id FROM (
          SELECT p.q_id, p.qv, p.qn, r.vec_id,
                 row_number() OVER (PARTITION BY p.q_id ORDER BY
                   ${dotSql("p.qv", "r.recon")} / (sqrt(p.qn) * sqrt(r.rn2)) DESC,
                   r.vec_id) AS crank
          FROM rrecon r JOIN rprobes p ON r.cell = p.cell AND r.vec_id <> p.q_id) z
        WHERE crank <= $PqCand)
      SELECT q_id, rank, neighbor_id, cos FROM (
        SELECT q_id, vec_id AS neighbor_id, cos,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        FROM (SELECT c.q_id, d.vec_id,
                     ${dotSql("c.qv", "d.v")} / (sqrt(c.qn) * sqrt(d.norm2)) AS cos
              FROM rcand c JOIN e d ON d.vec_id = c.vec_id) t0) t1
      WHERE rank <= $K ORDER BY q_id, rank""",
    "v7_knn_centrality" -> s"""
      WITH $knnCtes,
      outd AS (SELECT src_id, COUNT(*)::BIGINT AS outd FROM knn GROUP BY src_id),
      s0 AS (SELECT src_id AS id, 1000000::BIGINT AS sc FROM outd),
      r1 AS (
        SELECT k.neighbor_id AS id, SUM(s.sc // o.outd)::BIGINT AS in_sum
        FROM knn k JOIN outd o USING (src_id) JOIN s0 s ON s.id = k.src_id
        GROUP BY k.neighbor_id),
      s1 AS (
        SELECT s0.id, (150000 + (85 * COALESCE(r1.in_sum, 0)) // 100)::BIGINT AS sc
        FROM s0 LEFT JOIN r1 USING (id)),
      r2 AS (
        SELECT k.neighbor_id AS id, SUM(s.sc // o.outd)::BIGINT AS in_sum
        FROM knn k JOIN outd o USING (src_id) JOIN s1 s ON s.id = k.src_id
        GROUP BY k.neighbor_id),
      s2 AS (
        SELECT s1.id, (150000 + (85 * COALESCE(r2.in_sum, 0)) // 100)::BIGINT AS sc
        FROM s1 LEFT JOIN r2 USING (id))
      SELECT id AS vec_id, sc AS score FROM s2
      ORDER BY score DESC, vec_id LIMIT 20""",
    "v6_source_centroids" -> s"""
      WITH ex AS (
        SELECT d.source, i.dim,
               CAST(round(e.embedding[i.dim + 1] * ${Quantizer.Scale}) AS BIGINT) AS q
        FROM embeddings e
        JOIN documents d ON d.doc_id = e.vec_id
        CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) i),
      agg AS (
        SELECT source, dim, SUM(q)::BIGINT AS sq, COUNT(*) AS n
        FROM ex GROUP BY source, dim)
      SELECT source, MAX(n) AS n_vectors,
             string_agg(lpad(dim::VARCHAR, 2, '0') || ':' || sq::VARCHAR,
                        ',' ORDER BY lpad(dim::VARCHAR, 2, '0')) AS centroid_fp
      FROM agg GROUP BY source ORDER BY source""",
    "v5_knn_graph" -> s"""
      WITH $knnCtes
      SELECT src_id, rank, neighbor_id, cos FROM knn
      ORDER BY src_id, rank""",
    // v16/v17: the beam walk replayed hop by hop — same symmetrized edges,
    // same serial-fold cosines, same BeamW frontier cuts, so the visited
    // set (and therefore the final top-K) matches the Spark walk exactly.
    // v17 differs only in the edge CTE (chain links unioned in).
    "v16_graph_beam_search" -> beamSearchSql(
      """SELECT src_id, neighbor_id FROM knn
         UNION ALL SELECT neighbor_id AS src_id, src_id AS neighbor_id FROM knn"""),
    "v17_graph_search_longlinks" -> beamSearchSql(
      """SELECT src_id, neighbor_id FROM knn
         UNION ALL SELECT neighbor_id AS src_id, src_id AS neighbor_id FROM knn
         UNION ALL SELECT a.vec_id AS src_id, a.vec_id + 1 AS neighbor_id
                   FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
         UNION ALL SELECT b.vec_id AS src_id, a.vec_id AS neighbor_id
                   FROM e a JOIN e b ON b.vec_id = a.vec_id + 1"""),
    // v23: the coarse layer replayed — centroid top-3 graph over kmc,
    // per-cell medoids over data, the RouteHops greedy descent from the
    // min cell, entry = 2 best visited cells' medoids — then the v16 walk
    // CTEs verbatim with vis0 seeded from those medoids.
    "v23_graph_hier_route" -> s"""
      WITH $knnCtes,
      cg AS (
        SELECT src_cell, nb_cell FROM (
          SELECT a.cell AS src_cell, b.cell AS nb_cell,
                 row_number() OVER (PARTITION BY a.cell
                   ORDER BY ${dotSql("a.cv", "b.cv")}
                              / (sqrt(a.cnorm2) * sqrt(b.cnorm2)) DESC,
                            b.cell) AS rk
          FROM kmc a JOIN kmc b ON a.cell <> b.cell) t
        WHERE rk <= 3),
      med AS (
        SELECT cell, vec_id FROM (
          SELECT d.cell, d.vec_id,
                 row_number() OVER (PARTITION BY d.cell
                   ORDER BY ${dotSql("d.v", "c.cv")}
                              / (sqrt(d.norm2) * sqrt(c.cnorm2)) DESC,
                            d.vec_id) AS rk
          FROM data d JOIN kmc c ON c.cell = d.cell) t
        WHERE rk = 1),
      rq AS (SELECT vec_id AS q_id, v AS qv, norm2 AS qn
             FROM e WHERE vec_id < 10),
      qc AS MATERIALIZED (
        SELECT rq.q_id, c.cell,
               ${dotSql("rq.qv", "c.cv")}
                 / (sqrt(rq.qn) * sqrt(c.cnorm2)) AS ccos
        FROM rq CROSS JOIN kmc c),
      r0 AS (SELECT q_id, (SELECT min(cell) FROM kmc) AS cell FROM rq),
      dh AS MATERIALIZED (
        SELECT length(bin(greatest(COUNT(*), 2) - 1)) + 1 AS h FROM kmc)
      ${(1 to RouteHopsMax).map(routeHopSql).mkString(",", ",", "")},
      rvis AS (SELECT DISTINCT q_id, cell FROM (
        SELECT q_id, cell FROM r0
        ${(1 to RouteHopsMax)
          .map(i => s"UNION ALL SELECT q_id, cell FROM rcand$i").mkString(" ")}) u),
      entry AS (
        SELECT q_id, cell FROM (
          SELECT v.q_id, v.cell,
                 row_number() OVER (PARTITION BY v.q_id
                   ORDER BY s.ccos DESC, v.cell) AS rk
          FROM rvis v JOIN qc s ON s.q_id = v.q_id AND s.cell = v.cell) t
        WHERE rk <= 2),
      seed AS (SELECT en.q_id, m.vec_id FROM entry en JOIN med m
               ON m.cell = en.cell),
      ${beamWalkCtes(
        """SELECT src_id, neighbor_id FROM knn
           UNION ALL SELECT neighbor_id AS src_id, src_id AS neighbor_id FROM knn""",
        "e", "beamtop",
        """SELECT q_id, vec_id FROM seed
           UNION ALL SELECT q_id, q_id AS vec_id FROM rq""")}
      SELECT q_id, rank, neighbor_id, cos FROM beamtop ORDER BY q_id, rank""",
    // v24: the v16 walk CTEs with frontier hops scored against the PQ
    // reconstructions (rcn) — queries and the final rerank stay exact
    "v24_pq_graph_search" -> s"""
      WITH $knnCtes,
      $pqReconCtes,
      rcn AS (SELECT vec_id, recon AS v, rn2 AS norm2 FROM precon),
      ${beamWalkCtes(
        """SELECT src_id, neighbor_id FROM knn
           UNION ALL SELECT neighbor_id AS src_id, src_id AS neighbor_id FROM knn""",
        "e", "beamtop", "", hopRel = "rcn")}
      SELECT q_id, rank, neighbor_id, cos FROM beamtop ORDER BY q_id, rank""",
    "v4_ivf_sampled" -> ivfSql(sampleMod = 4),
    // v9: the stored graph (knn over the index), new-node edges over the
    // cell-local pool, and the stored∪batch-candidate re-rank — identical
    // serial-fold cosines throughout, so ranks match bitwise.
    "v9_knn_graph_update" -> s"""
      WITH e AS (
        SELECT vec_id, v, ${dotSql("v", "v")} AS norm2
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t
        WHERE vec_id % 10 <> 7),
      ${Quantizer.centroidsSql(iters = 2, dim = 64, sampleMod = 1)},
      assigned AS MATERIALIZED (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY acos DESC, cell) AS crank
        FROM (SELECT t.vec_id, c.cell,
                     ${dotSql("t.v", "c.cv")} / (sqrt(t.norm2) * sqrt(c.cnorm2)) AS acos
              FROM kq t CROSS JOIN kmc c) pp),
      data AS MATERIALIZED (
        SELECT a.cell, k.vec_id, k.v, k.norm2 FROM assigned a
        JOIN kq k ON k.vec_id = a.vec_id WHERE a.crank = 1),
      b AS (
        SELECT vec_id, v, ${dotSql("v", "v")} AS norm2
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t
        WHERE vec_id % 10 = 7),
      bas AS (
        SELECT z.cell, k.vec_id, k.v, k.norm2 FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY acos DESC, cell) AS crank
          FROM (SELECT t.vec_id, c.cell,
                       ${dotSql("t.v", "c.cv")} / (sqrt(t.norm2) * sqrt(c.cnorm2)) AS acos
                FROM b t CROSS JOIN kmc c) pp) z
        JOIN b k ON k.vec_id = z.vec_id WHERE z.crank = 1),
      knn AS (
        SELECT src_id, neighbor_id, cos FROM (
          SELECT src_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, neighbor_id) AS rank
          FROM (SELECT s.vec_id AS src_id, d.vec_id AS neighbor_id,
                       ${dotSql("s.v", "d.v")} / (sqrt(s.norm2) * sqrt(d.norm2)) AS cos
                FROM data s JOIN data d ON s.cell = d.cell AND d.vec_id <> s.vec_id) t0) t1
        WHERE rank <= 3),
      pool AS (
        SELECT cell, vec_id, v, norm2 FROM data
        UNION ALL SELECT cell, vec_id, v, norm2 FROM bas),
      newe AS (
        SELECT src_id, rank, neighbor_id, cos FROM (
          SELECT src_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, neighbor_id) AS rank
          FROM (SELECT q.vec_id AS src_id, p.vec_id AS neighbor_id,
                       ${dotSql("q.v", "p.v")} / (sqrt(q.norm2) * sqrt(p.norm2)) AS cos
                FROM bas q JOIN pool p ON q.cell = p.cell AND p.vec_id <> q.vec_id) t0) t1
        WHERE rank <= 3),
      cand AS (
        SELECT d.vec_id AS src_id, p.vec_id AS neighbor_id,
               ${dotSql("d.v", "p.v")} / (sqrt(d.norm2) * sqrt(p.norm2)) AS cos
        FROM data d JOIN bas p ON d.cell = p.cell),
      upd AS (
        SELECT src_id, rank, neighbor_id, cos FROM (
          SELECT src_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY src_id ORDER BY cos DESC, neighbor_id) AS rank
          FROM (SELECT src_id, neighbor_id, cos FROM knn
                UNION ALL SELECT src_id, neighbor_id, cos FROM cand) u) t
        WHERE rank <= 3)
      SELECT src_id, rank, neighbor_id, cos, is_new FROM (
        SELECT src_id, rank, neighbor_id, cos, FALSE AS is_new FROM upd
        UNION ALL
        SELECT src_id, rank, neighbor_id, cos, TRUE FROM newe) f
      ORDER BY src_id, rank""",
    // v8: `e` (the relation the quantizer CTEs train over) IS the index
    // subset — the model never sees the batch; the batch assigns against
    // the trained `kmc` and reranks only within its placement cell.
    "v8_ivf_add_batch" -> s"""
      WITH e AS (
        SELECT vec_id, v, ${dotSql("v", "v")} AS norm2
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t
        WHERE vec_id % 10 <> 7),
      ${Quantizer.centroidsSql(iters = 2, dim = 64, sampleMod = 1)},
      assigned AS MATERIALIZED (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY acos DESC, cell) AS crank
        FROM (SELECT t.vec_id, c.cell,
                     ${dotSql("t.v", "c.cv")} / (sqrt(t.norm2) * sqrt(c.cnorm2)) AS acos
              FROM kq t CROSS JOIN kmc c) pp),
      data AS MATERIALIZED (
        SELECT a.cell, k.vec_id, k.v, k.norm2 FROM assigned a
        JOIN kq k ON k.vec_id = a.vec_id WHERE a.crank = 1),
      b AS (
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
                FROM b t CROSS JOIN kmc c) pp) z
        JOIN b k ON k.vec_id = z.vec_id WHERE z.crank = 1)
      SELECT q_id, cell, rank, neighbor_id, cos FROM (
        SELECT p.vec_id AS q_id, p.cell::BIGINT AS cell, d.vec_id AS neighbor_id,
               ${dotSql("p.v", "d.v")} / (sqrt(p.norm2) * sqrt(d.norm2)) AS cos,
               row_number() OVER (PARTITION BY p.vec_id ORDER BY
                 ${dotSql("p.v", "d.v")} / (sqrt(p.norm2) * sqrt(d.norm2)) DESC,
                 d.vec_id) AS rank
        FROM bas p JOIN data d ON d.cell = p.cell) t
      WHERE rank <= 3 ORDER BY q_id, rank""",
    "v1_brute_topk" -> v1Sql,
    "v18_random_projection" -> v18Sql,
    "v2_lsh_ann" -> v2Sql,
    // v11: both retrievals nest as subqueries; COUNT(a.neighbor_id) counts
    // only matched (non-null) exact neighbors
    "v11_ann_recall" -> s"""
      SELECT x.q_id, COUNT(a.neighbor_id)::BIGINT AS n_hit,
             (COUNT(a.neighbor_id) * 100 // $K)::BIGINT AS recall_pct
      FROM ($v1Sql) x LEFT JOIN ($v2Sql) a
        ON a.q_id = x.q_id AND a.neighbor_id = x.neighbor_id
      GROUP BY x.q_id ORDER BY x.q_id""",
    // v22: one brute truth, three IVF instantiations (each subquery
    // carries its own WITH chain — names are scoped), recall in basis
    // points by integer division
    "v22_probe_recall_sweep" -> Seq(1, 2, 4).map { np =>
      s"""SELECT ${np}::BIGINT AS n_probe, COUNT(*)::BIGINT AS n_truth,
             COUNT(a.neighbor_id)::BIGINT AS n_hit,
             (COUNT(a.neighbor_id) * 10000 // COUNT(*))::BIGINT AS recall_bp
         FROM ($v1Sql) x LEFT JOIN (${ivfSql(1, "", np)}) a
           ON a.q_id = x.q_id AND a.neighbor_id = x.neighbor_id"""
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) t ORDER BY n_probe"),
    // v26: one brute truth, three hop-parameterized walk instantiations
    // (v22's scoped-subquery convention — each carries its own WITH chain)
    "v26_hop_recall_sweep" -> Seq(1, 2, 3).map { h =>
      s"""SELECT ${h}::BIGINT AS n_hops, COUNT(*)::BIGINT AS n_truth,
             COUNT(a.neighbor_id)::BIGINT AS n_hit,
             (COUNT(a.neighbor_id) * 10000 // COUNT(*))::BIGINT AS recall_bp
         FROM ($v1Sql) x LEFT JOIN (
           WITH $knnCtes,
           ${beamWalkCtes(
             """SELECT src_id, neighbor_id FROM knn
                UNION ALL SELECT neighbor_id AS src_id, src_id AS neighbor_id
                FROM knn""",
             "e", "beamtop", hops = h)}
           SELECT q_id, neighbor_id FROM beamtop) a
           ON a.q_id = x.q_id AND a.neighbor_id = x.neighbor_id"""
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) t ORDER BY n_hops"),
    // v13: lexical CTEs are d4's (same cap), pointed query-vs-corpus; the
    // semantic list nests v1Sql verbatim; every RRF term is cast ::DOUBLE
    // before dividing (DuckDB parses bare 1.0 as DECIMAL).
    "v13_rrf_fusion" -> s"""
      WITH sh AS (
        SELECT doc_id, len(hs)::BIGINT AS n_sh, hs
        FROM (SELECT doc_id, ${Dedup.shingleHashesSql} AS hs
              FROM (SELECT doc_id, ${Tx.wsSql} AS ws FROM documents) t0) t1),
      ex AS (
        SELECT doc_id, n_sh, h FROM (SELECT doc_id, n_sh, unnest(hs) AS h FROM sh) t
        QUALIFY COUNT(*) OVER (PARTITION BY h) <= ${Dedup.MaxDf}),
      kw AS (
        SELECT q_id, doc_id, krank FROM (
          SELECT q_id, doc_id,
                 row_number() OVER (PARTITION BY q_id ORDER BY jaccard DESC, doc_id)::BIGINT AS krank
          FROM (
            SELECT q.doc_id AS q_id, c.doc_id AS doc_id,
                   COUNT(*)::DOUBLE / (q.n_sh + c.n_sh - COUNT(*)) AS jaccard
            FROM ex q JOIN ex c ON q.h = c.h AND q.doc_id < 10 AND c.doc_id <> q.doc_id
            GROUP BY q.doc_id, c.doc_id, q.n_sh, c.n_sh) t) t2
        WHERE krank <= $K),
      em AS (SELECT q_id, neighbor_id AS doc_id, rank AS erank FROM ($v1Sql) v),
      fused AS (
        SELECT COALESCE(k.q_id, m.q_id) AS q_id,
               COALESCE(k.doc_id, m.doc_id) AS doc_id,
               COALESCE(k.krank, 0)::BIGINT AS kw_rank,
               COALESCE(m.erank, 0)::BIGINT AS em_rank,
               COALESCE(1.0::DOUBLE / (k.krank + 60), 0.0::DOUBLE)
                 + COALESCE(1.0::DOUBLE / (m.erank + 60), 0.0::DOUBLE) AS rrf
        FROM kw k FULL OUTER JOIN em m ON k.q_id = m.q_id AND k.doc_id = m.doc_id)
      SELECT q_id, rank, doc_id, kw_rank, em_rank, rrf FROM (
        SELECT q_id, doc_id, kw_rank, em_rank, rrf,
               row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id)::BIGINT AS rank
        FROM fused) t
      WHERE rank <= $K ORDER BY q_id, rank""",
    // `und` is MATERIALIZED (DuckDB-side only): DuckDB inlines plain CTEs
    // at every reference, and und is referenced 3× (s0, n1, n2) — each
    // inline replays the whole Lloyd-training chain behind `knn`, which
    // at the 10× soak spilled >78 GB; materializing the ~150 k-edge
    // frame evaluates it once. Values are unchanged.
    // v28: triangles order-free — canonical a<b edges, a<b<c joins; the
    // degree orientation is a Spark-side WORK bound, not a semantics
    // change, so the oracle skips it
    "v28_triangle_count" -> s"""
      WITH $knnCtes,
      und AS MATERIALIZED (
        SELECT DISTINCT least(src_id, neighbor_id) AS a,
                        greatest(src_id, neighbor_id) AS b
        FROM knn WHERE src_id <> neighbor_id),
      tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
      SELECT vec_id, COUNT(*)::BIGINT AS n_triangles
      FROM (SELECT x AS vec_id FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri) t
      GROUP BY vec_id ORDER BY vec_id""",
    "v14_label_prop" -> s"""
      WITH $knnCtes,
      und AS MATERIALIZED (
        SELECT DISTINCT src_id, neighbor_id FROM (
          SELECT src_id, neighbor_id FROM knn
          UNION ALL
          SELECT neighbor_id AS src_id, src_id AS neighbor_id FROM knn) u),
      s0 AS (SELECT DISTINCT src_id AS id, src_id AS lbl FROM und),
      n1 AS (
        SELECT u.src_id AS id, MIN(s.lbl) AS nmin
        FROM und u JOIN s0 s ON s.id = u.neighbor_id GROUP BY 1),
      s1 AS (
        SELECT s0.id, least(s0.lbl, COALESCE(n1.nmin, s0.lbl)) AS lbl
        FROM s0 LEFT JOIN n1 USING (id)),
      n2 AS (
        SELECT u.src_id AS id, MIN(s.lbl) AS nmin
        FROM und u JOIN s1 s ON s.id = u.neighbor_id GROUP BY 1),
      s2 AS (
        SELECT s1.id, least(s1.lbl, COALESCE(n2.nmin, s1.lbl)) AS lbl
        FROM s1 LEFT JOIN n2 USING (id)),
      sizes AS (SELECT lbl, COUNT(*)::BIGINT AS community_size FROM s2 GROUP BY lbl)
      SELECT s2.id AS vec_id, s2.lbl::BIGINT AS community, sizes.community_size
      FROM s2 JOIN sizes USING (lbl) ORDER BY vec_id""",
    "v25_pagerank" -> s"""
      WITH $pprPrefixSql,
      ${pprItersSql(3)}
      SELECT id AS vec_id, rank::BIGINT AS rank_scaled
      FROM r3 WHERE id >= 10
      ORDER BY rank_scaled DESC, vec_id LIMIT 20""",
    // v27: the same generated chain to depth 4; per-depth top-20 CTEs
    // scored against the depth-4 reference.
    "v27_ppr_sweep" -> s"""
      WITH $pprPrefixSql,
      ${pprItersSql(4)},
      ${(1 to 4).map { k =>
        s"""t$k AS (SELECT id FROM r$k WHERE id >= 10
            QUALIFY row_number() OVER (ORDER BY rank DESC, id) <= 20)"""
      }.mkString(",\n      ")}
      ${(1 to 3).map { k =>
        s"""SELECT ${k}::BIGINT AS iters,
             (SELECT COUNT(*) FROM r$k WHERE id >= 10)::BIGINT AS n_reached,
             (SELECT COUNT(*) FROM t$k JOIN t4 USING (id))::BIGINT AS n_hits,
             ((SELECT COUNT(*) FROM t$k JOIN t4 USING (id)) * 10000 // 20)::BIGINT
               AS overlap_bp"""
      }.mkString("\n      UNION ALL\n      ")}
      ORDER BY iters"""
  )

  /** v25/v27's PPR oracle scaffolding — prefix CTEs shared by both. */
  private def pprPrefixSql: String = s"""$knnCtes,
      edges AS MATERIALIZED (
        SELECT src_id AS src, neighbor_id AS dst FROM knn),
      deg AS (SELECT src, COUNT(*)::BIGINT AS outdeg FROM edges GROUP BY 1),
      seeds AS (SELECT src AS id FROM deg WHERE src < 10),
      ns AS (SELECT COUNT(*)::BIGINT AS ns FROM seeds),
      tele AS (SELECT id, 150000000000 // ns AS t FROM seeds CROSS JOIN ns),
      r0 AS (SELECT id, 1000000000000 // ns AS rank
             FROM seeds CROSS JOIN ns)"""

  /** k unrolled sparse PPR iterations (c/i/r per round). */
  private def pprItersSql(n: Int): String = (1 to n).map { k =>
    s"""c$k AS (SELECT * FROM (
               SELECT r${k - 1}.id AS src, (85 * rank) // (100 * outdeg) AS c
               FROM r${k - 1} JOIN deg ON deg.src = r${k - 1}.id) z WHERE c > 0),
      i$k AS (SELECT e.dst AS id, SUM(c)::BIGINT AS in_c
             FROM edges e JOIN c$k USING (src) GROUP BY 1),
      r$k AS (SELECT COALESCE(t.id, i$k.id) AS id,
                    COALESCE(t.t, 0) + COALESCE(i$k.in_c, 0) AS rank
             FROM tele t FULL JOIN i$k ON i$k.id = t.id)"""
  }.mkString(",\n      ")

  private[catalog] lazy val v1Sql = s"""
      WITH e AS (
        SELECT vec_id, v, ${dotSql("v", "v")} AS norm2
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t),
      scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
               ${dotSql("q.v", "c.v")} / (sqrt(q.norm2) * sqrt(c.norm2)) AS cos
        FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
      SELECT q_id, rank, neighbor_id, cos FROM (
        SELECT q_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored) t
      WHERE rank <= $K ORDER BY q_id, rank"""

  // v18: the projection/sketch chain restated — integer q/p/pn2/dotp, the
  // same (k, d) sign hash, cosp's greatest() guard, true cosine only on
  // the reported pairs.
  private lazy val v18Sql = s"""
      WITH e AS (
        SELECT vec_id, v, ${dotSql("v", "v")} AS norm2,
               list_transform(v, x -> CAST(round(x * 4096) AS BIGINT)) AS q
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t0),
      pp AS (
        SELECT vec_id, v, norm2,
               list_transform(range(0, 8), k -> list_reduce(list_prepend(0::BIGINT,
                 list_transform(range(0, 64), d ->
                   (1 - 2 * (((1315423911 * k + 2654435761 * d) % 2147483647) % 2))
                   * q[d + 1])),
                 (a, x) -> a + x)) AS p
        FROM e),
      pn AS (
        SELECT vec_id, v, norm2, p,
               list_reduce(list_prepend(0::BIGINT, list_transform(p, x -> x * x)),
                 (a, x) -> a + x) AS pn2
        FROM pp),
      scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
               list_reduce(list_prepend(0::BIGINT,
                 list_transform(range(1, 9), i -> q.p[i] * c.p[i])),
                 (a, x) -> a + x) AS dotp,
               q.pn2 AS qpn2, c.pn2 AS cpn2,
               ${dotSql("q.v", "c.v")} / (sqrt(q.norm2) * sqrt(c.norm2)) AS cos_true
        FROM pn q JOIN pn c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
      ranked AS (
        SELECT q_id, neighbor_id, dotp,
               dotp::DOUBLE / sqrt(greatest(qpn2::DOUBLE * cpn2::DOUBLE, 1)) AS cosp,
               cos_true,
               row_number() OVER (PARTITION BY q_id ORDER BY
                 dotp::DOUBLE / sqrt(greatest(qpn2::DOUBLE * cpn2::DOUBLE, 1)) DESC,
                 neighbor_id) AS rank
        FROM scored)
      SELECT q_id, rank::BIGINT AS rank, neighbor_id, dotp, cosp, cos_true
      FROM ranked WHERE rank <= $K ORDER BY q_id, rank"""

  private lazy val v2Sql = s"""
      WITH e AS (
        SELECT vec_id, v, norm2, ${sigSql("v")} AS sig
        FROM (SELECT vec_id, v, ${dotSql("v", "v")} AS norm2
              FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                    FROM embeddings) t0) t1),
      bk AS (
        SELECT vec_id, v, norm2, b.band_idx, bands[b.band_idx + 1] AS band_val
        FROM (SELECT vec_id, v, norm2, ${bandsSql("sig")} AS bands FROM e) t
        CROSS JOIN (SELECT unnest(range(0, 4)) AS band_idx) b),
      cand AS (
        SELECT DISTINCT q.vec_id AS q_id, q.v AS qv, q.norm2 AS qn,
                        c.vec_id AS vec_id, c.v AS v, c.norm2 AS norm2
        FROM bk q JOIN bk c
          ON q.vec_id < 10 AND q.band_idx = c.band_idx AND q.band_val = c.band_val
         AND c.vec_id <> q.vec_id)
      SELECT q_id, rank, neighbor_id, cos FROM (
        SELECT q_id, vec_id AS neighbor_id, cos,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        FROM (SELECT q_id, vec_id,
                     ${dotSql("qv", "v")} / (sqrt(qn) * sqrt(norm2)) AS cos
              FROM cand) t0) t1
      WHERE rank <= $K ORDER BY q_id, rank"""
}

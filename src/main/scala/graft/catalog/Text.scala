package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline surface (token counting, quality scoring, language-ID heuristic,
  * document fingerprinting). North-star mandate; no reference citation
  * (the reference has no text analytics — SURVEY.md §2.B).
  *
  * Determinism rules for the DuckDB oracle:
  *  - only integer arithmetic crosses aggregations (counts, polynomial
  *    hashes); doubles appear solely as single-division ratios of exact
  *    integers, which is one IEEE op → bitwise identical across engines;
  *  - the polynomial rolling hash folds serially over the string in BOTH
  *    engines (Spark `aggregate`, DuckDB `list_reduce`), so values match
  *    exactly: h = fold(chars, 0, (a, c) => (a*31 + c) mod 2147483647).
  *
  * Scale notes (100 TB): every query is embarrassingly parallel per-document
  * (scan → project, no shuffle) except the final small groupBy/orderBy;
  * whole-stage codegen covers the tokenize/hash expressions; nothing
  * collects to the driver.
  */
object Text extends QueryPack {

  import Tx.{wsExpr, wsSql, polyHash, polyHashSql}

  private[graft] val stopwords = Seq("the", "a", "data", "value", "row")
  private[catalog] def inList(v: String, xs: Seq[String]) =
    s"$v IN (${xs.map(w => s"'$w'").mkString(", ")})"

  /** language marker words (shared-vocab corpus ⇒ this is a deterministic
    * heuristic, scored against the gold `lang` label as an agreement matrix,
    * not expected to be accurate). Tiebreak order: en, de, es, fr, zh. */
  private[graft] val markers = Seq(
    "en" -> Seq("the", "order", "group", "window"),
    "de" -> Seq("hash", "customer", "big"),
    "es" -> Seq("slow", "agg", "merge"),
    "fr" -> Seq("scan", "data", "batch"),
    "zh" -> Seq("join", "small", "column"))

  /** x13/x14's trained merge table — deterministic model state, memoized
    * per testdata dir (the Quantizer.trained pattern): (rank, pair,
    * weighted corpus count). Training runs over the DISTINCT-word
    * frequency table; each round's argmax is a 1-row collect. */
  private val learnedMerges =
    new scala.collection.concurrent.TrieMap[String, Seq[(Long, String, Long)]]

  private def bpeMerges(s: SparkSession, dir: String): Seq[(Long, String, Long)] =
    learnedMerges.getOrElseUpdate(dir, {
      import s.implicits._
      val words = Tables(s, dir).documents
        .select(explode(expr(wsExpr)).as("tok"))
        .filter(length($"tok") > 0)
        .groupBy($"tok").agg(count(lit(1)).as("freq"))
        .withColumn("seq", expr(
          "concat('@', array_join(transform(sequence(1, length(tok)), " +
            "i -> substring(tok, i, 1)), ' @'))"))
        .select($"freq", $"seq")
      var cur = words
      val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
      for (r <- 1 to 3) {
        val best = cur
          .select($"freq", split($"seq", " ").as("ss"))
          .filter(size($"ss") >= 2)
          .select($"freq", explode(expr(
            "transform(sequence(0, size(ss) - 2), i -> concat(ss[i], ' ', ss[i + 1]))"))
            .as("pair"))
          .groupBy($"pair").agg(sum($"freq").as("c"))
          .orderBy($"c".desc, $"pair").limit(1)
          .collect()(0)
        val pair = best.getString(0)
        merges += ((r.toLong, pair, best.getLong(1)))
        val repl = "@" + pair.replace(" @", "")
        // boundary-safe: pad the sequence and match 'pair ' so a pair can
        // never merge into the PREFIX of a longer right-hand symbol
        cur = cur.withColumn("seq",
          expr(s"rtrim(replace(concat(seq, ' '), '$pair ', '$repl '))"))
      }
      merges.toSeq
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // x8: Gopher-style repetition signals per document — fraction of word
    // positions covered by the single most frequent bigram, and the
    // duplicate-word fraction. High values flag boilerplate/spam for
    // curation filters. One compiled pass per row; the only doubles are
    // single divisions of exact integers (bitwise identical cross-engine).
    "x8_repetition" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .withColumn("rc", graft.functions.TextKernels.repetitionUdf($"text"))
        .select($"doc_id", $"rc.n_words".as("n_words"),
                $"rc.top_bigram_n".as("top_bigram_n"),
                ($"rc.top_bigram_n".cast("double") /
                  greatest($"rc.n_words" - 1, lit(1L))).as("frac_top_bigram"),
                (($"rc.n_words" - $"rc.n_distinct").cast("double") /
                  $"rc.n_words").as("frac_dup_words"))
        .orderBy($"doc_id")
    },
    // x9: benchmark DECONTAMINATION — flag corpus documents sharing any
    // 4-token shingle with the held-out eval set (doc_id % 97, standing in
    // for a benchmark suite). The eval shingle set is tiny and BROADCAST,
    // so the corpus never shuffles — the scan stays embarrassingly
    // parallel, which is what makes decontamination tractable at 100 TB.
    "x9_decontam" -> { (s, dir) =>
      import s.implicits._
      val sh = Tables(s, dir).documents
        .select($"doc_id",
          explode(graft.functions.TextKernels.shingleHashesUdf($"text")).as("h"))
      val evalSet = sh.filter(pmod($"doc_id", lit(97)) === 0).select($"h").distinct()
      sh.filter(pmod($"doc_id", lit(97)) =!= 0)
        .join(broadcast(evalSet), Seq("h"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
        .orderBy($"doc_id")
    },
    // x26: GRADED CONTAMINATION REPORT — x9 answers "which TRAINING docs
    // share anything with the eval set" (binary exposure, train lens);
    // the number an eval card publishes is the EVAL lens: per eval doc,
    // what FRACTION of its distinct n-grams the training split contains
    // (the n-gram-overlap contamination statistic), plus a ≥50% dirty
    // flag. Scale shape (x22's broadcast-eval convention): the eval gram
    // set is corpus-fraction-small and BROADCASTS twice — once to
    // semi-reduce the training scan to hit grams (distinct on the
    // eval-bounded hit domain, map-side combined), once to mark the
    // per-eval-doc gram list; the training corpus itself never shuffles.
    "x26_contamination_report" -> { (s, dir) =>
      import s.implicits._
      val sh = Tables(s, dir).documents
        .select($"doc_id",
          explode(graft.functions.TextKernels.shingleHashesUdf($"text")).as("h"))
      val evalSh = sh.filter(pmod($"doc_id", lit(97)) === 0)
        .select($"doc_id", $"h").distinct()
      val evalGrams = evalSh.select($"h").distinct()
      val hit = sh.filter(pmod($"doc_id", lit(97)) =!= 0)
        .join(broadcast(evalGrams), Seq("h"))
        .select($"h").distinct()
        .withColumn("is_hit", lit(1L))
      evalSh.join(broadcast(hit), Seq("h"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
             sum(coalesce($"is_hit", lit(0L))).as("n_hit"))
        .withColumn("hit_bp", expr("n_hit * 10000 div n_grams"))
        .withColumn("dirty", when($"hit_bp" >= 5000, 1L).otherwise(0L))
        .orderBy($"doc_id")
    },
    // x10: PII redaction — mask emails and phone-like numbers before the
    // corpus ships to training. The raw corpus carries no PII, so the query
    // first PLANTS a deterministic email + phone per document (pure function
    // of doc_id, mirrored exactly in the oracle SQL), then redacts and
    // reports match counts + a digest of the redacted text. Patterns are
    // RE2-safe (char classes + bounded/greedy quantifiers only) so Java
    // regex (Spark) and RE2 (DuckDB) match identically. Scale: pure per-row
    // projection — no shuffle, whole-stage codegen, the 100 TB shape.
    "x10_pii_redact" -> { (s, dir) =>
      import s.implicits._
      val aug = concat($"text", lit(" contact user"), $"doc_id".cast("string"),
        lit("@mail"), pmod($"doc_id", lit(7)).cast("string"),
        lit(".com or call 555-"),
        lpad(pmod($"doc_id", lit(10000)).cast("string"), 4, "0"), lit(" now"))
      Tables(s, dir).documents
        .withColumn("aug", aug)
        .withColumn("n_emails", regexp_count($"aug", lit(EmailPat)).cast("long"))
        .withColumn("r1", regexp_replace($"aug", EmailPat, "<EMAIL>"))
        .withColumn("n_phones", regexp_count($"r1", lit(PhonePat)).cast("long"))
        .withColumn("redacted", regexp_replace($"r1", PhonePat, "<PHONE>"))
        .select($"doc_id", $"n_emails", $"n_phones",
                length($"redacted").cast("long").as("red_len"),
                md5($"redacted").as("red_digest"))
        .orderBy($"doc_id")
    },
    // x11: corpus-wide HEAVY HITTERS — global top-20 tokens by count (the
    // vocabulary/stop-list builder). groupBy(token) partial-aggregates
    // map-side; the final orderBy+limit plans as TakeOrderedAndProject —
    // each partition keeps a 20-row heap and only those heaps cross the
    // wire, never a full sort (CurationOpsSpec pins the plan). Count ties
    // break on the token itself so the cut is deterministic.
    "x11_heavy_hitters" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select(explode(expr(wsExpr)).as("tok"))
        .filter(length($"tok") > 0)
        .groupBy($"tok").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"tok")
        .limit(20)
    },
    // x1: token counting (whitespace tokenizer + distinct + mean length) —
    // one compiled tokenize pass per row (see TextKernels scaladoc for why
    // not inline HOF lambdas)
    "x1_token_stats" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .withColumn("st", graft.functions.TextKernels.tokenStatsUdf($"text"))
        .select(
          $"doc_id",
          $"st.n_tokens".as("n_tokens"),
          $"st.n_distinct".as("n_distinct"),
          $"st.sum_token_len".as("sum_token_len"),
          ($"st.sum_token_len".cast("double") /
            greatest($"st.n_tokens", lit(1L))).as("avg_token_len"))
        .orderBy($"doc_id")
    },
    // x2: quality scoring: punctuation / digit / stopword ratios + a fixed
    // linear score (each ratio is one exact-int division; the score is a
    // fixed-order double expression → engine-identical)
    "x2_quality_score" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documentsSpread
        .withColumn("qc", graft.functions.TextKernels.qualityCountsUdf(stopwords.toSet)($"text"))
        .withColumn("tl", greatest(length($"text"), lit(1)))
        .select(
          $"doc_id",
          $"qc.n_tokens".as("n_tokens"),
          $"qc.punct_cnt".as("punct_cnt"),
          $"qc.digit_cnt".as("digit_cnt"),
          $"qc.stop_cnt".as("stop_cnt"),
          ($"qc.stop_cnt".cast("double") / $"qc.n_tokens").as("stop_ratio"),
          ($"qc.punct_cnt".cast("double") / $"tl").as("punct_ratio"),
          (lit(1.0) - ($"qc.punct_cnt".cast("double") / $"tl") * 2.0 -
            ($"qc.digit_cnt".cast("double") / $"tl")).as("quality_score"))
        .orderBy($"doc_id")
    },
    // x3: language-ID heuristic (marker-word scores, argmax with fixed
    // tiebreak) → agreement matrix against the gold label
    "x3_lang_id" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .withColumn("predicted", graft.functions.TextKernels.predictLangUdf(markers)($"text"))
        .groupBy($"lang", $"predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy($"lang", $"predicted")
    },
    // x6: BPE-ish pretokenizer counts — the GPT-2-style split (contraction
    // suffixes, space-prefixed letter/digit runs, punctuation runs, space
    // runs) restricted to RE2-compatible syntax (no lookahead) so the
    // oracle regex is literally identical
    "x6_bpe_tokens" -> { (s, dir) =>
      import s.implicits._
      val pat = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"
      Tables(s, dir).documents
        .withColumn("toks", regexp_extract_all(lower($"text"), lit(pat), lit(0)))
        .select($"doc_id",
                size($"toks").cast("long").as("n_bpe"),
                expr("size(array_distinct(toks))").cast("long").as("n_bpe_distinct"))
        .orderBy($"doc_id")
    },
    // x4: document fingerprint — min polynomial hash over all char-8-grams
    // of the normalized text (winnowing-style rolling-hash fingerprint)
    "x4_fingerprint" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select($"doc_id",
          graft.functions.TextKernels.minFingerprintUdf($"text").as("fingerprint"))
        .orderBy($"doc_id")
    },
    // x7: per-document top-3 terms by tf-idf. The score is the exact
    // integer floor(tf * N * 1e6 / df) — no logarithm, so ranking is
    // bitwise identical across engines (libm log low bits differ between
    // runtimes). Corpus size N is tiny driver state (one count), df is one
    // distinct-aggregate on the exploded token stream; at 100 TB both are
    // the standard shuffle-on-term shape with map-side combine.
    // x12: RARE-TOKEN quality filter — the integer-exact unigram-LM proxy
    // for a perplexity gate: a document whose tokens are mostly corpus-rare
    // is likely noise/garbage. "Rare" is data-relative (count < half the
    // mean vocabulary count — a 2-long broadcast scalar), so the op needs
    // no tuned constant. Plan: one map-side-combined vocab aggregation, one
    // hash join back on token (at 100 TB the top-of-vocabulary head would
    // broadcast and only the long tail shuffles), then a per-doc aggregate.
    // rare_pm is exact integer per-mille — no double crosses the gate.
    // x15: DOCUMENT CHUNKING — fixed-size overlapping chunks (500 chars,
    // 100 overlap → stride 400), the context-packing prep a training
    // pipeline runs before tokenization. Pure per-row projection
    // (sequence + explode + substring — char-aligned boundaries on both
    // engines, so multibyte text never splits a codepoint); chunk count
    // uses greatest(len,1) so empty docs still yield one (empty) chunk
    // with identical floor semantics on both engines.
    "x15_chunk_pack" -> { (s, dir) =>
      import s.implicits._
      chunked(Tables(s, dir).documents)
        .select($"doc_id", $"chunk_idx",
          length($"chunk").cast("long").as("chunk_len"),
          md5($"chunk").as("chunk_md5"))
        .orderBy($"doc_id", $"chunk_idx")
    },
    "x12_rare_token_filter" -> { (s, dir) =>
      import s.implicits._
      // round-14: spread (tokenize serialized on the single-split scan) +
      // persist (toks feeds the vocab count AND the scoring join)
      val toks = Tables(s, dir).documentsSpread
        .select($"doc_id", explode(expr(wsExpr)).as("tok"))
        .filter(length($"tok") > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      val thr = vocab.agg(sum($"cnt").as("_tot"), count(lit(1)).as("_nv"))
        .select(expr("_tot div (_nv * 2)").as("thr"))
      toks.join(vocab, "tok").crossJoin(broadcast(thr))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"),
             sum(when($"cnt" < $"thr", 1L).otherwise(0L)).as("n_rare"))
        .withColumn("rare_pm", expr("n_rare * 1000 div n_tokens"))
        .withColumn("keep", $"rare_pm" < 500)
        .orderBy($"doc_id")
    },
    // x13: BPE MERGE LEARNING in-engine — train the first 3 tokenizer
    // merge rules on the corpus, in the word-frequency-table formulation
    // (Sennrich-style: learning runs over the DISTINCT-word table weighted
    // by count, so corpus size only affects the tiny freq aggregation, not
    // the merge loop). Each round: count adjacent symbol pairs (weighted),
    // pick the max (ties on pair text), merge it everywhere. Symbol
    // sequences ride a '@'-marked string ("@t @h @e"); the merge is one
    // literal `replace` matched on SYMBOL BOUNDARIES — the pattern carries
    // a trailing space and the sequence is padded with one ('@t @h ' never
    // matches inside '@t @he'), the start is safe because '@' only occurs
    // at symbol starts and the pair's interior space forces the first
    // symbol to end exactly there. Left-to-right non-overlap then matches
    // greedy BPE on both engines — the oracle unrolls the identical three
    // rounds in SQL. The per-round argmax is k-means-style driver state
    // (one 1-row collect per round, the Quantizer pattern).
    "x13_bpe_learn" -> { (s, dir) =>
      import s.implicits._
      bpeMerges(s, dir).toDF("merge_rank", "pair", "weighted_count")
        .orderBy($"merge_rank")
    },
    // x14: BPE APPLY — the learned merges (x13's model, memoized per
    // session like the trained quantizer) applied back to EVERY document:
    // the train→apply loop a tokenization stage runs at 100 TB. Per
    // (doc, word) symbol sequences get the 3 boundary-safe replaces in
    // merge-rank order (pure per-row projections — no shuffle beyond the
    // final per-doc aggregate); output = post-merge token count per doc,
    // the compression statistic that prices a corpus in tokens.
    "x14_bpe_apply" -> { (s, dir) =>
      import s.implicits._
      var cur = Tables(s, dir).documents
        .select($"doc_id", explode(expr(wsExpr)).as("tok"))
        .filter(length($"tok") > 0)
        .withColumn("seq", expr(
          "concat('@', array_join(transform(sequence(1, length(tok)), " +
            "i -> substring(tok, i, 1)), ' @'))"))
      bpeMerges(s, dir).foreach { case (_, pair, _) =>
        val repl = "@" + pair.replace(" @", "")
        cur = cur.withColumn("seq",
          expr(s"rtrim(replace(concat(seq, ' '), '$pair ', '$repl '))"))
      }
      cur.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_words"),
             sum(size(split($"seq", " "))).cast("long").as("n_tokens"))
        .orderBy($"doc_id")
    },
    // x16: BIGRAM-LM QUALITY SCORE — the CCNet/perplexity-gate shape, kept
    // integer-exact so it can sit under the hash gate: train a bigram model
    // on the corpus itself (c(w1,w2), c(w1)), score every document by its
    // mean scaled conditional probability ppm(w2|w1) = c12·10⁶ div c1, and
    // keep documents whose mean is at least half the corpus-wide mean (the
    // data-relative threshold, x12's convention — no tuned constant). Low
    // scores = improbable token transitions = likely garbage; a real
    // deployment swaps the floor-div probability for a log-prob, the plan
    // is identical. Plan shape at 100 TB: two map-side-combined count
    // aggregations (the model — shuffled on w1[,w2], head would broadcast),
    // one hash join back per occurrence, one per-doc aggregate; docs with
    // <2 tokens have no bigrams and drop out (they go to a length gate,
    // not an LM gate).
    "x16_lm_score" -> { (s, dir) =>
      import s.implicits._
      val bi = Tables(s, dir).documents
        .select($"doc_id", expr(wsExpr).as("ws"))
        .select($"doc_id", explode(expr(
          "if(size(ws) < 2, array(), transform(sequence(1, size(ws) - 1), " +
            "p -> struct(element_at(ws, p) as w1, element_at(ws, p + 1) as w2)))"))
          .as("b"))
        .select($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"))
        .filter(length($"w1") > 0 && length($"w2") > 0)
        // consumed by the bigram counts, the unigram counts AND the scoring
        // join — unpersisted, the tokenize+explode pass ran three times
        // (round-14, the d16 multi-consumer discipline)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val big = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
      val uni = bi.groupBy($"w1").agg(count(lit(1)).as("c1"))
      val perDoc = bi.join(big, Seq("w1", "w2")).join(uni, Seq("w1"))
        .withColumn("p_ppm", expr("c12 * 1000000L div c1"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum($"p_ppm").as("sum_ppm"))
        .withColumn("lm_ppm", expr("sum_ppm div n_bigrams"))
        // consumed by the corpus-mean threshold AND the final projection
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val thr = perDoc.agg(expr("sum(sum_ppm) div sum(n_bigrams)").as("thr"))
      perDoc.crossJoin(broadcast(thr))
        .withColumn("keep", $"lm_ppm" >= expr("thr div 2"))
        .select($"doc_id", $"n_bigrams", $"sum_ppm", $"lm_ppm", $"keep")
        .orderBy($"doc_id")
    },
    // x17: CONTENT-DEFINED CHUNKING — x15 chunks at fixed offsets, so one
    // inserted character shifts every later boundary and defeats chunk-
    // level dedup; CDC cuts where a fingerprint of the local 8-char window
    // hits a pattern (first md5 byte < 4 → expected chunk ~64 chars), so
    // boundaries move WITH the content and an edit only re-chunks its
    // neighborhood — the dedup-grade chunking backup/dedup systems use.
    // The window fingerprint is md5 (d13's window shape — native codegen'd
    // kernel; the serial-fold polynomial hash costs an interpreted
    // 64-step lambda PER POSITION and benched 8× slower). Boundary choice
    // depends only on the window (no min/max-chunk state), so the position
    // scan is a pure per-row projection — embarrassingly parallel;
    // production min/max chunk bounds are a post-filter on the same plan.
    "x17_cdc_chunk" -> { (s, dir) =>
      import s.implicits._
      // boundary scan = the native CdcStarts kernel (round-14: the
      // interpreted transform/filter chain re-rendered a 32-char md5 hex
      // string per CHARACTER POSITION — the kernel hashes the same window
      // bytes and compares the first digest byte; CdcStartsSpec pins
      // kernel == SQL, the oracle below still runs the original SQL form)
      Tables(s, dir).documentsSpread
        .withColumn("nt",
          expr("trim(regexp_replace(lower(text), '[^a-z ]', ''))"))
        .withColumn("starts", graft.functions.CdcStarts.of($"nt"))
        .select($"doc_id", $"nt", posexplode(expr(
          "transform(sequence(0, size(starts) - 1), i -> struct(" +
            "element_at(starts, i + 1) as st, " +
            "if(i < size(starts) - 1, element_at(starts, i + 2) - 1, " +
            "length(nt)) as en))")).as(Seq("chunk_idx", "c")))
        .select($"doc_id", $"chunk_idx".cast("long").as("chunk_idx"),
          $"c.st".cast("long").as("start"),
          ($"c.en" - $"c.st" + 1).cast("long").as("chunk_len"),
          md5(expr("substring(nt, c.st, c.en - c.st + 1)")).as("chunk_md5"))
        .orderBy($"doc_id", $"chunk_idx")
    },
    // x18: TEXT NORMALIZATION — the canonicalization pass every downstream
    // op assumes has already happened: control characters become spaces,
    // whitespace runs collapse, edges trim. Pure per-row regex projections
    // (RE2-safe patterns shared verbatim with the oracle), no shuffle; at
    // 100 TB this runs fused into the ingest scan. `changed` + the digest
    // make the gate pin both the transform and which rows it touched.
    // x19: VOCABULARY COVERAGE — per source, how concentrated is the token
    // distribution: total/distinct tokens and the number of top-frequency
    // types covering ≥50% and ≥90% of token mass (the Zipf-concentration
    // statistic that flags templated/boilerplate sources before training).
    // Scale shape: the corpus reduces to the (source, token) FREQUENCY
    // table first (map-side combined — x11/x13's convention); the
    // cumulative window runs over vocabulary rows partitioned by source,
    // bounded by |vocab| per source however big the corpus. Thresholds
    // compare as integers (cum·2 ≥ total, cum·10 ≥ 9·total) — no division.
    "x19_vocab_coverage" -> { (s, dir) =>
      import s.implicits._
      val tf = Tables(s, dir).documents
        .select($"source", explode(expr(wsExpr)).as("tok"))
        .filter(length($"tok") > 0)
        .groupBy($"source", $"tok").agg(count(lit(1)).as("f"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"f".desc, $"tok")
      val cum = tf.withColumn("cumf", sum($"f").over(w))
        .withColumn("rk", row_number().over(w).cast("long"))
      val tot = tf.groupBy($"source")
        .agg(sum($"f").as("total"), count(lit(1)).as("n_distinct"))
      cum.join(broadcast(tot), Seq("source"))
        .groupBy($"source")
        .agg(max($"total").as("n_tokens"),
             max($"n_distinct").as("n_distinct"),
             min(when($"cumf" * 2 >= $"total", $"rk")).as("n_top50"),
             min(when($"cumf" * 10 >= $"total" * 9, $"rk")).as("n_top90"))
        .orderBy($"source")
    },
    // x20: LEXICAL DIVERSITY — per-language type-token ratio, the corpus
    // diversity diagnostic next to x19's per-source concentration (low TTR
    // flags repetitive/templated slices before training). Scale shape:
    // the corpus reduces to the (lang, token) frequency table first
    // (map-side combined, x11/x19's convention), then one bounded-by-vocab
    // aggregate per language — distinct is NEVER a count(distinct) Expand
    // over the raw token stream. The ratio surfaces as exact integer
    // per-mille (no doubles cross the gate).
    "x20_lexical_diversity" -> { (s, dir) =>
      import s.implicits._
      val tf = Tables(s, dir).documents
        .select($"lang", explode(expr(wsExpr)).as("tok"))
        .filter(length($"tok") > 0)
        .groupBy($"lang", $"tok").agg(count(lit(1)).as("f"))
      tf.groupBy($"lang")
        .agg(sum($"f").as("n_tokens"), count(lit(1)).as("n_types"))
        .withColumn("ttr_pm", expr("n_types * 1000 div n_tokens"))
        .orderBy($"lang")
    },
    "x18_text_normalize" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .withColumn("norm", expr(
          "trim(regexp_replace(regexp_replace(text, '[\\\\x00-\\\\x1f]', ' '), " +
            "' {2,}', ' '))"))
        .select($"doc_id", length($"text").cast("long").as("raw_len"),
          length($"norm").cast("long").as("norm_len"),
          ($"norm" =!= $"text").as("changed"), md5($"norm").as("norm_md5"))
        .orderBy($"doc_id")
    },
    "x7_tfidf_topk" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documentsSpread
      val n = Tables(s, dir).documents.count() // metadata count — no spread
      // round-14: spread + persist — toks feeds tf AND df (tokenize x2 on
      // a single-split scan before)
      val toks = docs
        .select($"doc_id", explode(expr(wsExpr)).as("tok"))
        .filter(length($"tok") > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tf = toks.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
      val df = toks.select($"doc_id", $"tok").distinct()
        .groupBy($"tok").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"score".desc, $"tok")
      tf.join(df, "tok")
        .withColumn("score", expr(s"(tf * ${n}L * 1000000L) div df"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 3)
        .select($"doc_id", $"rank", $"tok", $"score")
        .orderBy($"doc_id", $"rank")
    },
    // x21: BM25 RETRIEVAL — the classic probabilistic ranking function,
    // kept integer-exact so ranking is bitwise identical across engines.
    // The standard constants k1 = 1.2, b = 0.75 enter as exact rationals:
    // multiplying the per-term denominator tf + k1·(1−b+b·dl/avgdl) through
    // by 20·L (avgdl = L/N) gives the all-integer
    //   20·L·tf + 6·L + 18·dl·N,
    // and the numerator (k1+1)·tf·idf becomes 44·tf·L·idf over it. idf
    // avoids libm logarithms the way x7 does: idf = floor(log2(N div df))+1
    // = length(bin(N div df)) — exact on both engines. The query set is
    // DATA-RELATIVE (x12's convention, no tuned constant): the 5 vocabulary
    // terms whose df lands closest to N/10 — mid-selectivity, so stopwords
    // rank themselves out — picked by a TakeOrdered over the df table and
    // broadcast. Scale shape (100 TB): df/L/N are map-side-combined
    // aggregates; the scoring join touches only (query-term, doc) postings
    // (5 terms → 5 posting lists, never the corpus); final top-10 is
    // TakeOrderedAndProject — no global sort, no unpartitioned window. The
    // 10⁴ score scale keeps the intermediate 44·tf·L·idf·10⁴ under 2⁶³
    // only while tf·idf·L < ~2·10¹³ — i.e. safe to L ≈ 10¹⁰–10¹¹ tokens at
    // realistic tf/idf (tf·idf ≈ 10²), not 10¹². Past the bound Spark's
    // non-ANSI mul wraps silently while DuckDB raises; before shipping at
    // L beyond ~10¹⁰, drop a digit from the 10⁴ scale (ranking unaffected
    // — all docs share the factor) or reorder the div to shrink the
    // intermediate.
    // x24: COLLOCATION MINING — the phrase-vocabulary builder: corpus-wide
    // adjacent bigrams ranked by LIFT, n_ab·N_t² / (N_b·n_a·n_b) (the
    // monotone core of PMI with the log dropped — no libm across the
    // engine boundary). All counts are exact integers; the lift itself is
    // ONE pinned flat double expression evaluated identically on both
    // engines (per-row arithmetic on exact aggregates — the w9/x2
    // precedent, never a double crossing an aggregate). Scale shape: one
    // token explode feeds two map-side-combined count tables; bigram
    // counts join the (vocab-sized, broadcastable) unigram table twice;
    // totals are broadcast 1-row frames; top-20 is
    // TakeOrderedAndProject, never a global sort. Support floor
    // n_ab ≥ 5 keeps the output phrase-grade.
    // x25: CROSS-DOCUMENT BOILERPLATE DETECTION — the CCNet/RefinedWeb
    // curation step d13 does NOT cover: d13 finds a doc repeating ITSELF;
    // boilerplate is the same passage repeated ACROSS documents of one
    // source (headers, footers, nav chrome, license blocks). Unit = word
    // 8-gram (the corpus has no line structure); a gram is boilerplate in
    // a source when ≥5 DISTINCT docs of that source contain it. Report
    // per source: gram-type counts, boilerplate types, total boilerplate
    // hits, and the hit rate in bp — the "how much of this source is
    // chrome" dial a crawl pipeline reads before excising. Scale shape:
    // the df table is ONE map-side-combined groupBy(source, hash) — a
    // viral gram never concentrates on a partition (the d15/d16 groupBy
    // convention, not a window); everything after is |sources|-row
    // metadata. 8-gram fan-out is linear in corpus tokens.
    "x25_boilerplate_passages" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documents
        .select($"doc_id", $"source", expr(Tx.wsExpr).as("ws"))
        .filter(size($"ws") >= 8)
      val grams = docs.select($"doc_id", $"source", explode(expr(
        "transform(sequence(1, size(ws) - 7), " +
          "i -> array_join(slice(ws, i, 8), ' '))")).as("g"))
        .select($"doc_id", $"source", md5($"g").as("h"))
      val df8 = grams.groupBy($"source", $"h")
        .agg(countDistinct($"doc_id").as("df"), count(lit(1)).as("occ"))
      val tot = df8.groupBy($"source")
        .agg(count(lit(1)).as("n_gram_types"), sum($"occ").as("n_grams"))
      val bl = df8.filter($"df" >= 5).groupBy($"source")
        .agg(count(lit(1)).as("n_boiler_types"), sum($"occ").as("boiler_hits"))
      tot.join(bl, Seq("source"), "left")
        .na.fill(0L, Seq("n_boiler_types", "boiler_hits"))
        .withColumn("hit_rate_bp", expr("boiler_hits * 10000 div n_grams"))
        .orderBy($"source")
    },
    "x24_collocations" -> { (s, dir) =>
      import s.implicits._
      val toks = Tables(s, dir).documents
        .select(expr(Tx.wsExpr).as("ws")).filter(size($"ws") >= 2)
      val uni = toks.select(explode($"ws").as("w"))
      val un = uni.groupBy($"w").agg(count(lit(1)).as("n"))
      val nt = un.agg(sum($"n").as("n_t"))
      val bg = toks.select(explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> struct(element_at(ws, i) as w1, element_at(ws, i + 1) as w2))"))
        .as("b")).select($"b.w1", $"b.w2")
      val nb = bg.agg(count(lit(1)).as("n_b"))
      bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("n_ab"))
        .filter($"n_ab" >= 5)
        .join(broadcast(un.select($"w".as("w1"), $"n".as("n_a"))), Seq("w1"))
        .join(broadcast(un.select($"w".as("w2"), $"n".as("n_b2"))), Seq("w2"))
        .crossJoin(broadcast(nt)).crossJoin(broadcast(nb))
        .withColumn("lift", expr(
          "cast(n_ab as double) * cast(n_t as double) * cast(n_t as double)" +
            " / (cast(n_b as double) * cast(n_a as double) * cast(n_b2 as double))"))
        .select($"w1", $"w2", $"n_ab", $"lift")
        .orderBy($"lift".desc, $"w1", $"w2")
        .limit(20)
    },
    // x27: KEYPHRASE EXTRACTION (RAKE) — x24 ranks word PAIRS by lift;
    // RAKE extracts multi-word PHRASES: candidate phrases are maximal
    // stopword-free token runs (stopwords delimit), each phrase TYPE
    // scored by Σ_w deg(w)/freq(w) over its words, where freq counts a
    // word's phrase occurrences and deg sums the lengths of phrases
    // containing it (longer-phrase words score higher — RAKE's core
    // heuristic). The ratio is kept integer (deg·10⁴ div freq summed
    // per word) so both engines truncate identically. Scale shape: the
    // phrase-id running count is a PER-DOC window (bounded, co-located);
    // word stats and phrase types are map-side-combined groupBys; the
    // word-stats join fans out only phrase TYPES, not occurrences.
    // Top-20 is a k-row TakeOrderedAndProject.
    "x27_keyphrases" -> { (s, dir) =>
      import s.implicits._
      val toks = Tables(s, dir).documents
        .select($"doc_id", posexplode(expr(Tx.wsExpr)))
        .withColumnRenamed("col", "tok")
      val wD = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"pos")
      val phr = toks
        .withColumn("is_stop", $"tok".isInCollection(stopwords))
        .withColumn("pid", sum(when($"is_stop", 1L).otherwise(0L)).over(wD))
        .filter(!$"is_stop" && length($"tok") > 0)
        .groupBy($"doc_id", $"pid")
        .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok), ' ')").as("phrase"),
             count(lit(1)).as("len"))
      val wst = phr.select(explode(split($"phrase", " ")).as("w"), $"len")
        .groupBy($"w")
        .agg(count(lit(1)).as("freq"), sum($"len").as("deg"))
      val ptype = phr.groupBy($"phrase", $"len")
        .agg(count(lit(1)).as("n_occ"))
      ptype
        .select($"phrase", $"len", $"n_occ",
                explode(split($"phrase", " ")).as("w"))
        .join(broadcast(wst), Seq("w"))
        .groupBy($"phrase", $"len", $"n_occ")
        .agg(sum(expr("(deg * 10000) div freq")).as("score_bp"))
        .filter($"n_occ" >= 3)
        .select($"phrase", $"len".as("n_words"), $"n_occ", $"score_bp")
        .orderBy($"score_bp".desc, $"phrase")
        .limit(20)
    },
    // x28: VOCABULARY GROWTH CURVE (Heaps-law profile) — how fast the
    // corpus keeps yielding NEW token types as it grows, the statistic
    // that tells a crawl team whether more of the same source still buys
    // vocabulary (and the sanity check on x19's coverage numbers). The
    // corpus is cut into 10 doc_id-range slices; each token type is
    // charged to the FIRST slice containing it (one min-aggregate per
    // type — order-sensitive distinct growth WITHOUT any ordered scan),
    // then cumulative tokens/vocab and the type-token ratio in bp run
    // over the 10-row slice frame. Scale shape (100 TB): one token
    // explosion into two map-side-combined groupBys (per-slice counts,
    // per-type min-slice — the shuffle carries |vocab| rows, never
    // positions); the cumulative window is the bounded 10-row bucket
    // domain (dq10's allowlisted class).
    "x28_vocab_growth" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documents
        .select($"doc_id", expr(Tx.wsExpr).as("ws"))
      val mx = docs.agg(max($"doc_id").as("mx"))
      val toks = docs.crossJoin(broadcast(mx))
        .select(expr("least(9, doc_id * 10 div (mx + 1))").as("b"),
                explode($"ws").as("tok"))
        .filter(length($"tok") > 0)
      val perB = toks.groupBy($"b").agg(count(lit(1)).as("n_tok"))
      val firstB = toks.groupBy($"tok").agg(min($"b").as("b"))
        .groupBy($"b").agg(count(lit(1)).as("n_new"))
      val wC = org.apache.spark.sql.expressions.Window
        .orderBy($"b").rowsBetween(Long.MinValue, 0)
      perB.join(firstB, Seq("b"), "left")
        .na.fill(0L, Seq("n_new"))
        .withColumn("cum_tokens", sum($"n_tok").over(wC))
        .withColumn("cum_vocab", sum($"n_new").over(wC))
        .withColumn("ttr_bp", expr("cum_vocab * 10000 div cum_tokens"))
        .select($"b".as("bucket"), $"n_tok", $"n_new",
                $"cum_tokens", $"cum_vocab", $"ttr_bp")
        .orderBy($"bucket")
    },
    "x21_bm25_topk" -> { (s, dir) =>
      import s.implicits._
      // everything derives from ONE tokenize pass: tf is the only operator
      // that reads the corpus; dl/df/N/L are aggregates OVER tf (dl =
      // Σ tf per doc, L = Σ tf, N = |dl|) — re-deriving each from the raw
      // token stream would tokenize the corpus four times.
      val tf = Tables(s, dir).documentsSpread
        .select($"doc_id", explode(expr(wsExpr)).as("tok"))
        .filter(length($"tok") > 0)
        .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
        .localCheckpoint(false)
      val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
      val dft = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
      val nl = dl.agg(count(lit(1)).as("n"), sum($"dl").as("l"))
      val q = dft.crossJoin(broadcast(nl))
        .orderBy(abs($"df" * 10 - $"n"), $"tok").limit(5)
        .select($"tok", $"df")
      tf.join(broadcast(q), Seq("tok"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(nl))
        .withColumn("idf", length(bin(expr("n div df"))).cast("long"))
        .withColumn("term_score",
          expr("(44 * tf * l * idf * 10000) div (20 * l * tf + 6 * l + 18 * dl * n)"))
        .groupBy($"doc_id", $"dl")
        .agg(sum($"term_score").as("score_sc"), count(lit(1)).as("n_hit"))
        .select($"doc_id", $"dl", $"n_hit", $"score_sc",
          ($"score_sc".cast("double") / 10000.0).as("bm25"))
        .orderBy($"score_sc".desc, $"doc_id")
        .limit(10)
    },
    // x22: SEMANTIC DECONTAMINATION — x9's benchmark-decontamination
    // completed on the EMBEDDING side: a corpus vector is contaminated iff
    // an eval-set vector (vec_id % 97, x9's held-out convention) in its
    // quantizer cell sits at cos ≥ 0.3 (d17's cell machinery pointed at a
    // broadcast eval side; the threshold is looser than dedup's 0.4 —
    // decontamination wants recall on paraphrased eval items that lexical
    // x9 misses). Output is the per-vector verdict gate (d17's shape), so
    // the corpus filter is one joinable boolean. Scale shape (100 TB):
    // cell assignment is a literal-centroid projection (no shuffle); the
    // eval side is tiny and BROADCAST, so the corpus never shuffles — the
    // scoring join is batch-side corpus × in-cell eval vectors only, the
    // exact analog of x9's broadcast shingle set. Eval×eval and
    // corpus×corpus pairs never score.
    "x22_semantic_decontam" -> { (s, dir) =>
      import s.implicits._
      val e = Tables(s, dir).embeddings
        .withColumn("v", $"embedding".cast("array<double>"))
        .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
        .select($"vec_id", $"v", $"norm2")
      val cents = Quantizer.centroidsFor(e, dir, iters = 2, dim = 64)
      val cells = Quantizer.assign(e, cents)
      val evalCells = cells.filter(pmod($"vec_id", lit(97)) === 0)
        .select($"cell", $"vec_id".as("e_id"), $"v".as("ev"), $"norm2".as("en2"))
      val corpus = cells.filter(pmod($"vec_id", lit(97)) =!= 0)
      val hits = corpus.join(broadcast(evalCells), Seq("cell"))
        .withColumn("cos",
          graft.functions.VectorExprs.cosine($"v", $"ev", $"norm2", $"en2"))
        .filter($"cos" >= 0.3)
        .groupBy($"vec_id").agg(count(lit(1)).as("n_hits"))
      corpus.join(hits, Seq("vec_id"), "left")
        .select($"vec_id", $"cell".cast("long").as("cell"),
          coalesce($"n_hits", lit(0L)).as("n_eval_hits"),
          (coalesce($"n_hits", lit(0L)) === 0L).as("clean"))
        .orderBy($"vec_id")
    },
    // x23: CENTROID (Rocchio) CLASSIFIER over the embedding column — the
    // cheapest trainable document classifier a curation pipeline deploys
    // (domain/language routing, quality-tier assignment): train = one
    // per-class mean of the training split's vectors, classify = argmax
    // cosine to the class centroids. Cosine only sees the centroid's
    // DIRECTION, so the count divisor cancels and the per-class integer
    // SUM (v6's fixed-point projection — exact under any partition order)
    // IS the model; no mean, no division, bitwise-identical on both
    // engines (|sum| ≤ n·2²⁴ stays double-exact to ~2⁵³, i.e. corpora of
    // ~5·10⁸ docs per class; past that, drop to a 2¹⁶ scale).
    // Scale shape (100 TB): training is one map-side-combined aggregate
    // shuffling L×64 integer rows; the model (L classes × dim) collects as
    // driver state (the Quantizer discipline) and inlines as LITERALS into
    // the classify projection — inference is shuffle-free, no join, no
    // window; the confusion matrix is an L² aggregate. Split: train
    // vec_id % 5 ≠ 0, evaluate on the held-out rest — the output is the
    // confusion matrix a team reads before trusting the router.
    "x23_centroid_classifier" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val labeled = t.embeddings
        .withColumn("v", $"embedding".cast("array<double>"))
        .select($"vec_id", $"v")
        .join(t.documents.select($"doc_id".as("vec_id"), $"lang"), Seq("vec_id"))
      centroidClassify(labeled, dim = 64)
    },
    // x30: GOPHER-STYLE QUALITY RULE TABLE — the published-pipeline
    // heuristic gate (Rae et al. 2021's document filters; C4/CCNet carry
    // similar rule sets) as ONE auditable table: six integer-exact rules
    // (short doc, mean word length out of [3,10], symbol-heavy,
    // too-few stopwords, >25% duplicate words, top-bigram dominance)
    // evaluated per doc from the proven x1/x2/x8 kernels in one pass,
    // then unpivoted (stack — dq2's shape, shuffle keyed on the BOUNDED
    // rule list) into per-rule violation counts + the all-rules-pass
    // row a curation team reads before shipping the gate. Every
    // threshold is an integer cross-multiplication — no float compare
    // can disagree between engines. Scale: one corpus scan, one 7-row
    // aggregate; the rule table costs the same at any corpus size.
    "x30_gopher_rules" -> { (s, dir) =>
      import s.implicits._
      val k = graft.functions.TextKernels
      val flags = Tables(s, dir).documents
        .withColumn("ts", k.tokenStatsUdf($"text"))
        .withColumn("qc", k.qualityCountsUdf(stopwords.toSet)($"text"))
        .withColumn("rc", k.repetitionUdf($"text"))
        .withColumn("ln", greatest(length($"text"), lit(1)))
        .select(
          ($"rc.n_words" < 30).as("r1_short"),
          ($"ts.sum_token_len" < $"ts.n_tokens" * 3 ||
            $"ts.sum_token_len" > $"ts.n_tokens" * 10).as("r2_word_len"),
          ($"qc.punct_cnt" * 10 > $"ln").as("r3_symbol_heavy"),
          ($"qc.stop_cnt" < 2).as("r4_few_stopwords"),
          (($"rc.n_words" - $"rc.n_distinct") * 4 > $"rc.n_words").as("r5_dup_words"),
          ($"rc.top_bigram_n" * 5 > $"rc.n_words").as("r6_top_bigram"))
        .withColumn("zz_all_pass",
          !($"r1_short" || $"r2_word_len" || $"r3_symbol_heavy" ||
            $"r4_few_stopwords" || $"r5_dup_words" || $"r6_top_bigram"))
      flags.selectExpr(
        """stack(7, 'r1_short', r1_short, 'r2_word_len', r2_word_len,
                    'r3_symbol_heavy', r3_symbol_heavy,
                    'r4_few_stopwords', r4_few_stopwords,
                    'r5_dup_words', r5_dup_words, 'r6_top_bigram', r6_top_bigram,
                    'zz_all_pass', zz_all_pass) as (rule, flagged)""")
        .groupBy($"rule")
        .agg(sum(when($"flagged", 1L).otherwise(0L)).as("n_docs"),
             count(lit(1)).as("n_total"))
        .select($"rule", $"n_docs",
                expr("n_docs * 10000 div n_total").as("rate_bp"))
        .orderBy($"rule")
    },
    // x29: MODEL-BASED QUALITY FILTER — distributed logistic regression,
    // the production curation stage x2's hand-set heuristic and x23's
    // embedding-centroid router don't cover: a LEARNED filter over cheap
    // text statistics (the FastText/"quality classifier" slot in every
    // published pretraining pipeline). Features are x2's proven-parity
    // integer counts turned into 5 bounded doubles (bias, tokens/256,
    // punct ratio, digit ratio, stopword ratio); the training label is an
    // INTEGER predicate (stop_cnt·4 ≥ n_tokens ∧ punct_cnt·10 ≤ len —
    // "stopword-rich, punctuation-light prose"), so no float boundary can
    // flip a label between engines. Training = 3 unrolled full-batch
    // gradient-descent iterations (w₀ = 0, η = 2⁻⁴ — an exact binary
    // fraction): each iteration is ONE map-side-combined aggregate
    // computing the 5 gradient sums with per-doc contributions quantized
    // to round(g·2²⁴) BIGINT (the Quantizer/x23 fixed-point discipline —
    // exact under any partition order; double-exact to ~5·10⁸ docs, past
    // that drop the scale); the 5-weight model updates on the DRIVER
    // (w18's bounded-model convention) and re-enters the next iteration
    // as literals. The sigmoid is the RATIONAL fast-sigmoid
    // 0.5 + 0.5·z/(1+|z|) — add/mul/div/abs only, so every score is
    // IEEE-bitwise identical in DuckDB, which replays all 3 iterations as
    // unrolled CTEs (exp() would be libm-dependent). Output = the
    // (label × predicted) confusion with fixed-point score sums — wrong
    // weights anywhere flip cells. Scale shape (100 TB): 3 corpus scans,
    // each a 5-number aggregate; scoring is a shuffle-free projection;
    // nothing data-scale ever reaches the driver. LrQualitySpec pins the
    // distributed run against a plain-Scala serial-GD twin bitwise.
    "x29_lr_quality_filter" -> { (s, dir) =>
      import s.implicits._
      val (w, f) = trainLrQuality(s, dir)
      val z = lrZ(w)
      val sgm = lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))
      f.groupBy($"y".cast("bigint").as("y_label"),
                when(z >= 0.0, 1L).otherwise(0L).as("predicted"))
        .agg(count(lit(1)).as("n_docs"),
             sum(round(sgm * LrScale).cast("long")).as("sum_score_fp"))
        .orderBy($"y_label", $"predicted")
    }
  )

  /** x29's fixed-point scale (the Quantizer's 2²⁴). */
  private[graft] val LrScale = 16777216.0

  /** x29's linear term over the feature frame, serial-fold order — the
    * SQL twin writes the same left-assoc parenthesization. */
  private[graft] def lrZ(w: Array[Double]): org.apache.spark.sql.Column =
    lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
      lit(w(3)) * col("x3") + lit(w(4)) * col("x4")

  /** x29's feature frame: (doc_id, x1..x4, y) — x2's integer counts as
    * bounded doubles plus the integer-predicate label (entry scaladoc). */
  private[graft] def lrFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir).documents
      .withColumn("qc",
        graft.functions.TextKernels.qualityCountsUdf(stopwords.toSet)($"text"))
      .withColumn("ln", greatest(length($"text"), lit(1)))
      .select(
        $"doc_id",
        ($"qc.n_tokens".cast("double") / 256.0).as("x1"),
        ($"qc.punct_cnt".cast("double") / $"ln".cast("double")).as("x2"),
        ($"qc.digit_cnt".cast("double") / $"ln".cast("double")).as("x3"),
        ($"qc.stop_cnt".cast("double") / $"qc.n_tokens".cast("double")).as("x4"),
        when($"qc.stop_cnt" * 4 >= $"qc.n_tokens" &&
             $"qc.punct_cnt" * 10 <= $"ln", 1.0).otherwise(0.0).as("y"))
  }

  /** x29's training loop: 3 unrolled GD iterations, gradients as exact
    * fixed-point BIGINT aggregates, weight updates on the driver with the
    * exact double expression the oracle CTEs replay. Returns the final
    * weights and the feature frame. */
  private[graft] def trainLrQuality(
      s: SparkSession, dir: String): (Array[Double], DataFrame) = {
    import s.implicits._
    val f = lrFeatures(s, dir)
    val n = f.count().toDouble
    var w = Array.fill(5)(0.0)
    for (_ <- 1 to LrIters) {
      val z = lrZ(w)
      val d = lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z)) - $"y"
      val g = f.agg(
        sum(round(d * LrScale).cast("long")).as("g0"),
        sum(round(d * $"x1" * LrScale).cast("long")).as("g1"),
        sum(round(d * $"x2" * LrScale).cast("long")).as("g2"),
        sum(round(d * $"x3" * LrScale).cast("long")).as("g3"),
        sum(round(d * $"x4" * LrScale).cast("long")).as("g4")).head()
      w = Array.tabulate(5)(j =>
        w(j) - LrEta * ((g.getLong(j).toDouble / LrScale) / n))
    }
    (w, f)
  }

  private[graft] val LrIters = 3
  private[graft] val LrEta = 0.0625
  private val LrScaleSql = "16777216.0"
  private val LrEtaSql = "0.0625"

  /** x29's DuckDB twin: the feature CTE is x2's proven fragment; each GD
    * iteration is (z-projection, 5 fixed-point gradient sums, a 1-row
    * weight CTE) with the weight/score arithmetic written in the exact
    * left-assoc parenthesization the Spark side folds. */
  private lazy val lrQualitySql: String = {
    def zSql = "((((w.w0 + w.w1 * x1) + w.w2 * x2) + w.w3 * x3) + w.w4 * x4)"
    def sgm(z: String) = s"(0.5 + 0.5 * $z / (1.0 + abs($z)))"
    val s0 = sgm("z")
    val iterCtes = (1 to LrIters).map { t =>
      s"""
      zt$t AS (SELECT y, x1, x2, x3, x4, $zSql AS z
               FROM f CROSS JOIN wi${t - 1} w),
      gt$t AS (SELECT
          SUM(CAST(round(($s0 - y) * $LrScaleSql) AS BIGINT)) AS g0,
          SUM(CAST(round(($s0 - y) * x1 * $LrScaleSql) AS BIGINT)) AS g1,
          SUM(CAST(round(($s0 - y) * x2 * $LrScaleSql) AS BIGINT)) AS g2,
          SUM(CAST(round(($s0 - y) * x3 * $LrScaleSql) AS BIGINT)) AS g3,
          SUM(CAST(round(($s0 - y) * x4 * $LrScaleSql) AS BIGINT)) AS g4
        FROM zt$t),
      wi$t AS (SELECT
          ${(0 to 4).map(j =>
            s"w.w$j - $LrEtaSql * ((CAST(g.g$j AS DOUBLE) / $LrScaleSql) / n.n) AS w$j")
            .mkString(",\n          ")}
        FROM wi${t - 1} w CROSS JOIN gt$t g CROSS JOIN n0 n)"""
    }.mkString(",", ",", "")
    s"""
      WITH f AS (
        SELECT doc_id,
               CAST(n_tokens AS DOUBLE) / 256.0 AS x1,
               CAST(punct_cnt AS DOUBLE) / CAST(ln AS DOUBLE) AS x2,
               CAST(digit_cnt AS DOUBLE) / CAST(ln AS DOUBLE) AS x3,
               CAST(stop_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS x4,
               CASE WHEN stop_cnt * 4 >= n_tokens AND punct_cnt * 10 <= ln
                    THEN 1.0 ELSE 0.0 END AS y
        FROM (
          SELECT doc_id,
                 greatest(len(ws), 1) AS n_tokens,
                 length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct_cnt,
                 length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digit_cnt,
                 len(list_filter(ws, t -> ${inList("t", stopwords)})) AS stop_cnt,
                 greatest(length(text), 1) AS ln
          FROM (SELECT doc_id, text, $wsSql AS ws FROM documents) t0) t),
      n0 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM f),
      wi0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4)
      $iterCtes,
      scored AS (SELECT y, $zSql AS z FROM f CROSS JOIN wi$LrIters w)
      SELECT CAST(y AS BIGINT) AS y_label,
             (CASE WHEN z >= 0.0 THEN 1 ELSE 0 END)::BIGINT AS predicted,
             COUNT(*)::BIGINT AS n_docs,
             SUM(CAST(round($s0 * $LrScaleSql) AS BIGINT))::BIGINT AS sum_score_fp
      FROM scored GROUP BY 1, 2 ORDER BY 1, 2"""
  }

  /** x23's core over any (vec_id, v: array<double>, lang) frame — factored
    * so the spec can drive it with planted separable classes. Train on
    * vec_id % 5 ≠ 0, predict the held-out rest, return the confusion
    * matrix (true_lang, pred_lang, n). */
  private[graft] def centroidClassify(labeled: DataFrame, dim: Int): DataFrame = {
    val s = labeled.sparkSession
    import s.implicits._
    val sums = labeled.filter(pmod($"vec_id", lit(5)) =!= 0)
      .select($"lang", posexplode($"v").as(Seq("dim", "x")))
      .withColumn("q", expr(s"cast(round(x * ${Quantizer.Scale}) as bigint)"))
      .groupBy($"lang", $"dim").agg(sum($"q").as("sq"))
      .collect()
    val cents = sums.groupBy(_.getString(0)).toSeq.map { case (lang, rs) =>
      val cv = new Array[Double](dim)
      rs.foreach(r => cv(r.getInt(1)) = r.getLong(2).toDouble)
      var n2 = 0.0; var i = 0
      while (i < dim) { n2 += cv(i) * cv(i); i += 1 }
      (lang, cv, n2)
    }.sortBy(_._1)
    // NaN cosine (a zero-norm centroid or test vector) maps to neg = -Inf so
    // the argmin picks it FIRST — DuckDB's ORDER BY cos DESC ranks NaN first,
    // while Spark's array_min would rank NaN last and skip the class (the
    // pqResidualBooksFor NaN-first convention, applied here too)
    val scored = array(cents.map { case (lang, cv, cn2) =>
      struct(nanvl(-graft.functions.VectorExprs.cosine(
        $"v", typedLit(cv.toSeq), $"n2", lit(cn2)),
        lit(Double.NegativeInfinity)).as("neg"),
        lit(lang).as("lang"))
    }: _*)
    labeled.filter(pmod($"vec_id", lit(5)) === 0)
      .withColumn("n2", graft.functions.VectorExprs.dot($"v", $"v"))
      .withColumn("pred_lang", array_min(scored).getField("lang"))
      .groupBy($"lang".as("true_lang"), $"pred_lang")
      .agg(count(lit(1)).as("n"))
      .select($"true_lang", $"pred_lang", $"n")
      .orderBy($"true_lang", $"pred_lang")
  }

  /** x15's chunk map — fixed 500-char chunks at stride 400 (100 overlap),
    * char-aligned on both engines — factored so composed retrieval (c6)
    * consumes the SAME chunk stage x15 pins. Input needs (doc_id, text);
    * output (doc_id, chunk_idx, chunk). */
  private[catalog] def chunked(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", $"text",
        explode(expr("sequence(0, (greatest(length(text), 1) - 1) div 400)"))
          .as("chunk_idx"))
      .select($"doc_id", $"chunk_idx".cast("long").as("chunk_idx"),
        expr("substring(text, chunk_idx * 400 + 1, 500)").as("chunk"))
  }

  /** RE2-safe PII patterns (identical strings feed Spark and DuckDB). */
  private[catalog] val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[catalog] val PhonePat = "[0-9]{3}-[0-9]{4}"

  private[catalog] val caseSql =
    """CASE WHEN s_en >= greatest(s_de, s_es, s_fr, s_zh) THEN 'en'
      |     WHEN s_de >= greatest(s_es, s_fr, s_zh) THEN 'de'
      |     WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
      |     WHEN s_fr >= s_zh THEN 'fr'
      |     ELSE 'zh' END""".stripMargin

  /** x13/x14's shared training CTEs: w0 = the @-marked word-frequency
    * table; each round counts adjacent pairs of w(r−1), picks best_r, and
    * applies the boundary-safe merge — unrolled three times. */
  private def bpeTrainCtes: String = {
    def round(r: Int): String = {
      val prev = if (r == 1) "w0" else s"w${r - 1}"
      s"""
      pairs$r AS (
        SELECT pair, SUM(freq)::BIGINT AS c FROM (
          SELECT freq,
                 unnest(list_transform(range(1, len(ss)),
                        i -> ss[i] || ' ' || ss[i + 1])) AS pair
          FROM (SELECT freq, string_split(seq, ' ') AS ss FROM $prev) t
          WHERE len(ss) >= 2) p
        GROUP BY pair),
      best$r AS (SELECT pair, c FROM pairs$r ORDER BY c DESC, pair LIMIT 1),
      w$r AS (
        SELECT freq,
               rtrim(replace(seq || ' ', (SELECT pair FROM best$r) || ' ',
                       '@' || replace((SELECT pair FROM best$r), ' @', '') || ' ')) AS seq
        FROM $prev)"""
    }
    s"""w0 AS (
        SELECT COUNT(*)::BIGINT AS freq,
               '@' || array_to_string(list_transform(range(1, length(tok) + 1),
                      i -> tok[i]), ' @') AS seq
        FROM (SELECT unnest(ws) AS tok
              FROM (SELECT $wsSql AS ws FROM documents) t0) t1
        WHERE length(tok) > 0
        GROUP BY tok),
      ${round(1)},
      ${round(2)},
      ${round(3)}"""
  }

  val oracle: Map[String, String] = Map(
    "x10_pii_redact" -> s"""
      WITH a AS (
        SELECT doc_id,
               concat(text, ' contact user', doc_id, '@mail', doc_id % 7,
                      '.com or call 555-', lpad((doc_id % 10000)::VARCHAR, 4, '0'),
                      ' now') AS aug
        FROM documents),
      r AS (
        SELECT doc_id,
               len(regexp_extract_all(aug, '$EmailPat'))::BIGINT AS n_emails,
               regexp_replace(aug, '$EmailPat', '<EMAIL>', 'g') AS r1
        FROM a)
      SELECT doc_id, n_emails,
             len(regexp_extract_all(r1, '$PhonePat'))::BIGINT AS n_phones,
             length(regexp_replace(r1, '$PhonePat', '<PHONE>', 'g'))::BIGINT AS red_len,
             md5(regexp_replace(r1, '$PhonePat', '<PHONE>', 'g')) AS red_digest
      FROM r ORDER BY doc_id""",
    "x11_heavy_hitters" -> s"""
      SELECT tok, COUNT(*) AS n
      FROM (SELECT unnest(ws) AS tok
            FROM (SELECT $wsSql AS ws FROM documents) t0) t1
      WHERE length(tok) > 0
      GROUP BY tok ORDER BY n DESC, tok LIMIT 20""",
    "x13_bpe_learn" -> s"""
      WITH $bpeTrainCtes
      SELECT merge_rank, pair, weighted_count FROM (
        SELECT 1::BIGINT AS merge_rank, pair, c AS weighted_count FROM best1
        UNION ALL
        SELECT 2::BIGINT, pair, c FROM best2
        UNION ALL
        SELECT 3::BIGINT, pair, c FROM best3) u
      ORDER BY merge_rank""",
    // x14: the same trained merges applied to per-(doc, word) sequences —
    // three boundary-safe scalar-subquery replaces, then tokens per doc
    "x14_bpe_apply" -> s"""
      WITH $bpeTrainCtes,
      dt AS (
        SELECT doc_id,
               '@' || array_to_string(list_transform(range(1, length(tok) + 1),
                      i -> tok[i]), ' @') AS seq
        FROM (SELECT doc_id, unnest(ws) AS tok
              FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1
        WHERE length(tok) > 0),
      ${(1 to 3).map { r =>
        val prev = if (r == 1) "dt" else s"d${r - 1}"
        s"""d$r AS (
        SELECT doc_id,
               rtrim(replace(seq || ' ', (SELECT pair FROM best$r) || ' ',
                       '@' || replace((SELECT pair FROM best$r), ' @', '') || ' ')) AS seq
        FROM $prev)"""
      }.mkString(",\n      ")}
      SELECT doc_id, COUNT(*)::BIGINT AS n_words,
             SUM(len(string_split(seq, ' ')))::BIGINT AS n_tokens
      FROM d3 GROUP BY doc_id ORDER BY doc_id""",
    "x15_chunk_pack" -> """
      SELECT doc_id, i AS chunk_idx,
             length(substr(text, i * 400 + 1, 500))::BIGINT AS chunk_len,
             md5(substr(text, i * 400 + 1, 500)) AS chunk_md5
      FROM (SELECT doc_id, text,
                   unnest(range(0, ((greatest(length(text), 1) - 1) // 400) + 1))::BIGINT AS i
            FROM documents) t
      ORDER BY doc_id, chunk_idx""",
    "x12_rare_token_filter" -> s"""
      WITH toks AS (
        SELECT doc_id, tok
        FROM (SELECT doc_id, unnest(ws) AS tok
              FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1
        WHERE length(tok) > 0),
      vocab AS (SELECT tok, COUNT(*)::BIGINT AS cnt FROM toks GROUP BY tok),
      thr AS (SELECT (SUM(cnt) // (COUNT(*) * 2))::BIGINT AS thr FROM vocab)
      SELECT doc_id, n_tokens, n_rare, rare_pm, rare_pm < 500 AS keep FROM (
        SELECT k.doc_id, COUNT(*)::BIGINT AS n_tokens,
               SUM(CASE WHEN v.cnt < t.thr THEN 1 ELSE 0 END)::BIGINT AS n_rare,
               ((SUM(CASE WHEN v.cnt < t.thr THEN 1 ELSE 0 END) * 1000)
                 // COUNT(*))::BIGINT AS rare_pm
        FROM toks k JOIN vocab v USING (tok) CROSS JOIN thr t
        GROUP BY k.doc_id) s
      ORDER BY doc_id""",
    "x8_repetition" -> s"""
      WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
      base AS (
        SELECT doc_id, len(ws)::BIGINT AS n_words,
               len(list_distinct(ws))::BIGINT AS n_distinct,
               list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS bgs
        FROM w),
      mx AS (
        SELECT doc_id, MAX(c)::BIGINT AS top_bigram_n
        FROM (SELECT doc_id, b, COUNT(*) AS c
              FROM (SELECT doc_id, unnest(bgs) AS b FROM base) t GROUP BY 1, 2) t2
        GROUP BY doc_id)
      SELECT b.doc_id, b.n_words,
             COALESCE(m.top_bigram_n, 0)::BIGINT AS top_bigram_n,
             COALESCE(m.top_bigram_n, 0)::DOUBLE / greatest(b.n_words - 1, 1) AS frac_top_bigram,
             (b.n_words - b.n_distinct)::DOUBLE / b.n_words AS frac_dup_words
      FROM base b LEFT JOIN mx m ON m.doc_id = b.doc_id
      ORDER BY b.doc_id""",
    // x22: d17's quantizer CTEs, hits = corpus × in-cell eval at cos ≥ 0.3.
    "x22_semantic_decontam" -> s"""
      WITH e AS (
        SELECT vec_id, v, ${Tx.dotSql("v", "v")} AS norm2
        FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              FROM embeddings) t),
      ${Quantizer.centroidsSql(iters = 2, dim = 64)}
      ${Quantizer.cellsSql},
      hits AS (
        SELECT c.vec_id, COUNT(*) AS n_hits
        FROM kcells c JOIN kcells q
          ON q.vec_id % 97 = 0 AND c.cell = q.cell
        WHERE c.vec_id % 97 <> 0
          AND ${Tx.dotSql("c.v", "q.v")} / (sqrt(c.norm2) * sqrt(q.norm2)) >= 0.3
        GROUP BY c.vec_id)
      SELECT c.vec_id, c.cell::BIGINT AS cell,
             COALESCE(h.n_hits, 0)::BIGINT AS n_eval_hits,
             COALESCE(h.n_hits, 0) = 0 AS clean
      FROM kcells c LEFT JOIN hits h ON h.vec_id = c.vec_id
      WHERE c.vec_id % 97 <> 0
      ORDER BY c.vec_id""",
    "x23_centroid_classifier" -> s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        FROM embeddings),
      lab AS (
        SELECT e.vec_id, e.v, d.lang
        FROM e JOIN documents d ON d.doc_id = e.vec_id),
      sums AS (
        SELECT lang, i.dim,
               SUM(CAST(round(v[i.dim + 1] * ${Quantizer.Scale}) AS BIGINT))::BIGINT AS sq
        FROM lab CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) i
        WHERE vec_id % 5 <> 0
        GROUP BY lang, i.dim),
      cent AS (
        SELECT lang, cv, ${Tx.dotSql("cv", "cv")} AS cn2 FROM (
          SELECT lang, list_transform(list(sq ORDER BY dim), x -> x::DOUBLE) AS cv
          FROM sums GROUP BY lang) z),
      test AS (
        SELECT vec_id, v, lang, ${Tx.dotSql("v", "v")} AS n2
        FROM lab WHERE vec_id % 5 = 0),
      pred AS (
        SELECT vec_id, true_lang, pred_lang FROM (
          SELECT t.vec_id, t.lang AS true_lang, c.lang AS pred_lang,
                 row_number() OVER (PARTITION BY t.vec_id ORDER BY
                   ${Tx.dotSql("t.v", "c.cv")} / (sqrt(t.n2) * sqrt(c.cn2)) DESC,
                   c.lang) AS rk
          FROM test t CROSS JOIN cent c) z WHERE rk = 1)
      SELECT true_lang, pred_lang, COUNT(*)::BIGINT AS n
      FROM pred GROUP BY true_lang, pred_lang
      ORDER BY true_lang, pred_lang""",
    // x29: all 3 GD iterations replayed as unrolled CTEs — same fixed-
    // point BIGINT gradient sums, same IEEE weight/score arithmetic
    // (rational sigmoid: no exp(), so no libm divergence)
    "x29_lr_quality_filter" -> lrQualitySql,
    // x30: the same six integer rules + all-pass, unpivoted via UNION ALL
    "x30_gopher_rules" -> s"""
      WITH w AS (SELECT doc_id, text, $wsSql AS ws FROM documents),
      base AS (
        SELECT doc_id,
               len(ws)::BIGINT AS n_words,
               len(list_distinct(ws))::BIGINT AS n_distinct,
               list_reduce(list_prepend(0, list_transform(ws, t -> length(t))),
                           (a, x) -> a + x)::BIGINT AS sum_len,
               length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
                 AS punct_cnt,
               len(list_filter(ws, t -> ${inList("t", stopwords)})) AS stop_cnt,
               greatest(length(text), 1) AS ln,
               list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS bgs
        FROM w),
      mx AS (
        SELECT doc_id, MAX(c)::BIGINT AS top_bigram_n
        FROM (SELECT doc_id, b, COUNT(*) AS c
              FROM (SELECT doc_id, unnest(bgs) AS b FROM base) t GROUP BY 1, 2) t2
        GROUP BY doc_id),
      f AS (
        SELECT b.n_words < 30 AS r1_short,
               b.sum_len < b.n_words * 3 OR b.sum_len > b.n_words * 10 AS r2_word_len,
               b.punct_cnt * 10 > b.ln AS r3_symbol_heavy,
               b.stop_cnt < 2 AS r4_few_stopwords,
               (b.n_words - b.n_distinct) * 4 > b.n_words AS r5_dup_words,
               COALESCE(m.top_bigram_n, 0) * 5 > b.n_words AS r6_top_bigram
        FROM base b LEFT JOIN mx m ON m.doc_id = b.doc_id),
      long AS (
        SELECT 'r1_short' AS rule, r1_short AS flagged FROM f
        UNION ALL SELECT 'r2_word_len', r2_word_len FROM f
        UNION ALL SELECT 'r3_symbol_heavy', r3_symbol_heavy FROM f
        UNION ALL SELECT 'r4_few_stopwords', r4_few_stopwords FROM f
        UNION ALL SELECT 'r5_dup_words', r5_dup_words FROM f
        UNION ALL SELECT 'r6_top_bigram', r6_top_bigram FROM f
        UNION ALL SELECT 'zz_all_pass',
          NOT (r1_short OR r2_word_len OR r3_symbol_heavy OR
               r4_few_stopwords OR r5_dup_words OR r6_top_bigram) FROM f)
      SELECT rule,
             SUM(CASE WHEN flagged THEN 1 ELSE 0 END)::BIGINT AS n_docs,
             (SUM(CASE WHEN flagged THEN 1 ELSE 0 END) * 10000 // COUNT(*))::BIGINT
               AS rate_bp
      FROM long GROUP BY rule ORDER BY rule""",
    // x26: the eval-lens replay — distinct eval grams left-joined to the
    // distinct training-hit set; integer-bp fraction and the dirty flag
    "x26_contamination_report" -> s"""
      WITH sh AS (
        SELECT doc_id, unnest(hs) AS h
        FROM (SELECT doc_id, ${Dedup.shingleHashesSql} AS hs
              FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1),
      evsh AS (SELECT DISTINCT doc_id, h FROM sh WHERE doc_id % 97 = 0),
      hit AS (
        SELECT DISTINCT h FROM sh
        WHERE doc_id % 97 <> 0 AND h IN (SELECT h FROM evsh)),
      agg AS (
        SELECT e.doc_id, COUNT(*)::BIGINT AS n_grams,
               SUM(CASE WHEN t.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                 AS n_hit
        FROM evsh e LEFT JOIN hit t ON e.h = t.h GROUP BY e.doc_id)
      SELECT doc_id, n_grams, n_hit,
             (n_hit * 10000 // n_grams)::BIGINT AS hit_bp,
             (CASE WHEN n_hit * 10000 // n_grams >= 5000
                   THEN 1 ELSE 0 END)::BIGINT AS dirty
      FROM agg ORDER BY doc_id""",
    "x9_decontam" -> s"""
      WITH sh AS (
        SELECT doc_id, unnest(hs) AS h
        FROM (SELECT doc_id, ${Dedup.shingleHashesSql} AS hs
              FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1),
      ev AS (SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0)
      SELECT doc_id, COUNT(*)::BIGINT AS n_shared
      FROM sh JOIN ev USING (h)
      WHERE doc_id % 97 <> 0
      GROUP BY doc_id ORDER BY doc_id""",
    "x19_vocab_coverage" -> s"""
      WITH toks AS (
        SELECT source, unnest($wsSql) AS tok FROM documents),
      tf AS (
        SELECT source, tok, COUNT(*)::BIGINT AS f
        FROM toks WHERE length(tok) > 0 GROUP BY 1, 2),
      c AS (
        SELECT source, tok, f,
               SUM(f) OVER (PARTITION BY source ORDER BY f DESC, tok
                 ROWS UNBOUNDED PRECEDING) AS cumf,
               row_number() OVER (PARTITION BY source ORDER BY f DESC, tok) AS rk
        FROM tf),
      tot AS (
        SELECT source, SUM(f) AS total, COUNT(*) AS n_distinct
        FROM tf GROUP BY 1)
      SELECT c.source, MAX(tot.total)::BIGINT AS n_tokens,
             MAX(tot.n_distinct)::BIGINT AS n_distinct,
             MIN(CASE WHEN c.cumf * 2 >= tot.total THEN c.rk END)::BIGINT AS n_top50,
             MIN(CASE WHEN c.cumf * 10 >= tot.total * 9 THEN c.rk END)::BIGINT AS n_top90
      FROM c JOIN tot USING (source)
      GROUP BY c.source ORDER BY c.source""",
    "x20_lexical_diversity" -> s"""
      WITH toks AS (
        SELECT lang, unnest($wsSql) AS tok FROM documents),
      tf AS (
        SELECT lang, tok, COUNT(*)::BIGINT AS f
        FROM toks WHERE length(tok) > 0 GROUP BY 1, 2)
      SELECT lang, SUM(f)::BIGINT AS n_tokens, COUNT(*)::BIGINT AS n_types,
             (COUNT(*) * 1000 // SUM(f))::BIGINT AS ttr_pm
      FROM tf GROUP BY lang ORDER BY lang""",
    "x18_text_normalize" -> """
      SELECT doc_id, length(text)::BIGINT AS raw_len,
             length(norm)::BIGINT AS norm_len,
             norm <> text AS changed, md5(norm) AS norm_md5
      FROM (SELECT doc_id, text,
                   trim(regexp_replace(regexp_replace(text,
                     '[\x00-\x1f]', ' ', 'g'), ' {2,}', ' ', 'g')) AS norm
            FROM documents) t
      ORDER BY doc_id""",
    // x17: same md5-window boundaries; DuckDB's end-exclusive range needs
    // the +1, lists are 1-indexed like element_at
    "x17_cdc_chunk" -> s"""
      WITH d AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS nt
        FROM documents),
      st AS (
        SELECT doc_id, nt,
               list_concat([1]::BIGINT[], CASE WHEN length(nt) < 9
                 THEN []::BIGINT[]
                 ELSE list_filter(list_transform(range(2, length(nt) - 7 + 1),
                        p -> CASE WHEN substr(md5(substr(nt, p, 8)), 1, 2) < '04'
                             THEN p ELSE -1 END), x -> x > 0) END) AS starts
        FROM d),
      ex AS (
        SELECT doc_id, nt, starts, unnest(range(0, len(starts))) AS i
        FROM st)
      SELECT doc_id, i AS chunk_idx, starts[i + 1]::BIGINT AS start,
             ((CASE WHEN i < len(starts) - 1 THEN starts[i + 2] - 1
                    ELSE length(nt) END) - starts[i + 1] + 1)::BIGINT AS chunk_len,
             md5(substr(nt, starts[i + 1],
               (CASE WHEN i < len(starts) - 1 THEN starts[i + 2] - 1
                     ELSE length(nt) END) - starts[i + 1] + 1)) AS chunk_md5
      FROM ex ORDER BY doc_id, chunk_idx""",
    // x16: identical bigram model + floor-div scoring; DuckDB's range is
    // end-exclusive so range(1, len(ws)) enumerates the len-1 pair starts.
    // Tokens never contain spaces (ws splits on space runs), so the
    // "w1 w2" pair string splits back losslessly.
    "x16_lm_score" -> s"""
      WITH bi AS (
        SELECT doc_id,
               string_split(pr, ' ')[1] AS w1, string_split(pr, ' ')[2] AS w2
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(ws)),
                            i -> ws[i] || ' ' || ws[i+1])) AS pr
              FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t1
        WHERE length(string_split(pr, ' ')[1]) > 0
          AND length(string_split(pr, ' ')[2]) > 0),
      big AS (SELECT w1, w2, COUNT(*)::BIGINT AS c12 FROM bi GROUP BY w1, w2),
      uni AS (SELECT w1, COUNT(*)::BIGINT AS c1 FROM bi GROUP BY w1),
      sc AS (
        SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
               SUM((c12 * 1000000) // c1)::BIGINT AS sum_ppm
        FROM bi JOIN big USING (w1, w2) JOIN uni USING (w1)
        GROUP BY doc_id),
      thr AS (SELECT (SUM(sum_ppm)::BIGINT // SUM(n_bigrams)::BIGINT) AS thr FROM sc)
      SELECT doc_id, n_bigrams, sum_ppm,
             (sum_ppm // n_bigrams)::BIGINT AS lm_ppm,
             (sum_ppm // n_bigrams) >= (SELECT thr // 2 FROM thr) AS keep
      FROM sc ORDER BY doc_id""",
    "x7_tfidf_topk" -> s"""
      WITH toks AS (
        SELECT doc_id, unnest(ws) AS tok
        FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0),
      toks2 AS (SELECT doc_id, tok FROM toks WHERE length(tok) > 0),
      tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks2 GROUP BY doc_id, tok),
      df AS (SELECT tok, COUNT(*) AS df
             FROM (SELECT DISTINCT doc_id, tok FROM toks2) d GROUP BY tok),
      n AS (SELECT COUNT(*) AS n FROM documents)
      SELECT doc_id, rank, tok, score FROM (
        SELECT tf.doc_id, tf.tok,
               ((tf.tf * n.n * 1000000) // df.df)::BIGINT AS score,
               row_number() OVER (PARTITION BY tf.doc_id
                 ORDER BY ((tf.tf * n.n * 1000000) // df.df) DESC, tf.tok)::BIGINT AS rank
        FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n) t
      WHERE rank <= 3 ORDER BY doc_id, rank""",
    // x21: integer-exact BM25 — same rational form as the Spark side (20·L
    // common denominator, bin()-length idf); the only double is the final
    // one-division bm25 display value.
    // x25: same 8-gram hashes via list_slice; df threshold on DISTINCT
    // docs per source; left-join zero-fill for boilerplate-free sources
    "x25_boilerplate_passages" -> s"""
      WITH docs AS (
        SELECT doc_id, source, ${Tx.wsSql} AS ws FROM documents
        WHERE len(${Tx.wsSql}) >= 8),
      grams AS (
        SELECT doc_id, source,
               md5(array_to_string(list_slice(ws, i, i + 7), ' ')) AS h
        FROM docs, unnest(range(1, len(ws) - 6)) AS t(i)),
      df8 AS (
        SELECT source, h, COUNT(DISTINCT doc_id)::BIGINT AS df,
               COUNT(*)::BIGINT AS occ
        FROM grams GROUP BY source, h),
      tot AS (SELECT source, COUNT(*)::BIGINT AS n_gram_types,
                     SUM(occ)::BIGINT AS n_grams FROM df8 GROUP BY source),
      bl AS (SELECT source, COUNT(*)::BIGINT AS n_boiler_types,
                    SUM(occ)::BIGINT AS boiler_hits
             FROM df8 WHERE df >= 5 GROUP BY source)
      SELECT t.source, t.n_gram_types, t.n_grams,
             COALESCE(b.n_boiler_types, 0)::BIGINT AS n_boiler_types,
             COALESCE(b.boiler_hits, 0)::BIGINT AS boiler_hits,
             (COALESCE(b.boiler_hits, 0) * 10000 // t.n_grams)::BIGINT
               AS hit_rate_bp
      FROM tot t LEFT JOIN bl b ON b.source = t.source
      ORDER BY t.source""",
    "x24_collocations" -> s"""
      WITH toks AS (
        SELECT ${Tx.wsSql} AS ws FROM documents
        WHERE len(${Tx.wsSql}) >= 2),
      uni AS (SELECT unnest(ws) AS w FROM toks),
      un AS (SELECT w, COUNT(*)::BIGINT AS n FROM uni GROUP BY 1),
      nt AS (SELECT SUM(n)::BIGINT AS n_t FROM un),
      bg AS (
        SELECT ws[i] AS w1, ws[i + 1] AS w2
        FROM toks, unnest(range(1, len(ws))) AS t(i)),
      nb AS (SELECT COUNT(*)::BIGINT AS n_b FROM bg),
      bgc AS (
        SELECT w1, w2, COUNT(*)::BIGINT AS n_ab FROM bg
        GROUP BY 1, 2 HAVING COUNT(*) >= 5)
      SELECT w1, w2, n_ab,
             CAST(n_ab AS DOUBLE) * CAST(n_t AS DOUBLE) * CAST(n_t AS DOUBLE)
               / (CAST(n_b AS DOUBLE) * CAST(a.n AS DOUBLE)
                  * CAST(b.n AS DOUBLE)) AS lift
      FROM bgc JOIN un a ON a.w = w1 JOIN un b ON b.w = w2
      CROSS JOIN nt CROSS JOIN nb
      ORDER BY lift DESC, w1, w2 LIMIT 20""",
    // x27: phrase runs replayed with the same per-doc stopword running
    // count; string_agg(ORDER BY pos) rebuilds the phrase serially.
    "x27_keyphrases" -> s"""
      WITH toks AS (
        SELECT doc_id, i AS pos, ws[i] AS tok
        FROM (SELECT doc_id, ${Tx.wsSql} AS ws FROM documents) t0,
             unnest(range(1, len(ws) + 1)) AS t(i)),
      marked AS (
        SELECT doc_id, pos, tok,
               tok IN (${stopwords.map(w => s"'$w'").mkString(", ")}) AS is_stop
        FROM toks),
      pidd AS (
        SELECT doc_id, pos, tok, is_stop,
               SUM(CASE WHEN is_stop THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY pos) AS pid
        FROM marked),
      phr AS (
        SELECT doc_id, pid, string_agg(tok, ' ' ORDER BY pos) AS phrase,
               COUNT(*)::BIGINT AS len
        FROM pidd WHERE NOT is_stop AND length(tok) > 0
        GROUP BY 1, 2),
      wst AS (
        SELECT w, COUNT(*)::BIGINT AS freq, SUM(len)::BIGINT AS deg
        FROM (SELECT unnest(string_split(phrase, ' ')) AS w, len FROM phr) e
        GROUP BY 1),
      ptype AS (
        SELECT phrase, len, COUNT(*)::BIGINT AS n_occ FROM phr GROUP BY 1, 2),
      scored AS (
        SELECT phrase, len, n_occ, SUM((deg * 10000) // freq)::BIGINT AS score_bp
        FROM (SELECT phrase, len, n_occ,
                     unnest(string_split(phrase, ' ')) AS w FROM ptype) e
        JOIN wst USING (w)
        GROUP BY 1, 2, 3)
      SELECT phrase, len AS n_words, n_occ, score_bp
      FROM scored WHERE n_occ >= 3
      ORDER BY score_bp DESC, phrase LIMIT 20""",
    "x28_vocab_growth" -> s"""
      WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
      toks AS (
        SELECT least(9, doc_id * 10 // (mx + 1)) AS b, tok
        FROM (SELECT doc_id, unnest($wsSql) AS tok FROM documents) t, mx
        WHERE length(tok) > 0),
      perb AS (SELECT b, COUNT(*)::BIGINT AS n_tok FROM toks GROUP BY 1),
      firstb AS (
        SELECT b, COUNT(*)::BIGINT AS n_new FROM (
          SELECT tok, MIN(b) AS b FROM toks GROUP BY 1) z GROUP BY 1),
      j AS (SELECT p.b, p.n_tok, COALESCE(f.n_new, 0) AS n_new
            FROM perb p LEFT JOIN firstb f USING (b))
      SELECT b AS bucket, n_tok, n_new,
             SUM(n_tok) OVER w::BIGINT AS cum_tokens,
             SUM(n_new) OVER w::BIGINT AS cum_vocab,
             (SUM(n_new) OVER w * 10000 // SUM(n_tok) OVER w)::BIGINT AS ttr_bp
      FROM j WINDOW w AS (ORDER BY b ROWS UNBOUNDED PRECEDING)
      ORDER BY bucket""",
    "x21_bm25_topk" -> s"""
      WITH toks AS (
        SELECT doc_id, tok FROM (
          SELECT doc_id, unnest(ws) AS tok
          FROM (SELECT doc_id, $wsSql AS ws FROM documents) t0) t
        WHERE length(tok) > 0),
      tf AS (SELECT doc_id, tok, COUNT(*)::BIGINT AS tf FROM toks GROUP BY doc_id, tok),
      dl AS (SELECT doc_id, COUNT(*)::BIGINT AS dl FROM toks GROUP BY doc_id),
      dft AS (SELECT tok, COUNT(*)::BIGINT AS df FROM tf GROUP BY tok),
      nl AS (SELECT COUNT(DISTINCT doc_id)::BIGINT AS n, COUNT(*)::BIGINT AS l FROM toks),
      q AS (SELECT tok, df FROM dft CROSS JOIN nl
            ORDER BY abs(df * 10 - n), tok LIMIT 5),
      sc AS (
        SELECT tf.doc_id, dl.dl, tf.tf, q.df, nl.n, nl.l,
               length(bin(nl.n // q.df))::BIGINT AS idf
        FROM tf JOIN q USING (tok)
        JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN nl),
      agg AS (
        SELECT doc_id, dl, COUNT(*)::BIGINT AS n_hit,
               SUM((44 * tf * l * idf * 10000)
                   // (20 * l * tf + 6 * l + 18 * dl * n))::BIGINT AS score_sc
        FROM sc GROUP BY doc_id, dl)
      SELECT doc_id, dl, n_hit, score_sc, score_sc::DOUBLE / 10000.0 AS bm25
      FROM agg ORDER BY score_sc DESC, doc_id LIMIT 10""",
    "x1_token_stats" -> s"""
      SELECT doc_id,
             len(ws)::BIGINT AS n_tokens,
             len(list_distinct(ws))::BIGINT AS n_distinct,
             list_reduce(list_prepend(0, list_transform(ws, t -> length(t))), (a, x) -> a + x)::BIGINT AS sum_token_len,
             list_reduce(list_prepend(0, list_transform(ws, t -> length(t))), (a, x) -> a + x)::DOUBLE
               / greatest(len(ws), 1) AS avg_token_len
      FROM (SELECT doc_id, $wsSql AS ws FROM documents) t
      ORDER BY doc_id""",
    "x2_quality_score" -> s"""
      SELECT doc_id, n_tokens::BIGINT AS n_tokens, punct_cnt::BIGINT AS punct_cnt,
             digit_cnt::BIGINT AS digit_cnt, stop_cnt::BIGINT AS stop_cnt,
             stop_cnt::DOUBLE / n_tokens AS stop_ratio,
             punct_cnt::DOUBLE / greatest(length(text), 1) AS punct_ratio,
             1.0 - (punct_cnt::DOUBLE / greatest(length(text), 1)) * 2.0
                 - (digit_cnt::DOUBLE / greatest(length(text), 1)) AS quality_score
      FROM (
        SELECT doc_id, text,
               greatest(len(ws), 1) AS n_tokens,
               length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct_cnt,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digit_cnt,
               len(list_filter(ws, t -> ${inList("t", stopwords)})) AS stop_cnt
        FROM (SELECT doc_id, text, $wsSql AS ws FROM documents) t0) t
      ORDER BY doc_id""",
    "x3_lang_id" -> s"""
      SELECT lang, $caseSql AS predicted, COUNT(*) AS n
      FROM (
        SELECT lang,
               ${markers.map { case (l, ws) =>
                  s"len(list_filter(ws, t -> ${inList("t", ws)})) AS s_$l" }.mkString(", ")}
        FROM (SELECT lang, $wsSql AS ws FROM documents) t0) t
      GROUP BY lang, predicted ORDER BY lang, predicted""",
    "x6_bpe_tokens" -> """
      SELECT doc_id,
             len(toks)::BIGINT AS n_bpe,
             len(list_distinct(toks))::BIGINT AS n_bpe_distinct
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text),
                     '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +') AS toks
            FROM documents) t
      ORDER BY doc_id""",
    "x4_fingerprint" -> s"""
      SELECT doc_id,
             list_min(list_transform(range(1, greatest(length(nt) - 7, 1) + 1),
               p -> ${polyHashSql("substr(nt, p, 8)")})) AS fingerprint
      FROM (SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS nt FROM documents) t
      ORDER BY doc_id"""
  )
}

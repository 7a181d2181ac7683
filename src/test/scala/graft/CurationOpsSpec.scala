package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the round-4 curation operators (x10 PII redaction,
  * d11 incremental dedup, g4 shard packing, q9 quantile filter) beyond the
  * DuckDB hash-match: each test asserts the property the operator exists
  * for, on the real sf0.001 tables. */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x10: every planted email+phone is redacted and counted") {
    val out = SparkEntry.queries("x10_pii_redact")(spark, sf)
    import spark.implicits._
    // every doc had exactly one email and one phone planted; real corpus
    // text may add more, never fewer
    assert(out.filter($"n_emails" < 1 || $"n_phones" < 1).count() == 0)
    // and redaction is total: re-scanning the redacted text finds nothing
    val docs = Tables(spark, sf).documents.count()
    assert(out.count() == docs)
  }

  test("x10: redacted digest differs from the un-redacted text digest") {
    import spark.implicits._
    val out = SparkEntry.queries("x10_pii_redact")(spark, sf)
      .join(Tables(spark, sf).documents
        .select($"doc_id", md5($"text").as("orig_digest")), Seq("doc_id"))
    assert(out.filter($"red_digest" === $"orig_digest").count() == 0)
  }

  test("d11: no indexed digest survives; keepers are batch-minimal") {
    import spark.implicits._
    val out = SparkEntry.queries("d11_incremental_dedup")(spark, sf)
    // keeper ids all come from the incoming batch (doc_id % 10 != 0)
    assert(out.filter(pmod($"keeper_doc_id", lit(10)) === 0).count() == 0)
    // anti-join held: no surviving digest appears in the indexed partition
    val indexed = Tables(spark, sf).documents
      .filter(pmod($"doc_id", lit(10)) === 0)
      .select(md5(expr("trim(regexp_replace(lower(text), '[^a-z ]', ''))")).as("digest"))
      .distinct()
    assert(out.join(indexed, Seq("digest")).count() == 0)
    // one row per surviving digest
    assert(out.select($"digest").distinct().count() == out.count())
  }

  test("g4: shards are contiguous doc_id ranges per lang and respect the budget shape") {
    import spark.implicits._
    val out = SparkEntry.queries("g4_shard_packing")(spark, sf).collect()
    val byLang = out.groupBy(_.getString(0))
    byLang.foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // shard ids are 0..max with no gaps
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length).toSeq,
        s"$lang shard ids not contiguous")
      // shards partition the lang's doc_id axis in order: ranges never
      // overlap and never go backwards
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(5) < b.getLong(4),
            s"$lang shard ranges overlap: ${a.getLong(5)} !< ${b.getLong(4)}")
        case _ =>
      }
      // every shard except the last crossed the budget boundary: its chars
      // plus anything before it reach at least shard_id * budget
      val totals = sorted.map(_.getLong(3))
      val cum = totals.scanLeft(0L)(_ + _).drop(1)
      sorted.zip(cum).dropRight(1).foreach { case (r, c) =>
        assert(c >= (r.getLong(1) + 1) * 2000L,
          s"$lang shard ${r.getLong(1)} closed before filling its budget")
      }
    }
  }

  test("d12: only batch docs are flagged, and every match is an index doc") {
    import spark.implicits._
    val out = SparkEntry.queries("d12_incremental_lsh")(spark, sf)
    assert(out.filter(pmod($"new_id", lit(10)) === 0).count() == 0,
      "an index doc was flagged as incoming")
    assert(out.filter(pmod($"first_match", lit(10)) =!= 0).count() == 0,
      "a match points outside the index")
  }

  test("x11: top-k plans as TakeOrderedAndProject, never a global sort") {
    val df = SparkEntry.queries("x11_heavy_hitters")(spark, sf)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$physical")
    assert(df.count() == 20)
  }

  test("g5: positions are an exact 1..n permutation within every shard") {
    import spark.implicits._
    val out = SparkEntry.queries("g5_shuffle_shard")(spark, sf)
    assert(out.count() == Tables(spark, sf).documents.count())
    // two-pass (bucket offsets + within-bucket row_number) must still yield
    // a dense rank: each shard's pos set is exactly {1..n}
    val bad = out.groupBy($"shard")
      .agg(count(lit(1)).as("n"), min($"pos").as("mn"), max($"pos").as("mx"),
           countDistinct($"pos").as("nd"))
      .filter(!($"mn" === 1 && $"mx" === $"n" && $"nd" === $"n"))
    assert(bad.count() == 0, "shard positions are not a dense 1..n permutation")
  }

  test("g6: mixture rates cap at 1 and land near the target when uncapped") {
    import spark.implicits._
    // sf0.01: en has 218 docs vs target 80 (rate < 1); small langs cap at 1
    val out = SparkEntry.queries("g6_mixture_sample")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (lang, total, target, kept) =>
      assert(kept <= total, s"$lang kept more than exists")
      if (target >= total) assert(kept == total, s"$lang: capped rate must keep all")
      else {
        // deterministic hash thinning: kept ≈ target (10k-bucket resolution)
        assert(kept >= target / 2 && kept <= target * 2,
          s"$lang: kept=$kept far from target=$target")
      }
    }
  }

  test("c2: manifest shards are contiguous, ordered key ranges per lang") {
    import spark.implicits._
    val rows = SparkEntry.queries("c2_export_shards")(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, shards) =>
      val ordered = shards.sortBy(_._2)
      // shard ids are dense from 0 and key ranges never overlap: the
      // packing really was computed in one global deterministic order
      assert(ordered.map(_._2).toSeq == ordered.indices.map(_.toLong),
        s"$lang shard ids not dense: ${ordered.map(_._2).toSeq}")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 < b._5, s"$lang shard key ranges overlap: $a vs $b")
        case _ =>
      }
      ordered.foreach { sh => assert(sh._5 <= sh._6 && sh._3 > 0) }
    }
  }

  test("v8: add-batch probes batch-vs-index only; index never re-scores") {
    import spark.implicits._
    val df = SparkEntry.queries("v8_ivf_add_batch")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every query is a BATCH vector, every neighbor an INDEX vector — no
    // batch×batch and no index×index pair ever scored into the output
    rows.foreach { r =>
      assert(r.getLong(0) % 10 == 7, s"non-batch q_id ${r.getLong(0)}")
      assert(r.getLong(3) % 10 != 7, s"batch id ${r.getLong(3)} as neighbor")
    }
    // plan shape: the only scoring join is ONE broadcast hash join whose
    // build side is the (tiny) batch probe set — the index side streams
    // through without an Exchange-for-join or a second self-join
    // AQE's toString prints Final AND Initial plans — count the final only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 1,
      s"expected exactly one broadcast scoring join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"index-sized shuffle join:\n$plan")
  }

  test("q9: histogram median equals builtin percentile; at least half kept") {
    import spark.implicits._
    val out = SparkEntry.queries("q9_quantile_filter")(spark, sf)
    val builtin = Tables(spark, sf).documents
      .groupBy($"lang")
      .agg(expr("percentile(n_chars, 0.5)").as("p50_builtin"))
    assert(out.join(builtin, Seq("lang"))
      .filter($"p50" =!= $"p50_builtin").count() == 0,
      "histogram-derived median diverges from percentile()")
    assert(out.filter($"n_kept" * 2 < $"n_total").count() == 0,
      "fewer than half the docs at-or-above the median")
  }

  test("g22: the windowed skyline equals the brute-force dominance check") {
    import spark.implicits._
    val pts = Tables(spark, sf).documents
      .select($"doc_id", $"n_chars",
        expr(s"cast(${graft.catalog.Dedup.cleanCharsExpr} as bigint)").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // frontier by definition: no other point with <= chars, >= quality,
    // one strict — O(n^2) on the 500-doc fixture
    val frontier = pts.filter { case (_, c, q) =>
      !pts.exists { case (_, c2, q2) =>
        c2 <= c && q2 >= q && (c2 < c || q2 > q) }
    }
    val want = frontier.groupBy(p => (p._2, p._3)).toSeq.map { case ((c, q), g) =>
      (c, q, g.length.toLong, g.map(_._1).min)
    }.sortBy(_._1)
    val got = SparkEntry.queries("g22_pareto_frontier")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.length < pts.length,
      "frontier must prune — a full-corpus frontier means the reduction is broken")
  }

  test("x27: RAKE scores equal a serial plain-Scala twin") {
    import spark.implicits._
    val stop = graft.catalog.Text.stopwords.toSet
    val texts = Tables(spark, sf).documents.select($"text").collect()
      .map(_.getString(0))
    // candidate phrases: maximal stopword-free token runs, per doc
    val phrases = texts.flatMap { text =>
      val toks = text.toLowerCase.replaceAll("[^a-z ]", "").trim.split(" +")
      val runs = scala.collection.mutable.Buffer[List[String]]()
      var cur = List.empty[String]
      for (t <- toks) {
        if (stop(t)) { if (cur.nonEmpty) runs += cur.reverse; cur = Nil }
        else if (t.nonEmpty) cur = t :: cur
      }
      if (cur.nonEmpty) runs += cur.reverse
      runs
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.length.toLong)
    val deg = phrases.flatMap(p => p.map(w => w -> p.length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
    val want = phrases.groupBy(identity).toSeq
      .map { case (p, g) =>
        (p.mkString(" "), p.length.toLong, g.length.toLong,
         p.map(w => deg(w) * 10000L / freq(w)).sum)
      }
      .filter(_._3 >= 3)
      .sortBy { case (ph, _, _, sc) => (-sc, ph) }
      .take(20)
    val got = SparkEntry.queries("x27_keyphrases")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.exists(_._2 > 1), "no multi-word keyphrase on the fixture")
  }

  test("d21: linkage recovers the origin for nearly every probe; one winner per probe") {
    val rows = SparkEntry.queries("d21_fuzzy_join")(spark, sf).collect()
    assert(rows.nonEmpty)
    // winner uniqueness: one row per probe id
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "a probe matched twice")
    // a middle slice shares most of its shingles with its origin — the
    // containment argmax must recover it for the vast majority of probes
    val originRate = rows.count(_.getAs[Boolean]("is_origin")).toDouble / rows.length
    assert(originRate >= 0.8, s"origin recovery collapsed: $originRate")
    // containment is a valid bp and intersection never exceeds the probe set
    rows.foreach { r =>
      val bp = r.getAs[Long]("cont_bp")
      assert(bp >= 0 && bp <= 10000)
    }
  }

  test("c14: card arithmetic closes; planted dups and cross-lang copies surface") {
    import spark.implicits._
    val out = SparkEntry.queries("c14_dataset_card")(spark, sf).collect()
    val total = out.find(_.getString(0) == "TOTAL").get
    val per = out.filterNot(_.getString(0) == "TOTAL")
    assert(per.map(_.getAs[Long]("n_docs")).sum == total.getAs[Long]("n_docs"))
    assert(per.map(_.getAs[Long]("n_chars")).sum == total.getAs[Long]("n_chars"))
    // truncated shares still close to within one bp per language
    val shares = per.map(_.getAs[Long]("share_bp")).sum
    assert(shares <= 10000 && shares >= 10000 - per.length)
    // planted fixture: exact dups inside a language and one text copied
    // ACROSS languages — the card must show dup_bp > 0 for the dup lang
    // and a TOTAL distinct count below the per-language sum
    val tmp = graft.Scratch.dir("card_fixture").toString
    Seq(
      (1L, "alpha beta gamma delta", "en", "w", 22L),
      (2L, "alpha beta gamma delta", "en", "w", 22L),
      (3L, "unique english text here", "en", "w", 24L),
      (4L, "alpha beta gamma delta", "de", "w", 22L),
      (5L, "einzigartiger text", "de", "w", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val card = SparkEntry.queries("c14_dataset_card")(spark, tmp).collect()
    val en = card.find(_.getString(0) == "en").get
    val tot2 = card.find(_.getString(0) == "TOTAL").get
    assert(en.getAs[Long]("n_docs") == 3 && en.getAs[Long]("n_distinct_texts") == 2)
    assert(en.getAs[Long]("dup_bp") == 10000L / 3)
    val perDistinct = card.filterNot(_.getString(0) == "TOTAL")
      .map(_.getAs[Long]("n_distinct_texts")).sum
    assert(tot2.getAs[Long]("n_distinct_texts") == 3 && perDistinct == 4,
      "cross-language copy did not collapse in the TOTAL row")
  }

  test("x28: growth curve conserves tokens and vocabulary exactly") {
    import spark.implicits._
    val rows = SparkEntry.queries("x28_vocab_growth")(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val toks = Tables(spark, sf).documents
      .select(explode(expr(graft.catalog.Tx.wsExpr)).as("tok"))
      .filter(length($"tok") > 0)
    val nTok = toks.count()
    val nVocab = toks.distinct().count()
    // each token occurrence lands in exactly one slice; each type is
    // charged to exactly one first slice
    assert(rows.map(_.getAs[Long]("n_tok")).sum == nTok)
    assert(rows.map(_.getAs[Long]("n_new")).sum == nVocab)
    assert(rows.last.getAs[Long]("cum_tokens") == nTok)
    assert(rows.last.getAs[Long]("cum_vocab") == nVocab)
    // growth must actually decelerate relative to volume on real text:
    // the final type-token ratio is below the first slice's
    assert(rows.last.getAs[Long]("ttr_bp") < rows.head.getAs[Long]("ttr_bp"))
  }

  test("c15: A/B report equals a plain-Scala recount; configs genuinely disagree") {
    import spark.implicits._
    val rows = SparkEntry.queries("c15_curation_ab")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("kept_chars"),
         r.getAs[Long]("mean_q_bp"), r.getAs[Long]("n_both"),
         r.getAs[Long]("jaccard_bp"))).toMap
    val docs = Tables(spark, sf).documents
      .select($"lang", $"n_chars", $"text").collect()
      .map { r =>
        val text = r.getString(2)
        val clean = math.max(0L,
          text.length
            - 2L * (text.length - text.replaceAll("[^a-zA-Z0-9 ]", "").length)
            - (text.length - text.replaceAll("[0-9]", "").length))
        val qbp = clean * 10000L / math.max(text.length, 1)
        (r.getString(0), r.getLong(1), qbp)
      }
    val want = docs.groupBy(_._1).flatMap { case (lang, g) =>
      val a = g.filter(_._3 >= 8000)
      val b = g.filter(d => d._2 >= 100 && d._2 <= 400)
      val both = g.count(d => d._3 >= 8000 && d._2 >= 100 && d._2 <= 400).toLong
      val jac = both * 10000L / math.max(a.length + b.length - both, 1)
      Seq(
        ("config_a", lang) -> (a.length.toLong, a.map(_._2).sum,
          a.map(_._3).sum / math.max(a.length, 1), both, jac),
        ("config_b", lang) -> (b.length.toLong, b.map(_._2).sum,
          b.map(_._3).sum / math.max(b.length, 1), both, jac))
    }
    assert(rows == want)
    // the report is only useful if the gates actually disagree somewhere
    assert(rows.exists { case ((_, _), (n, _, _, both, _)) => n > both },
      "configs keep identical sets — the A/B comparison is vacuous")
  }

  test("d22: the df-capped linkage agrees with the uncapped exact assignment") {
    val r = SparkEntry.queries("d22_linkage_eval")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val nEval = row.getAs[Long]("n_eval")
    assert(nEval > 0, "eval probe set is empty — the eval is vacuous")
    assert(row.getAs[Long]("n_agree") <= nEval)
    assert(row.getAs[Long]("agree_bp") ==
      row.getAs[Long]("n_agree") * 10000 / nEval)
    // the MaxDf cap is sized above any organic shingle df on the testdata
    // (Dedup.MaxDf scaladoc), so the capped winners must match the exact
    // ones outright here — a drop below 10000 bp means the cap started
    // cutting informative shingles
    assert(row.getAs[Long]("agree_bp") == 10000L,
      s"capped linkage diverged from exact on organic data: $row")
    assert(row.getAs[Long]("n_origin_exact") > 0)
  }
}

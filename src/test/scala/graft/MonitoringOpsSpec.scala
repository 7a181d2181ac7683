package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the CDC / monitoring / evaluation operators (u9
  * changelog apply, dq6 FD audit, dq7 + e19 checksums, a8 sliding distinct,
  * v11 ANN recall) beyond the DuckDB hash-match — each test asserts the
  * property the operator exists for, on the real sf0.001 tables. */
class MonitoringOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** independent restatement of dq7's 8-hex-digit fingerprint value */
  private def hex8(c: String) = expr((1 to 8).map { j =>
    s"(instr('0123456789abcdef', substr($c, $j, 1)) - 1) * cast(${1L << (4 * (8 - j))} as bigint)"
  }.mkString(" + "))

  /** independent restatement of dq7's length-prefixed canonical row string */
  private def canon(cols: Seq[String]) = expr(
    "concat_ws('|', " + cols.map(c =>
      s"concat(cast(length(cast($c as string)) as string), ':', cast($c as string))")
      .mkString(", ") + ")")

  test("u9: applying the changelog reproduces the directly-derived snapshot") {
    import spark.implicits._
    val out = SparkEntry.queries("u9_changelog_apply")(spark, sf)
    val old = Tables(spark, sf).customer
      .select($"c_custkey", $"c_name", $"c_acctbal")
    // u8's scenario, derived independently of the apply path
    val want = old.filter($"c_custkey" % 7 =!= 3)
      .withColumn("c_acctbal",
        when($"c_custkey" % 10 === 0, $"c_acctbal" + 50.0)
          .otherwise($"c_acctbal"))
      .union(old.filter($"c_custkey" % 100 === 0)
        .select(($"c_custkey" + 100000000000L).as("c_custkey"),
                concat(lit("INS#"), $"c_name").as("c_name"), $"c_acctbal"))
    assert(out.except(want).count() == 0 && want.except(out).count() == 0)
    assert(out.count() == want.count())
  }

  test("dq7: checksum is invariant under repartitioning and row order") {
    import spark.implicits._
    val a = SparkEntry.queries("dq7_table_checksum")(spark, sf).collect()
    // same rows, different physical layout → identical (n_rows, checksum)
    val li = Tables(spark, sf).lineitem
      .repartition(7, $"l_suppkey").sortWithinPartitions($"l_returnflag")
    val m = md5(canon(Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_returnflag", "l_linestatus")))
    val perm = li.withColumn("m", m)
      .withColumn("h", hex8("m"))
      .agg(count(lit(1)).as("n"), sum($"h").as("c")).collect()(0)
    val row = a.find(_.getAs[String]("tbl") == "lineitem").get
    assert(row.getAs[Long]("n_rows") == perm.getAs[Long]("n"))
    assert(row.getAs[Long]("checksum") == perm.getAs[Long]("c"))
  }

  test("e19: the streamed running checksum equals the batch recomputation") {
    import spark.implicits._
    val streamed = SparkEntry.queries("e19_stream_checksum")(spark, sf)
    val batch = Tables(spark, sf).events
      .withColumn("m", md5(canon(Seq("event_id", "user_id", "event_type"))))
      .withColumn("h", hex8("m"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"), sum($"h").as("checksum"))
    assert(streamed.except(batch).count() == 0 &&
      batch.except(streamed).count() == 0)
  }

  test("e24: streamed index postings cover the new partition; cells are trained cells") {
    import spark.implicits._
    val out = SparkEntry.queries("e24_stream_index_append")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch7 = Tables(spark, sf).embeddings
      .filter(pmod($"vec_id", lit(10)) === 7)
      .agg(count(lit(1)), sum($"vec_id")).head
    // every new vector posted exactly once — counts and id-sums re-add
    assert(out.map(_._2).sum == batch7.getLong(0), s"postings leak: $out")
    assert(out.map(_._3).sum == batch7.getLong(1), "id-sum leak")
    // postings only reference cells the trained quantizer owns
    val cells = SparkEntry.queries("v8_ivf_add_batch")(spark, sf).collect()
      .map(_.getLong(1)).toSet
    assert(out.map(_._1).toSet.subsetOf(cells),
      s"unknown cells: ${out.map(_._1).toSet -- cells}")
  }

  test("dq12: per-bin chi-square ppm equals an exact BigInt recompute") {
    import spark.implicits._
    val out = SparkEntry.queries("dq12_drift_chi2")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (totA, totB) = (BigInt(out.map(_._2).sum), BigInt(out.map(_._3).sum))
    assert(totA > 0 && totB > 0)
    out.foreach { case (bin, a, b, ppm) =>
      val num = BigInt(a) * totB - BigInt(b) * totA
      val want = (num * num * 1000000) / (totA * totB * (BigInt(a) + BigInt(b)))
      assert(BigInt(ppm) == want, s"bin $bin: $ppm != $want")
      assert(ppm >= 0)
    }
  }

  test("a8: trailing window dominates the single-day distinct count") {
    import spark.implicits._
    val out = SparkEntry.queries("a8_sliding_distinct")(spark, sf)
      .collect().map(r =>
        r.getAs[String]("day") -> r.getAs[Long]("n_users")).toMap
    val daily = Tables(spark, sf).events
      .groupBy(date_format(to_date($"ts"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct($"user_id").as("d"))
      .collect().map(r => r.getAs[String]("day") -> r.getAs[Long]("d")).toMap
    assert(out.keySet == daily.keySet)
    daily.foreach { case (day, d) =>
      assert(out(day) >= d, s"$day: window smaller than its own day")
    }
  }

  test("dq6: keyed FDs hold, the non-key FD is refuted") {
    import spark.implicits._
    val rows = SparkEntry.queries("dq6_fd_audit")(spark, sf).collect()
      .map(r => r.getAs[String]("fd") -> r).toMap
    // primary-key left sides can never violate
    Seq("nation_to_region", "order_to_priority", "part_to_brand").foreach { fd =>
      assert(rows(fd).getAs[Boolean]("holds"), s"$fd should hold")
      assert(rows(fd).getAs[Long]("max_variants") == 1L)
    }
    // users emit several event types — the candidate FD must be refuted
    assert(!rows("user_to_event_type").getAs[Boolean]("holds"))
    assert(rows("user_to_event_type").getAs[Long]("n_violating") > 0L)
  }

  test("dq2: two-level profile equals multi-distinct, plans with no Expand") {
    import spark.implicits._
    val q = SparkEntry.queries("dq2_table_profile")(spark, sf)
    // the rewrite must not reintroduce the multi-distinct Expand
    assert(!q.queryExecution.executedPlan.toString.contains("Expand"),
      "dq2 plan contains Expand — multi-distinct shape came back")
    val li = Tables(spark, sf).lineitem
    val expect = li.agg(
      count(lit(1)), sum($"l_quantity".isNull.cast("long")),
      countDistinct($"l_quantity"),
      min($"l_quantity".cast("decimal(18,2)")).cast("string"),
      max($"l_quantity".cast("decimal(18,2)")).cast("string")).head
    val got = q.filter($"col" === "l_quantity").head
    assert((1 to 5).forall(i => got.get(i) == expect.get(i - 1)),
      s"profile mismatch: $got vs $expect")
  }

  test("dq8: exact-sum correlations agree with the built-in corr aggregate") {
    import spark.implicits._
    val rows = SparkEntry.queries("dq8_corr_matrix")(spark, sf).collect()
    assert(rows.length == 3)
    val li = Tables(spark, sf).lineitem
    val builtin = li.agg(
      corr($"l_quantity", $"l_extendedprice"),
      corr($"l_quantity", $"l_discount"),
      corr($"l_extendedprice", $"l_discount")).head
    val byPair = rows.map(r =>
      (r.getString(0), r.getString(1)) -> r.getAs[Double]("corr_v")).toMap
    val cases = Seq(
      ("l_quantity", "l_extendedprice") -> builtin.getDouble(0),
      ("l_quantity", "l_discount") -> builtin.getDouble(1),
      ("l_extendedprice", "l_discount") -> builtin.getDouble(2))
    cases.foreach { case (pair, ref) =>
      val v = byPair(pair)
      assert(v >= -1.0 && v <= 1.0, s"$pair corr out of range: $v")
      // built-in corr is a float-order-sensitive one-pass co-moment; the
      // exact-sum closed form must land within float slack of it
      assert(math.abs(v - ref) < 1e-9, s"$pair: $v vs builtin $ref")
    }
  }

  test("r7: tolerance nulls exactly the stale as-of matches") {
    import spark.implicits._
    val tol = SparkEntry.queries("r7_asof_tolerance")(spark, sf).collect()
    val plain = SparkEntry.queries("r3_asof_left")(spark, sf).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(tol.nonEmpty && tol.length == plain.size)
    val gap = 600000000L
    tol.foreach { r =>
      val click = r.getLong(2)
      val fresh = Option(r.get(3)).map(_.asInstanceOf[Long])
      val asof = plain(r.getLong(0))
      val expect = asof.filter(a => click - a <= gap)
      assert(fresh == expect, s"tolerance verdict wrong for ${r.getLong(0)}")
      assert(r.getBoolean(4) == fresh.isDefined)
    }
    // the tolerance must actually bite somewhere (else the case is vacuous)
    assert(tol.exists(r => r.isNullAt(3) && plain(r.getLong(0)).isDefined),
      "no stale match was nulled — fixture never exercises the TTL")
  }

  test("e20: streamed vocabulary top-20 equals the batch x11 result") {
    val streamed = SparkEntry.queries("e20_stream_heavy_hitters")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = SparkEntry.queries("x11_heavy_hitters")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamed == batch)
  }

  test("e21: streamed point-in-time enrichment equals the batch r4 join") {
    val streamed = SparkEntry.queries("e21_stream_scd2_enrich")(spark, sf)
      .collect().toSeq
    val batch = SparkEntry.queries("r4_scd2_join")(spark, sf).collect().toSeq
    assert(streamed == batch)
  }

  test("a9: per-day HLL sketches union to the direct sketch on every group") {
    val rows = SparkEntry.queries("a9_hll_merge")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), "per-day union diverged from direct sketch")
    assert(rows.forall(_.getBoolean(3)), "estimate left the 5% envelope")
  }

  test("a9: sketch union is partition-invariant (user-parity split merges equal)") {
    import spark.implicits._
    val ev = Tables(spark, sf).events.select($"event_type", $"user_id")
    def est(grouped: org.apache.spark.sql.DataFrame) = grouped.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byParity = est(ev.groupBy($"event_type", ($"user_id" % 2).as("p"))
      .agg(hll_sketch_agg($"user_id", 12).as("sk"))
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("e")))
    val direct = est(ev.groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", 12)).as("e")))
    assert(byParity == direct, "union over a different split must still be lossless")
  }

  test("a10: bitmap distinct is exact on every group and every pair count is bounded") {
    import spark.implicits._
    val rows = SparkEntry.queries("a10_bitmap_distinct")(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(2)),
      "bitmap popcount diverged from exact countDistinct")
    val co = SparkEntry.queries("q10_cooccurrence")(spark, sf).collect()
    val totals = Tables(spark, sf).events
      .select($"user_id", $"event_type").distinct()
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(co.nonEmpty)
    co.foreach { r =>
      val (a, b, n, j) = (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(n <= math.min(totals(a), totals(b)), s"$a/$b overlap exceeds a set size")
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("r8: bars' open/close equal the window-ranked first/last event values") {
    import spark.implicits._
    val bars = SparkEntry.queries("r8_time_bars")(spark, sf)
    val ev = Tables(spark, sf).events.select(
      $"event_type", unix_micros(date_trunc("hour", $"ts")).as("hour_us"),
      unix_micros($"ts").as("us"), $"value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type", $"hour_us").orderBy($"us")
    val want = ev
      .withColumn("rn_a", row_number().over(w))
      .withColumn("rn_d", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type", $"hour_us").orderBy($"us".desc)))
      .groupBy($"event_type", $"hour_us")
      .agg(max(when($"rn_a" === 1, $"value")).as("open_v"),
           max(when($"rn_d" === 1, $"value")).as("close_v"))
    val joined = bars.select($"event_type", $"hour_us",
        $"open_v".as("b_open"), $"close_v".as("b_close"))
      .join(want, Seq("event_type", "hour_us"))
    assert(joined.count() == bars.count())
    assert(joined.filter($"b_open" =!= $"open_v" || $"b_close" =!= $"close_v")
      .count() == 0)
    assert(bars.filter($"high_v" < $"low_v").count() == 0)
  }

  test("r8: event timestamps are unique, so min_by/max_by on us is total") {
    import spark.implicits._
    val ev = Tables(spark, sf).events
    assert(ev.count() == ev.select($"ts").distinct().count())
  }

  test("j11: NOT IN honors three-valued logic; the clean form matches NOT EXISTS") {
    import spark.implicits._
    val r = SparkEntry.queries("j11_null_aware_anti")(spark, sf).head()
    assert(r.getLong(0) == 0L,
      "a NULL in the subquery must empty the NOT IN result")
    assert(r.getLong(1) == r.getLong(2),
      "without NULLs, NOT IN and NOT EXISTS must agree")
    assert(r.getLong(1) > 0L, "fixture must leave some non-matching customers")
  }

  test("w10: every reported run is maximal and internally consecutive") {
    import spark.implicits._
    val runs = SparkEntry.queries("w10_gaps_islands")(spark, sf).collect()
    assert(runs.nonEmpty)
    val ev = Tables(spark, sf).events
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        u -> rows.sortBy(_.getLong(2)).map(r => (r.getString(1), r.getLong(2)))
      }
    runs.foreach { r =>
      val (u, t, len, lo, hi) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val stream = ev(u)
      val inside = stream.filter { case (_, us) => us >= lo && us <= hi }
      assert(inside.length == len && inside.forall(_._1 == t),
        s"run ($u,$t,$lo..$hi) is not a pure consecutive block")
      // maximality: the neighbors just outside the window differ in type
      val before = stream.takeWhile(_._2 < lo).lastOption
      val after = stream.dropWhile(_._2 <= hi).headOption
      assert(before.forall(_._1 != t) && after.forall(_._1 != t),
        s"run ($u,$t) is not maximal")
    }
  }

  test("dq9: repair keeps every fact and orphan count matches the anti-join") {
    import spark.implicits._
    val out = SparkEntry.queries("dq9_unknown_member")(spark, sf).collect()
    val t = Tables(spark, sf)
    val nOrders = t.orders.count()
    assert(out.map(_.getLong(1)).sum == nOrders, "repair dropped facts")
    val orphans = t.orders.join(
        t.customer.filter($"c_custkey" % 7 =!= 3).select($"c_custkey"),
        $"o_custkey" === $"c_custkey", "left_anti").count()
    assert(out.filter(_.getString(0) == "UNKNOWN").map(_.getLong(2)).sum == orphans)
    assert(out.filter(_.getString(0) != "UNKNOWN").forall(_.getLong(2) == 0L))
  }

  test("v11: recall is bounded and consistent with the two retrievals") {
    import spark.implicits._
    val rows = SparkEntry.queries("v11_ann_recall")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hit = r.getAs[Long]("n_hit")
      assert(hit >= 0L && hit <= 10L)
      assert(r.getAs[Long]("recall_pct") == hit * 100 / 10)
    }
  }

  test("dq3 margin watch: observed HLL error stays within half the pinned envelope") {
    import org.apache.spark.sql.functions.{approx_count_distinct, col}
    // dq3's within_5pct pin is a 2.5-sigma bound at rsd 0.02 (measured 5x
    // margin at 1x/10x/100x) — this watch trips if the margin ever halves,
    // catching a distribution or Spark-HLL drift BEFORE the gate flips
    val li = Tables(spark, sf).lineitem
    Seq("l_orderkey", "l_partkey", "l_suppkey").foreach { c =>
      val ad = li.agg(approx_count_distinct(col(c), 0.02)).head().getLong(0)
      val d = li.select(col(c)).distinct().count()
      val err = math.abs(ad.toDouble - d.toDouble) / d.toDouble
      info(f"$c: observed HLL error ${err * 100}%.2f%% (pin 5%%)")
      assert(err <= 0.025, s"$c HLL error margin collapsed: $err")
    }
  }

  test("u12: SCD2 summary equals a plain-Scala interval rebuild of the feed") {
    val out = SparkEntry.queries("u12_cdc_scd2")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val log = Tables(spark, sf).events
      .select(col("user_id"), col("event_id").as("seq"),
        unix_micros(col("ts")).as("us"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
                 r.getLong(4)))
    // independent rebuild: sort each key's ops on the EVENT-TIME axis,
    // open a version per U, close it at the next op of any kind
    val replay = log.groupBy(_._1).flatMap { case (uid, ops) =>
      val ordered = ops.sortBy(o => (o._3, o._2))
      val versions = ordered.zipWithIndex.collect {
        case ((_, _, us, "U", cents), i) =>
          val nextUs =
            if (i + 1 < ordered.length) Some(ordered(i + 1)._3) else None
          (us, nextUs, cents)
      }
      if (versions.isEmpty) None
      else {
        val open = versions.filter(_._2.isEmpty)
        Some(uid -> (versions.length.toLong, open.length.toLong,
          open.headOption.map(_._3).getOrElse(-1L),
          versions.collect { case (us, Some(n), _) => n - us }.sum))
      }
    }.toMap
    assert(out == replay, "engine SCD2 rebuild diverged from the serial twin")
    // the fixture exercises both open and closed-by-delete histories
    assert(out.values.exists(_._2 == 1L) && out.values.exists(_._2 == 0L))
    assert(out.values.exists(_._1 > 1L))
  }

  test("w15: transition matrix conserves transitions; shares are exact row bp") {
    val rows = SparkEntry.queries("w15_markov_transitions")(spark, sf).collect()
    val ev = Tables(spark, sf).events.select("user_id")
    val nEvents = ev.count(); val nUsers = ev.distinct().count()
    // each user's length-L stream emits exactly L-1 adjacent transitions
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val rowN = rs.map(_.getLong(2)).sum
      rs.foreach { r =>
        assert(r.getLong(4) == r.getLong(2) * 10000 / rowN)
        assert(r.getLong(3) <= r.getLong(2))
      }
    }
  }

  test("dq16: freshness math is internally exact; the newest feed meets the SLA") {
    val rows = SparkEntry.queries("dq16_freshness_sla")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == Tables(spark, sf).events.count())
    // the type holding the corpus max has zero lag and a green SLA
    assert(rows.exists(r => r.getLong(2) == 0L && r.getLong(3) == 1L))
    rows.foreach { r =>
      assert(r.getLong(2) >= 0)
      assert(r.getLong(3) == (if (r.getLong(2) <= 21600000000L) 1L else 0L))
      assert(r.getLong(4) <= r.getLong(1))
    }
  }

  test("e31: streamed freshness report equals the batch hour-bucket recompute") {
    import spark.implicits._
    val out = SparkEntry.queries("e31_stream_freshness")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1).toSeq
    // identical arithmetic, batch path — micro-batched bucket upkeep must
    // change nothing
    val b = Tables(spark, sf).events
      .select($"event_type", unix_micros($"ts").as("us"))
      .withColumn("hr", expr("us div 3600000000 * 3600000000"))
      .groupBy($"event_type", $"hr")
      .agg(count(lit(1)).as("n"), min($"us").as("mn"), max($"us").as("mx"))
    val now = b.agg(max($"mx").as("now_us"))
    val batch = b.crossJoin(broadcast(now))
      .groupBy($"event_type")
      .agg(sum($"n").as("n_events"), max($"mx").as("last_us"),
           min($"mn").as("first_us"), max($"now_us").as("now_us"),
           sum(when($"hr" >= expr(
               "now_us div 3600000000 * 3600000000 - 82800000000"),
             $"n").otherwise(0L)).as("day_n"))
      .withColumn("lag_us", $"now_us" - $"last_us")
      .withColumn("sla_ok", when($"lag_us" <= 21600000000L, 1L).otherwise(0L))
      .withColumn("daily_avg",
        expr("n_events * 86400000000 div greatest(now_us - first_us, 1)"))
      .withColumn("rate_ratio_bp",
        expr("day_n * 10000 div greatest(daily_avg, 1)"))
      .select($"event_type", $"n_events", $"lag_us", $"sla_ok",
              $"day_n", $"daily_avg", $"rate_ratio_bp")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1).toSeq
    assert(out == batch, "streamed report diverged from the batch recompute")
    assert(out.exists(_._4 == 1L))
  }

  test("g21: epoch plan is integer-consistent; some domain reaches a full epoch") {
    val rows = SparkEntry.queries("g21_epoch_plan")(spark, sf).collect()
    rows.foreach { r =>
      val (nc, target, full, rate, planned) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(full == target / nc)
      assert(rate == (target - full * nc) * 10000 / nc && rate < 10000)
      assert(planned >= full * nc && planned <= (full + 1) * nc)
    }
    assert(rows.exists(_.getLong(4) >= 1L),
      "no domain reached a full epoch — the upsampling path is untested")
  }

  test("x26: contamination fractions match a plain-Scala set intersection") {
    import spark.implicits._
    val out = SparkEntry.queries("x26_contamination_report")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
                                 r.getLong(4))).toMap
    val sh = Tables(spark, sf).documents
      .select($"doc_id",
        explode(graft.functions.TextKernels.shingleHashesUdf($"text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val evalDocs = sh.filter(_._1 % 97 == 0)
    val trainGrams = sh.filter(_._1 % 97 != 0).map(_._2).toSet
    val twin = evalDocs.groupBy(_._1).map { case (id, xs) =>
      val gs = xs.map(_._2).distinct
      val hit = gs.count(trainGrams)
      val bp = hit.toLong * 10000 / gs.length
      id -> (gs.length.toLong, hit.toLong, bp, if (bp >= 5000) 1L else 0L)
    }
    assert(out == twin, "report diverged from the set-intersection twin")
    assert(out.values.exists(_._2 > 0), "fixture must witness contamination")
  }

  test("x25: boilerplate accounting matches a direct gram recount") {
    import spark.implicits._
    val rows = SparkEntry.queries("x25_boilerplate_passages")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(2))
      assert(r.getLong(5) == r.getLong(4) * 10000 / r.getLong(2))
      assert(r.getLong(3) <= r.getLong(1))
    }
    val direct = Tables(spark, sf).documents
      .select(expr(graft.catalog.Tx.wsExpr).as("ws"))
      .filter(size($"ws") >= 8)
      .agg(sum(size($"ws") - 7)).head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == direct,
      "per-source gram occurrences must re-add to the corpus gram count")
  }

  test("c13: composed health gate carries each monitor as shipped; verdict = AND") {
    val rows = SparkEntry.queries("c13_ops_health")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    val byStage = rows.groupBy(_._1)
    assert(byStage("freshness").length ==
      SparkEntry.queries("dq16_freshness_sla")(spark, sf).count())
    assert(byStage("drift").length ==
      SparkEntry.queries("dq12_drift_chi2")(spark, sf).count())
    assert(byStage("anomaly").length ==
      SparkEntry.queries("dq10_rolling_anomaly")(spark, sf).count())
    val verdict = byStage("verdict").head._3
    assert(verdict == rows.filter(_._1 != "verdict").forall(_._3),
      "verdict must be the conjunction of every monitor flag")
  }

  test("w16: latency histogram conserves converters; the cumulative curve closes at 10000 bp") {
    val rows = SparkEntry.queries("w16_conversion_lag")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // cum_users is the running sum; the last bucket closes at 10000 bp
    var run = 0L
    rows.foreach { case (_, n, cum, bp) =>
      run += n
      assert(cum == run)
      assert(bp == cum * 10000 / rows.map(_._2).sum)
    }
    assert(rows.last._4 == 10000L)
    assert(rows.forall(_._1 >= 0L), "latency cannot precede the first view")
  }

  test("u13: three-way merge equals a plain-Scala per-key classification") {
    val out = SparkEntry.queries("u13_three_way_merge")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val base = Tables(spark, sf).customer
      .select(col("c_custkey"),
        expr("cast(round(c_acctbal * 100) as bigint)").as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def snapA = base.collect {
      case (k, c) if k % 7 != 0 => k -> (if (k % 5 == 0) c + 1000 else c)
    } ++ base.collect { case (k, c) if k % 13 == 0 => (k + 1000000000L) -> c }
    def snapB = base.collect {
      case (k, c) if k % 11 != 0 => k -> (if (k % 3 == 0) c + 2000 else c)
    } ++ base.collect { case (k, c) if k % 17 == 0 => (k + 2000000000L) -> c }
    val (a, b) = (snapA.toMap, snapB.toMap)
    val twin = (base.keySet ++ a.keySet ++ b.keySet).toSeq.map { k =>
      val (c0, ca, cb) = (base.get(k), a.get(k), b.get(k))
      val (chA, chB) = (ca != c0, cb != c0)
      val disp =
        if (!chA && !chB) "unchanged"
        else if (chA && !chB) "a_only"
        else if (!chA && chB) "b_only"
        else if (ca == cb) "both_same"
        else "conflict"
      val merged = disp match {
        case "a_only" => ca
        case "b_only" => cb
        case "both_same" => ca
        case _ => c0
      }
      (disp, merged)
    }.groupBy(_._1).map { case (d, xs) =>
      d -> (xs.length.toLong, xs.count(_._2.isDefined).toLong,
            xs.flatMap(_._2).sum)
    }
    assert(out == twin, "merge report diverged from the per-key twin")
    assert(out.keySet == Set("unchanged", "a_only", "b_only", "both_same",
      "conflict"), "fixture must witness all five dispositions")
  }

  test("d20: sweep identities hold; the shipped geometry's candidates cover d2's pairs") {
    import spark.implicits._
    val rows = SparkEntry.queries("d20_band_sweep")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L, 8L))
    rows.foreach { r =>
      val (truth, cand, hit, rec, prec) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(hit <= math.min(truth, cand))
      assert(rec == hit * 1000 / math.max(truth, 1L))
      assert(prec == hit * 1000 / math.max(cand, 1L))
    }
    // d2's final pairs (est-filtered) must be a subset of the 4×4
    // geometry's candidate set — the est filter only ever removes
    val d2 = SparkEntry.queries("d2_minhash_lsh")(spark, sf)
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sweep44 = rows.find(_.getLong(0) == 4L).get
    assert(d2.nonEmpty && sweep44.getLong(3) >= d2.size.toLong,
      "4×4 candidates cannot undercut d2's est-filtered pairs")
  }

  test("u11: one-aggregate apply equals the serial per-key replay of the shuffled log") {
    import org.apache.spark.sql.functions.{col, expr, when, lit}
    val out = SparkEntry.queries("u11_ooo_cdc_apply")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // independent serial replay: fold each key's ops IN SEQ ORDER
    val log = Tables(spark, sf).events
      .select(col("user_id"), col("event_id").as("seq"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val replay = log.groupBy(_._1).flatMap { case (uid, ops) =>
      val ordered = ops.sortBy(_._2)
      val (_, lastSeq, lastOp, lastCents) = ordered.last
      if (lastOp == "D") None
      else Some(uid -> (lastSeq, lastCents, ops.length.toLong,
        ops.count(_._3 == "D").toLong))
    }.toMap
    assert(out == replay, "argmax apply diverged from the serial replay")
    // the fixture must actually exercise terminal deletes and survivors
    assert(log.exists(_._3 == "D") && out.nonEmpty)
    assert(replay.size < log.map(_._1).distinct.length ||
           log.forall(_._3 != "D") == false)
  }

  test("u14: the three delta-rule terms partition the refreshed join exactly") {
    import spark.implicits._
    val t = Tables(spark, sf)
    val o = t.orders.select($"o_orderkey", $"o_orderpriority")
    val l = t.lineitem.select($"l_orderkey", $"l_suppkey")
    val oOld = o.filter($"o_orderkey" % 10 =!= 7)
    val oNew = o.filter($"o_orderkey" % 10 === 7)
    val lOld = l.filter($"l_orderkey" % 10 =!= 7 && $"l_suppkey" % 13 =!= 0)
    val lNew = l.filter($"l_orderkey" % 10 === 7 ||
                        ($"l_orderkey" % 10 =!= 7 && $"l_suppkey" % 13 === 0))
    def n(a: org.apache.spark.sql.DataFrame,
          b: org.apache.spark.sql.DataFrame): Long =
      a.join(b, $"l_orderkey" === $"o_orderkey").count()
    // ΔO⋈L₀ ∪ O₀⋈ΔL ∪ ΔO⋈ΔL covers the refresh with no overlap: the
    // term counts plus the base view's rows sum to the full recompute.
    val full = n(o, l)
    val parts = n(oOld, lOld) + n(oNew, lOld) + n(oOld, lNew) + n(oNew, lNew)
    assert(parts == full, s"delta terms double-count or drop rows: $parts != $full")
    // and every split side is non-trivial on the fixture
    assert(oNew.count() > 0 && lNew.count() > 0 && n(oOld, lNew) > 0)
  }

  test("w17: life-table conservation, risk-set recurrence, censoring witnessed") {
    import spark.implicits._
    val rows = SparkEntry.queries("w17_survival_hazard")(spark, sf).collect()
    val nViewers = Tables(spark, sf).events
      .filter($"event_type" === "view").select($"user_id").distinct().count()
    // every viewer leaves the table exactly once (event or censor)
    val leavers = rows.map(r =>
      r.getAs[Long]("n_events") + r.getAs[Long]("n_censored")).sum
    assert(leavers == nViewers)
    assert(rows.head.getAs[Long]("n_at_risk") == nViewers)
    // risk set obeys the life-table recurrence n(t+1) = n(t) - d(t) - c(t)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_at_risk") ==
          a.getAs[Long]("n_at_risk") - a.getAs[Long]("n_events") -
            a.getAs[Long]("n_censored"))
      case _ =>
    }
    rows.foreach { r =>
      val h = r.getAs[Long]("hazard_bp")
      assert(h >= 0 && h <= 10000)
    }
    // the value>=100 qualifier must leave a real censored population
    assert(rows.map(_.getAs[Long]("n_censored")).sum > 0,
      "fixture has no censoring — the operator's defining branch is dead")
  }

  test("dq17: group sizes and distinct-l match a plain-Scala recount") {
    import spark.implicits._
    val got = SparkEntry.queries("dq17_l_diversity")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_status"),
         r.getAs[Boolean]("l_ok"))).toMap
    val utc = java.time.ZoneOffset.UTC
    val want = Tables(spark, sf).orders
      .select($"o_orderpriority", $"o_orderdate", $"o_orderstatus").collect()
      .map { r =>
        val d = r.get(1) match {
          case t: java.sql.Timestamp => t.toInstant.atZone(utc).toLocalDateTime
          case l: java.time.LocalDateTime => l
        }
        ((r.getString(0), (d.getYear * 100 + d.getMonthValue).toLong),
         r.getString(2))
      }
      .groupBy(_._1).map { case (k, g) =>
        val sts = g.map(_._2)
        k -> (sts.length.toLong, sts.distinct.length.toLong,
              sts.distinct.length >= 2)
      }
    assert(got == want)
    // homogeneous groups exist on the fixture (the attack the audit finds)
    assert(got.values.exists(!_._3) && got.values.exists(_._3))
  }

  test("r11: time-weighted averages equal a serial per-user replay") {
    import spark.implicits._
    val ev = Tables(spark, sf).events
      .select($"user_id", $"event_id",
        expr("cast(round(value * 100) as bigint)").as("cents"),
        unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).flatMap { case (uid, g) =>
      val ordered = g.sortBy(e => (e._4, e._2))
      val ivs = ordered.zip(ordered.drop(1)).map { case (a, b) =>
        (a._3, (b._4 - a._4) / 1000000L)
      }
      val totalS = ivs.map(_._2).sum
      if (ivs.isEmpty || totalS <= 0) None
      else Some(uid -> (ivs.length.toLong, totalS,
        ivs.map { case (c, d) => c * d }.sum / totalS))
    }
    val got = SparkEntry.queries("r11_time_weighted_avg")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want.toMap)
    assert(got.nonEmpty)
  }

  test("dq18: Benford table closes; observed digits partition the ledger") {
    import spark.implicits._
    val rows = SparkEntry.queries("dq18_benford_audit")(spark, sf).collect()
    // the hardcoded expected table is a probability distribution in ppm
    val expSum = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
                     66947L, 57992L, 51153L, 45757L).sum
    assert(expSum == 1000000L, s"Benford ppm constants drifted: $expSum")
    assert(rows.forall(r => r.getAs[Long]("digit") >= 1 &&
                            r.getAs[Long]("digit") <= 9))
    val nPos = Tables(spark, sf).orders
      .filter(expr("cast(round(o_totalprice * 100) as bigint) > 0")).count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum == nPos)
    val obsSum = rows.map(_.getAs[Long]("obs_ppm")).sum
    assert(obsSum <= 1000000L && obsSum >= 1000000L - rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("abs_dev_ppm") ==
        math.abs(r.getAs[Long]("obs_ppm") - r.getAs[Long]("exp_ppm")))
    }
  }

  test("a13: group mode equals a plain recount with the smallest-value tiebreak") {
    import spark.implicits._
    val data = Tables(spark, sf).lineitem
      .select($"l_returnflag", expr("cast(l_quantity as bigint)").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = data.groupBy(_._1).map { case (f, g) =>
      val counts = g.groupBy(_._2).map { case (q, o) => (q, o.length.toLong) }
      val (mq, mn) = counts.toSeq.sortBy { case (q, n) => (-n, q) }.head
      f -> (mq, mn, g.length.toLong)
    }
    val got = SparkEntry.queries("a13_group_mode")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
  }

  test("j12: grid-blocked geofence equals the brute-force radius scan") {
    import spark.implicits._
    val pts = Tables(spark, sf).customer
      .select($"c_custkey",
        expr(s"(c_custkey * 48271 + 7) % ${graft.catalog.Tx.P} % 1000000"),
        expr(s"(c_custkey * 16807 + 11) % ${graft.catalog.Tx.P} % 1000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val centers = pts.filter(_._1 < 100)
    val want = centers.map { case (cid, xc, yc) =>
      val in = pts.map { case (_, x, y) =>
        (x - xc) * (x - xc) + (y - yc) * (y - yc)
      }.filter(_ <= 2500000000L)
      (cid, in.length.toLong, in.sum)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("j12_spatial_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want,
      "grid blocking missed or fabricated a radius hit vs brute force")
    assert(got.exists(_._2 > 0), "no center has any point in range — vacuous")
  }

  test("w19: cohort LTV conserves users, revenue, and the running sum") {
    import spark.implicits._
    val rows = SparkEntry.queries("w19_cohort_ltv")(spark, sf).collect()
    val ev = Tables(spark, sf).events
    val nUsers = ev.select($"user_id").distinct().count()
    val totCents = ev.filter($"event_type" === "purchase")
      .agg(sum(expr("cast(round(value * 100) as bigint)"))).head().getLong(0)
    // each user belongs to exactly one cohort
    val byCohort = rows.groupBy(_.getAs[Long]("cohort_ym"))
    assert(byCohort.values.map(_.head.getAs[Long]("cohort_n")).sum == nUsers)
    // all purchase cents land in exactly one (cohort, age) cell
    assert(rows.map(_.getAs[Long]("rev_cents")).sum == totCents)
    byCohort.values.foreach { cells =>
      val sorted = cells.sortBy(_.getAs[Long]("age"))
      // age-0 cell exists and every cohort member is active in it
      assert(sorted.head.getAs[Long]("age") == 0)
      assert(sorted.head.getAs[Long]("n_active") ==
        sorted.head.getAs[Long]("cohort_n"))
      // cum_rev is the exact running sum; ltv is its integer quotient
      var run = 0L
      sorted.foreach { c =>
        run += c.getAs[Long]("rev_cents")
        assert(c.getAs[Long]("cum_rev_cents") == run)
        assert(c.getAs[Long]("ltv_cents") == run / c.getAs[Long]("cohort_n"))
      }
    }
  }
}

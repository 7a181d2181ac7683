package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryPack, Scratch, Tables}

/** DATA-QUALITY operators — the reference's validate semantics (E2 dry-run,
  * error counters) elevated to warehouse scale: declarative rule audits and
  * column profiling over the star schema (SURVEY.md §2.B; reference
  * validate → csv_etl dynamic.py error counters are the §2.A ancestors).
  *
  * dq1 evaluates five rule families — range checks, null checks, a
  * cross-table temporal consistency rule (join), and referential integrity
  * (anti-join) — and reports per-rule violation counts. Scale shape: the
  * three lineitem rules share ONE conditional-aggregation scan; the FK
  * check is a broadcast anti-join; nothing materializes violating rows
  * (count-only — the audit report; violation EXTRACTION is the same plan
  * with the filter kept).
  *
  * dq2 profiles columns exactly — count / nulls / distincts / min / max
  * per column, the statistics a catalog or optimizer ingests — via one
  * two-level aggregate per column (groupBy value, then fold the distinct
  * map), deliberately NOT one multi-distinct aggregate, whose Expand
  * re-enters every scan row once per distinct column. Doubles surface as
  * DECIMAL strings so both engines format identically. dq3 is the
  * single-scan 100 TB path: approx_count_distinct sketches are
  * plain (mergeable) aggregates — its production aggregate is one scan
  * with NO Expand (the verification-only exact distincts run as separate
  * dq2-shape two-level aggregates and join back as 1-row broadcasts,
  * keeping the Expand out of the plan entirely) — pinned with a4's
  * envelope pattern (exact value + a boolean that the sketch landed within
  * the documented 5% rsd; a deployment drops the verification-only exact
  * columns and keeps the single-scan plan).
  */
object Quality extends QueryPack {

  /** dq11's release threshold: quasi-id combinations with fewer members
    * are suppressed from the release. */
  private val KAnon = 5L

  /** dq13's profiled columns — one list feeds BOTH engines. */
  private val Dq13Cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // dq20: DECLARATIVE EXPECTATION SUITE — reference ROADMAP.md:49 ("Data
    // validation rules"): dq1's audits with the rules
    // moved OUT of code into the reference's native medium: a JSON spec
    // (SpecStore.parseExpectationSuite — the config-file format of
    // models.py:174-267 pointed at data quality, the dbt-tests /
    // Great-Expectations slot). ExpectationCompiler turns the whole suite
    // into ONE aggregate pass: every rule is a counting aggregate over the
    // same scan (unique rides along as a distinct aggregate), so a
    // 50-rule suite over a 100 TB table costs one scan — no per-rule
    // jobs. Value checks skip NULLs (only not_null counts them; the
    // model's composability contract). Suite below mixes passing and
    // failing rules so the audit is non-vacuous: l_linestatus 'F'-only
    // fails on 'O' rows, the anchored returnflag regex fails on 'R' rows,
    // unique(l_orderkey) fails on multi-line orders.
    "dq20_expectation_suite" -> { (s, dir) =>
      import s.implicits._
      val suite = graft.spec.SpecStore.parseExpectationSuite("""{
        "id": "li_suite", "name": "lineitem checks", "table": "lineitem",
        "expectations": [
          {"column": "l_shipdate",   "check": "not_null"},
          {"column": "l_quantity",   "check": "range", "lo": 1, "hi": 50},
          {"column": "l_discount",   "check": "range", "lo": 0, "hi": 0.05},
          {"column": "l_returnflag", "check": "accepted_values",
           "values": ["A", "N", "R"]},
          {"column": "l_linestatus", "check": "accepted_values",
           "values": ["F"]},
          {"column": "l_returnflag", "check": "regex_match",
           "pattern": "^[AN]$"},
          {"column": "l_orderkey",   "check": "unique"}
        ]}""")
      graft.compile.ExpectationCompiler.audit(Tables(s, dir).lineitem, suite)
        .orderBy($"col_name", $"check_name")
    },
    // dq21: RUN-HISTORY STORE — the reference ROADMAP's "Conversion
    // history and logs" UI row (round-11 verdict item 4) as a durable
    // SpecStore type: app.py:215-224 holds per-run counters only in the
    // volatile Flask session; here every convert appends a RunRecord to
    // runs.json (E3's counter semantics, caller-injected timestamps so
    // nothing reads a clock). Staged: orders rendered to three input CSVs
    // (split by o_orderkey mod 3) and run through a mapping whose filter
    // skips 'F' rows and whose lookup errors on 'P' (no _default) — so
    // each run's success/skipped/error counters are all non-vacuous. The
    // query serves the STORE; the oracle recomputes every counter from
    // the raw orders table — a green row proves the persisted history
    // agrees with what the engine actually did. Scale shape: the store is
    // METADATA (one row per run, KBs at 100 TB); the runs themselves are
    // ordinary distributed converts.
    "dq21_run_history" -> { (s, dir) =>
      import s.implicits._
      val store = Scratch.staged(s"dq21_runs#$dir", "dq21_runs") { p =>
        import java.nio.file.{Files => F, Paths}
        F.createDirectories(Paths.get(p))
        val src = Tables(s, dir).orders.select(
          $"o_orderkey".cast("string").as("okey"),
          $"o_orderstatus".as("status"))
        val mapping = graft.spec.SpecStore.parseMapping("""{
          "id": "runs_m", "name": "Runs demo",
          "source_id": "s", "destination_id": "d",
          "field_mappings": [
            {"destination_field": "okey", "source_field": "okey",
             "transform_type": "direct", "transform_config": {}},
            {"destination_field": "status_name", "source_field": "status",
             "transform_type": "lookup", "transform_config": {"O": "open"}}],
          "filter_rules": [
            {"field": "status", "operator": "equals", "value": "F"}]}""")
        val runsJson = s"$p/runs.json"
        (0 until 3).foreach { b =>
          val inFile = s"$p/in_$b.csv"
          graft.engine.CsvSink.writeSingleFile(
            src.filter(pmod($"okey".cast("long"), lit(3)) === b),
            Seq("okey", "status"), inFile)
          val df = graft.engine.CsvSource.read(s, inFile,
            graft.spec.FileSpec("s", "s"))
          val r = graft.engine.Runner.convert(df, mapping, s"$p/out_$b.csv",
            failOnError = false)
          graft.spec.SpecStore.appendRun(runsJson, graft.spec.RunRecord(
            id = s"run_${b + 1}", mappingId = mapping.id, kind = "convert",
            inputFile = s"in_$b.csv",
            outputFile = if (r.written) Some(s"out_$b.csv") else None,
            successCount = r.successCount, skippedCount = r.skippedCount,
            errorCount = r.errorCount, written = r.written,
            startedAt = s"2026-01-01T00:00:0${b}Z",
            finishedAt = s"2026-01-01T00:00:0${b}Z"))
        }
      }
      // the served frame IS the persisted store (driver-side parse of
      // run METADATA — one row per run, never data-scale)
      val runs = graft.spec.SpecStore.loadRuns(s"$store/runs.json")
      s.createDataFrame(runs.toSeq.map { case (id, r) =>
        (id, r.mappingId, r.successCount, r.skippedCount, r.errorCount,
          r.written)
      }).toDF("run_id", "mapping_id", "n_success", "n_skipped", "n_errors",
              "written")
        .orderBy($"run_id")
    },
    // c18: BACKFILL PLANNER — the ops question every 100 TB pipeline
    // owner asks after a logic change or a late-data burst: WHICH
    // partitions must re-run, and how big are they? The staged store is a
    // per-day rollup with a partition MANIFEST carrying each day's
    // logic_version and row count (written at build time, the k28/k13
    // manifest discipline); the pipeline is now at version 2 but only
    // day-of-month % 3 = 0 partitions were built with it, and a late feed
    // (event_id % 997 = 0, withheld from the build) has arrived since.
    // The plan = version-stale days ∪ late-touched days, each with reason
    // and both row counts (recompute cost estimate). Scale shape: the
    // manifest is METADATA (one row per partition — KBs at 100 TB), the
    // late feed aggregates by day before the join, and the store itself
    // is never rescanned — planning cost is O(|late batch| + |manifest|),
    // independent of store size.
    "c18_backfill_plan" -> { (s, dir) =>
      import s.implicits._
      val root = Scratch.staged(s"c18_store#$dir", "c18_store") { p =>
        import java.nio.file.{Files => F, Paths}
        F.createDirectories(Paths.get(p))
        val daily = Tables(s, dir).events
          .filter(pmod($"event_id", lit(997)) =!= 0)
          .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n_rows"))
        daily.write.mode("overwrite").parquet(s"$p/store")
        val entries = daily
          .withColumn("version",
            when(pmod(dayofmonth(to_date($"day")), lit(3)) === 0, 2)
              .otherwise(1))
          .select(concat_ws("\t", $"day", $"version", $"n_rows"))
          .collect().map(_.getString(0)).sorted // one line per PARTITION
        F.writeString(Paths.get(s"$p/manifest.tsv"), entries.mkString("\n"))
      }
      val manifest = s.read.option("sep", "\t")
        .schema("day string, version int, n_rows long")
        .csv(s"$root/manifest.tsv")
      val late = Tables(s, dir).events
        .filter(pmod($"event_id", lit(997)) === 0)
        .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_late"))
      manifest.join(late, Seq("day"), "full")
        .withColumn("stale", coalesce($"version", lit(0)) < 2)
        .withColumn("is_late", $"n_late".isNotNull)
        .filter($"stale" || $"is_late")
        .select($"day",
          when($"stale" && $"is_late", "both")
            .when($"stale", "stale").otherwise("late").as("reason"),
          coalesce($"n_rows", lit(0L)).as("store_rows"),
          coalesce($"n_late", lit(0L)).as("late_rows"))
        .orderBy($"day")
    },
    // dq13: INFERRED-EXPECTATION AUDIT — dq1 audits rules someone wrote;
    // dq13 DERIVES them from an accepted reference partition and audits
    // the incoming one against its own history (the expectation-suite
    // profiling loop: "yesterday's accepted data defines today's
    // contract"). Per numeric column the reference yields [min, max] and
    // whether nulls ever occurred; the target partition reports
    // below-range / above-range / newly-null counts. Scale shape
    // (100 TB): ONE aggregate scan per side — the derived bounds are a
    // 1-row broadcast into the target's conditional aggregate (no join
    // by key, no shuffle beyond the two map-side-combined aggs); the
    // report is 4 rows however large either partition. No arithmetic
    // crosses engines: min/max are exact value selections, counts are
    // integers.
    "dq13_inferred_rules" -> { (s, dir) =>
      import s.implicits._
      val li = Tables(s, dir).lineitem
      val ref = li.filter(pmod($"l_orderkey", lit(10)) =!= 0)
      val tgt = li.filter(pmod($"l_orderkey", lit(10)) === 0)
      val boundExprs = Dq13Cols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"lo_$c"),
        max(col(c)).cast("double").as(s"hi_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c")))
      val bounds = ref.agg(boundExprs.head, boundExprs.tail: _*)
      val auditExprs = count(lit(1)).as("n") +: Dq13Cols.flatMap(c => Seq(
        sum(when(col(c) < col(s"lo_$c"), 1L).otherwise(0L)).as(s"bl_$c"),
        sum(when(col(c) > col(s"hi_$c"), 1L).otherwise(0L)).as(s"ab_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nu_$c")))
      val audited = tgt.crossJoin(broadcast(bounds))
        .agg(auditExprs.head, auditExprs.tail: _*)
        .crossJoin(broadcast(bounds))
      Dq13Cols.map { c =>
        audited.select(lit(c).as("col_name"),
          col(s"lo_$c").as("lo"), col(s"hi_$c").as("hi"),
          $"n".as("n_checked"), col(s"bl_$c").as("n_below"),
          col(s"ab_$c").as("n_above"),
          when(col(s"nn_$c") === 0L, col(s"nu_$c")).otherwise(lit(0L))
            .as("n_new_nulls"))
      }.reduce(_.unionByName(_))
        .withColumn("pass",
          $"n_below" + $"n_above" + $"n_new_nulls" === 0L)
        .orderBy($"col_name")
    },
    // dq16: FRESHNESS SLA + ARRIVAL-RATE MONITOR — the ops question every
    // feed answers before anything downstream runs: "is the pipe still
    // flowing, per source?" Reference now = the corpus max event time
    // (deterministic, no wall clock — the monitor's own ingestion
    // watermark). Per event_type: last-seen lag vs a 6 h SLA, plus the
    // trailing-24 h arrival count against the type's LIFETIME daily rate
    // (rate_ratio_bp < 10000 = the feed slowed; a silent-stall detector
    // even when the SLA still holds). All integer micros. Scale: two
    // conditional aggregates over one scan — the per-type state is a
    // handful of rows at any corpus size, no window anywhere.
    "dq16_freshness_sla" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables(s, dir).events
        .select($"event_type", unix_micros($"ts").as("us"))
      val now = ev.agg(max($"us").as("now_us"))
      ev.crossJoin(broadcast(now))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
             max($"us").as("last_us"),
             min($"us").as("first_us"),
             max($"now_us").as("now_us"),
             sum(when($"us" >= $"now_us" - 86400000000L, 1L).otherwise(0L))
               .as("last_day_n"))
        .withColumn("lag_us", $"now_us" - $"last_us")
        .withColumn("sla_ok",
          when($"lag_us" <= 21600000000L, 1L).otherwise(0L))
        .withColumn("daily_avg",
          expr("n_events * 86400000000 div greatest(now_us - first_us, 1)"))
        .withColumn("rate_ratio_bp",
          expr("last_day_n * 10000 div greatest(daily_avg, 1)"))
        .select($"event_type", $"n_events", $"lag_us", $"sla_ok",
                $"last_day_n", $"daily_avg", $"rate_ratio_bp")
        .orderBy($"event_type")
    },
    // c13: COMPOSED OPS-HEALTH GATE — c9's release-suite pattern applied
    // to the MONITORING family: one verdict over freshness (dq16's SLA
    // flag per feed), distribution drift (dq12's per-bin chi-square
    // contribution, red when one bin carries ≥ half the ppm mass), and
    // revenue anomalies (dq10's 3-sigma rolling flag per day) — the page
    // an on-call reads before letting the nightly pipeline run. Each leg
    // runs AS SHIPPED (composition adds no shuffle the standalone
    // entries lack); the verdict is a 1-row min over the unioned flags.
    "c13_ops_health" -> { (s, dir) =>
      import s.implicits._
      val fresh = queries("dq16_freshness_sla")(s, dir)
        .select(lit("freshness").as("stage"), $"event_type".as("item"),
                ($"sla_ok" === 1L).as("pass"))
      val drift = queries("dq12_drift_chi2")(s, dir)
        .select(lit("drift").as("stage"), $"bin".cast("string").as("item"),
                ($"contrib_ppm" <= 500000L).as("pass"))
      val anom = queries("dq10_rolling_anomaly")(s, dir)
        .select(lit("anomaly").as("stage"),
                date_format($"o_orderdate", "yyyy-MM-dd").as("item"),
                (!$"is_anomaly").as("pass"))
      // persisted: the summary rows feed BOTH the report and the verdict
      // aggregate — without it the dq16+dq12+dq10 subtree executes twice
      // (d16's multi-consumer discipline; round-14)
      val u = fresh.unionByName(drift).unionByName(anom)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val verdict = u.agg(min($"pass".cast("int")).as("mn"))
        .select(lit("verdict").as("stage"), lit("all").as("item"),
                ($"mn" === 1).as("pass"))
      u.unionByName(verdict).orderBy($"stage", $"item")
    },
    "dq1_quality_audit" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val li = t.lineitem
      val liAgg = li.agg(
        count(lit(1)).as("n"),
        sum(when(!$"l_quantity".between(1, 50), 1L).otherwise(0L)).as("v_qty"),
        sum(when(!$"l_discount".between(0.0, 0.1), 1L).otherwise(0L)).as("v_disc"))
      def rule(name: String, checked: org.apache.spark.sql.Column,
               viol: org.apache.spark.sql.Column)(from: DataFrame): DataFrame =
        from.select(lit(name).as("rule"), checked.cast("long").as("n_checked"),
                    viol.cast("long").as("n_violations"),
                    (viol === 0L).as("pass"))
      val r1 = rule("r1_quantity_range", $"n", $"v_qty")(liAgg)
      val r2 = rule("r2_discount_range", $"n", $"v_disc")(liAgg)
      val cust = t.customer
      val r3base = t.orders.agg(count(lit(1)).as("n")).crossJoin(
        t.orders.join(broadcast(cust.select($"c_custkey")),
            $"o_custkey" === $"c_custkey", "left_anti")
          .agg(count(lit(1)).as("v")))
      val r3 = rule("r3_orders_custkey_fk", $"n", $"v")(r3base)
      val r4base = cust.agg(count(lit(1)).as("n"),
        sum(when($"c_acctbal".isNull, 1L).otherwise(0L)).as("v"))
      val r4 = rule("r4_acctbal_not_null", $"n", $"v")(r4base)
      val r5base = li.select($"l_orderkey", $"l_shipdate")
        .join(t.orders.select($"o_orderkey", $"o_orderdate"),
              $"l_orderkey" === $"o_orderkey")
        .agg(count(lit(1)).as("n"),
             sum(when($"l_shipdate" < $"o_orderdate", 1L).otherwise(0L)).as("v"))
      val r5 = rule("r5_ship_after_order", $"n", $"v")(r5base)
      r1.union(r2).union(r3).union(r4).union(r5).orderBy($"rule")
    },
    "dq3_profile_approx" -> { (s, dir) =>
      import s.implicits._
      val li = Tables(s, dir).lineitem
      // The PRODUCTION half is the first aggregate alone: count/nulls/HLL
      // sketches are all plain mergeable aggregates — ONE scan, no Expand.
      // The three EXACT distincts exist only to verify the sketch envelope;
      // folding them into the same agg as countDistinct re-plans the scan
      // as an Expand (every row enters the aggregate 3× — measured as the
      // dominant dq3 cost, dq2's lesson). They run instead as dq2's
      // two-level shape (distinct collapses map-side, shuffles carry
      // |distinct| rows) and join back as 1-row broadcasts. A deployment
      // drops the verification columns and keeps the single-scan plan.
      // rsd = 0.02, NOT the 0.05 default: the pinned within_5pct envelope
      // is then a 2.5σ bound (sketch error is scale-independent, so it
      // holds at any N) — at the default the pin is 1σ and flipped on one
      // column in the round-7 100× soak. Round 7 first fixed this with
      // rsd 0.01 (5σ) but that made dq3 the suite's one plan-cost
      // regression (0.54→2.37 s — ~25× the HLL registers touched per row);
      // round 8 measured rsd 0.02 across 1×/10×/100×: max observed error
      // 1.0% vs the 5% pin (5× margin at every scale, rsd 0.03's 4.3%
      // max is too close), and the agg scan returns to sub-second.
      val a = li.agg(
        count(lit(1)).as("n"),
        sum($"l_partkey".isNull.cast("long")).as("pk_null"),
        approx_count_distinct($"l_partkey", 0.02).as("pk_ad"),
        sum($"l_suppkey".isNull.cast("long")).as("sk_null"),
        approx_count_distinct($"l_suppkey", 0.02).as("sk_ad"),
        sum($"l_orderkey".isNull.cast("long")).as("ok_null"),
        approx_count_distinct($"l_orderkey", 0.02).as("ok_ad"))
        .crossJoin(li.select($"l_partkey").distinct()
          .agg(count(lit(1)).as("pk_d")))
        .crossJoin(li.select($"l_suppkey").distinct()
          .agg(count(lit(1)).as("sk_d")))
        .crossJoin(li.select($"l_orderkey").distinct()
          .agg(count(lit(1)).as("ok_d")))
      def ok(ad: String, d: String) =
        s"abs(cast($ad as double) - cast($d as double)) <= cast($d as double) * 0.05"
      a.selectExpr(
          s"""stack(3,
             'l_orderkey', n, ok_null, ok_d, ${ok("ok_ad", "ok_d")},
             'l_partkey',  n, pk_null, pk_d, ${ok("pk_ad", "pk_d")},
             'l_suppkey',  n, sk_null, sk_d, ${ok("sk_ad", "sk_d")})
             AS (col, n, n_null, n_distinct, within_5pct)""")
        .orderBy($"col")
    },
    // dq4: SNAPSHOT PROFILE DRIFT — u8 diffs ROWS between two snapshots;
    // dq4 diffs DISTRIBUTIONS: per-column row and distinct counts of two
    // table versions (B simulates a short load: every 7th order missing),
    // deltas in integer per-mille, `drifted` on a 5% threshold — the
    // monitor a nightly pipeline runs before promoting a snapshot. Two
    // single-scan aggregates + a 3-row join; all-integer arithmetic.
    "dq4_profile_drift" -> { (s, dir) =>
      import s.implicits._
      val li = Tables(s, dir).lineitem
      def prof(df: DataFrame, tag: String): DataFrame =
        df.agg(
            count(lit(1)).as("n"),
            countDistinct($"l_quantity").as("qty_d"),
            countDistinct($"l_discount").as("disc_d"),
            countDistinct($"l_returnflag").as("rf_d"))
          .selectExpr(
            s"""stack(3,
               'l_quantity',   n, qty_d,
               'l_discount',   n, disc_d,
               'l_returnflag', n, rf_d)
               AS (col, n_$tag, d_$tag)""")
      prof(li, "a").join(
          prof(li.filter(pmod($"l_orderkey", lit(7)) =!= 0), "b"), Seq("col"))
        .withColumn("dn_pm", expr("abs(n_a - n_b) * 1000 div n_a"))
        .withColumn("dd_pm", expr("abs(d_a - d_b) * 1000 div d_a"))
        .withColumn("drifted", $"dn_pm" > 50 || $"dd_pm" > 50)
        .select($"col", $"n_a", $"n_b", $"dn_pm", $"d_a", $"d_b", $"dd_pm", $"drifted")
        .orderBy($"col")
    },
    // dq5: ROBUST OUTLIER DETECTION — per-group median/MAD price anomaly
    // counts, the distribution-tail audit a pipeline runs before trusting a
    // new load (mean/stddev break under the very outliers they hunt; the
    // median/MAD pair does not). Everything stays integer-exact for the
    // hash gate: prices become cents via round(x·100)→BIGINT (the proven
    // quantizer projection), medians ride DOUBLED (med2 = v_lo + v_hi, so
    // even-count midpoints never leave ℤ), deviations are dev2 = |2·cents −
    // med2|, and mad4 = 2·median(dev2) = 4·MAD; the outlier test
    // 2·dev2 > 5·mad4 is exactly |x − med| > 5·MAD. Both medians use the
    // two-pass bucketed order statistic (see med2 below — q9's histogram
    // shape degenerates on near-unique values); the DuckDB twin's
    // quantile_cont equals (v_lo + v_hi)/2 at p = 0.5 (q9's proof),
    // doubled back to the same integer.
    "dq5_mad_outliers" -> { (s, dir) =>
      import s.implicits._
      // the deviation table is the audit's working set — every later step
      // (MAD median, outlier count) re-reads it, so it stages to scratch
      // parquet once per session (v7's stored-table reasoning) instead of
      // re-running the cents median under each consumer subtree; all
      // columns are integers, so parquet round-trips them exactly
      val devPath = Scratch.staged(s"dq5_dev#$dir", "dq5_dev") { p =>
        val li = Tables(s, dir).lineitem
          .select($"l_returnflag".as("grp"),
            expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"))
        val m = med2(li, "grp", "cents", "med2")
        li.join(broadcast(m), Seq("grp"))
          .withColumn("dev2", abs($"cents" * 2 - $"med2"))
          .write.mode("overwrite").parquet(p)
      }
      val dev = Scratch.parquet(s, devPath)
      val mad = med2(dev.select($"grp", $"dev2"), "grp", "dev2", "mad4")
      dev.join(broadcast(mad), Seq("grp"))
        .groupBy($"grp")
        .agg(count(lit(1)).as("n"), max($"med2").as("med2"),
             max($"mad4").as("mad4"),
             sum(when($"dev2" * 2 > $"mad4" * 5, 1L).otherwise(0L)).as("n_out"))
        .withColumn("out_pm", expr("n_out * 1000 div n"))
        .orderBy($"grp")
    },
    // dq6: FUNCTIONAL-DEPENDENCY AUDIT — validate (or refute) candidate
    // key→attribute dependencies, the schema-inference/constraint-mining
    // profiling step: a FD "k → a" holds iff no key maps to two distinct
    // attribute values. Per FD: distinct keys, violating keys (>1 variant),
    // and the worst key's variant count. Scale shape: one distinct over
    // (k, a) pairs (map-side combined) then a tiny per-key aggregate — the
    // same two-level aggregation for every FD, never a self-join.
    "dq6_fd_audit" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      def fd(name: String, df: DataFrame, k: String, a: String): DataFrame =
        df.select(col(k).cast("string").as("k"), col(a).cast("string").as("a"))
          .distinct()
          .groupBy($"k").agg(count(lit(1)).as("variants"))
          .agg(count(lit(1)).as("n_keys"),
               sum(when($"variants" > 1, 1L).otherwise(0L)).as("n_violating"),
               max($"variants").as("max_variants"))
          .select(lit(name).as("fd"), $"n_keys", $"n_violating",
                  $"max_variants", ($"n_violating" === 0L).as("holds"))
      fd("nation_to_region", t.nation, "n_nationkey", "n_regionkey")
        .unionByName(fd("order_to_priority", t.orders,
          "o_orderkey", "o_orderpriority"))
        .unionByName(fd("user_to_event_type", t.events,
          "user_id", "event_type"))
        .unionByName(fd("part_to_brand", t.part, "p_partkey", "p_brand"))
        .orderBy($"fd")
    },
    // dq7: ORDER-INDEPENDENT TABLE CHECKSUM — the cross-engine/cross-copy
    // reconciliation primitive (exactly what a migration like this repo
    // needs): per-row 32-bit fingerprint from the md5 of a canonical
    // length-prefixed row string (canonExpr — delimiter-shift-proof),
    // SUMMED per table — addition commutes, so any partition
    // order, file layout, or engine produces the same pair (n_rows,
    // checksum), and two copies compare by exchanging 2 numbers, not rows.
    // The hex→int conversion is 8 unrolled instr/substr terms (codegen'd
    // string ops — the x17 lesson: no interpreted per-char lambda folds);
    // 32-bit row values keep the exact sum < 2⁶³ up to ~10¹⁸ rows. Only
    // integer/string columns join the canon string (float formatting is
    // engine-specific; a deployment canonicalizes decimals first).
    "dq7_table_checksum" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      def sums(name: String, df: DataFrame, cols: Seq[String]): DataFrame =
        df.withColumn("m", md5(expr(canonExpr(cols, spark = true))))
          .withColumn("h", expr(hexToLong("m", 8, spark = true)))
          .agg(count(lit(1)).as("n_rows"), sum($"h").as("checksum"))
          .select(lit(name).as("tbl"), $"n_rows", $"checksum")
      sums("customer", t.customer, Seq("c_custkey", "c_mktsegment"))
        .unionByName(sums("lineitem", t.lineitem,
          Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
              "l_returnflag", "l_linestatus")))
        .unionByName(sums("orders", t.orders,
          Seq("o_orderkey", "o_custkey", "o_orderstatus")))
        .orderBy($"tbl")
    },
    // dq14: REPLICA RECONCILIATION — dq7's checksum taken to its
    // production conclusion: two copies of a table (here: a replica with
    // deterministically planted drift — every o_orderkey % 9973 == 7 off
    // by one cent) are reconciled Merkle-style. Level 1 compares 256
    // per-bucket checksum rows (the dq7 md5-prefix sum keyed by
    // o_orderkey % 256) — the only data-scale work, one scan per side
    // reducing to 256 rows. Level 2 drills into ONLY the mismatched
    // buckets (broadcast semi join on bucket id) and row-compares there.
    // At 100 TB with bucket-partitioned replicas, level 2 touches
    // |dirty buckets|/256 of the table — cross-DC repair without a full
    //-table row join. The checksum is TWO independently-summed 32-bit
    // md5 halves (summing a full 64-bit half would overflow signed-64 at
    // realistic bucket sizes): a drifted bucket hides only if BOTH half
    // sums collide, ~2^-64; counts are compared alongside to catch pure
    // row-loss.
    "dq14_replica_reconcile" -> { (s, dir) =>
      import s.implicits._
      // Round-14 (guide §2.3/§2.4): the replica IS base with a per-row
      // cents rule, so one scan carries BOTH sides — per-row digests for
      // base and replica side by side, the level-1 Merkle pass ONE groupBy
      // (was: two scans + two md5 passes + two agg shuffles + a checksum
      // join), and the leaf compare a per-row filter instead of a
      // bucket-pruned self-join (o_orderkey is the generator's primary
      // key, so the old o_orderkey equi-join paired each row with its own
      // replica). Canonical strings embed VALUES, not column names, so
      // every digest — and therefore every checksum sum and the mismatch
      // bucket set — is bit-identical to the two-sided plan's.
      val rows = Tables(s, dir).ordersSpread
        .select($"o_orderkey", $"o_orderstatus",
                expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
        .withColumn("cents_replica",
          when($"o_orderkey" % 9973 === 7, $"cents" + 1).otherwise($"cents"))
        .withColumn("bucket", pmod($"o_orderkey", lit(256)))
      val digests = rows
        .withColumn("ma", md5(expr(canonExpr(
          Seq("o_orderkey", "o_orderstatus", "cents"), spark = true))))
        .withColumn("mb", md5(expr(canonExpr(
          Seq("o_orderkey", "o_orderstatus", "cents_replica"), spark = true))))
      val mismatch = digests.groupBy($"bucket")
        .agg(sum(expr(hexToLong("ma", 8, spark = true))).as("c1_a"),
             sum(expr(hexToLong("substr(ma, 9, 8)", 8, spark = true))).as("c2_a"),
             sum(expr(hexToLong("mb", 8, spark = true))).as("c1_b"),
             sum(expr(hexToLong("substr(mb, 9, 8)", 8, spark = true))).as("c2_b"))
        .filter($"c1_a" =!= $"c1_b" || $"c2_a" =!= $"c2_b")
        .select($"bucket")
      rows.join(broadcast(mismatch), Seq("bucket"), "left_semi")
        .filter($"cents" =!= $"cents_replica")
        .select($"bucket", $"o_orderkey", $"cents".as("cents_base"),
                $"cents_replica")
        .orderBy($"o_orderkey")
    },
    // c9: COMPOSED DATA-QUALITY SUITE — the release-contract run a
    // warehouse executes before publishing a snapshot: the declarative
    // rule audit (dq1), the history-inferred expectation audit (dq13),
    // and the functional-dependency contracts (dq6) evaluated AS SHIPPED
    // (each stage is the standalone entry, verbatim — the c5 composition
    // convention) and folded into one report with a single release
    // verdict row (all stages must pass). Scale: each stage keeps its
    // own audited plan; the fold moves 13 summary rows.
    "c9_quality_suite" -> { (s, dir) =>
      import s.implicits._
      val audit = queries("dq1_quality_audit")(s, dir)
        .select(lit("audit").as("stage"), $"rule".as("item"), $"pass")
      val inferred = queries("dq13_inferred_rules")(s, dir)
        .select(lit("inferred").as("stage"), $"col_name".as("item"), $"pass")
      val fds = queries("dq6_fd_audit")(s, dir)
        .select(lit("fd").as("stage"), $"fd".as("item"), $"holds".as("pass"))
      // persisted: 13 summary rows consumed by BOTH the report and the
      // verdict aggregate — without it the whole dq1+dq13+dq6 subtree
      // executes twice (d16's multi-consumer discipline; round-14)
      val u = audit.unionByName(inferred).unionByName(fds)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val verdict = u.agg(min($"pass".cast("int")).as("mn"))
        .select(lit("verdict").as("stage"), lit("all").as("item"),
                ($"mn" === 1).as("pass"))
      u.unionByName(verdict).orderBy($"stage", $"item")
    },
    // dq15: THREE-REPLICA QUORUM REPAIR — dq14 detects WHERE two copies
    // differ; with three replicas a majority vote decides WHICH copy is
    // wrong and what to write back (the quorum-repair read path). Three
    // replicas carry disjoint planted drifts (pure key functions);
    // level 1 compares the three per-bucket checksum triples (the dq14
    // machinery, one scan per replica → 256 rows each); the row-level
    // vote runs ONLY in buckets where the triple disagrees. Per row the
    // majority value (≥2 of 3 agree — drifts are disjoint by
    // construction, so a majority always exists) is the repair target;
    // the output is the repair PLAN: (key, bad replica, wrong value,
    // majority value). At 100 TB the vote joins are co-partitioned on
    // the key inside dirty buckets only — repair cost tracks drift.
    "dq15_quorum_repair" -> { (s, dir) =>
      import s.implicits._
      // Round-14 (guide §2.3/§2.4, the dq14 restructure applied to the
      // 3-replica vote): every replica derives from base by a per-row
      // cents rule, so ONE scan carries all three sides — the level-1
      // checksum pass is a single groupBy with three sums (was: three
      // scans + three md5 passes + three agg shuffles + a checksum join
      // chain), and the vote is a per-row expression instead of a 3-way
      // o_orderkey self-join (the generator's primary key, so the join
      // paired each row with its own replicas). Canonical strings embed
      // VALUES, not column names — every digest, checksum and majority
      // is bit-identical to the three-sided plan's.
      val rows = Tables(s, dir).ordersSpread
        .select($"o_orderkey",
                expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
        .withColumn("c_a",
          when($"o_orderkey" % 9973 === 7, $"cents" + 1).otherwise($"cents"))
        .withColumn("c_b",
          when($"o_orderkey" % 9973 === 13, $"cents" + 2).otherwise($"cents"))
        .withColumn("c_c",
          when($"o_orderkey" % 9973 === 21, $"cents" + 3).otherwise($"cents"))
        .withColumn("bucket", pmod($"o_orderkey", lit(256)))
      val digests = Seq("a", "b", "c").foldLeft(rows) { (df, side) =>
        df.withColumn(s"m_$side", md5(expr(
          canonExpr(Seq("o_orderkey", s"c_$side"), spark = true))))
      }
      val mism = digests.groupBy($"bucket")
        .agg(sum(expr(hexToLong("m_a", 8, spark = true))).as("chk_a"),
             sum(expr(hexToLong("m_b", 8, spark = true))).as("chk_b"),
             sum(expr(hexToLong("m_c", 8, spark = true))).as("chk_c"))
        .filter($"chk_a" =!= $"chk_b" || $"chk_b" =!= $"chk_c" ||
                $"chk_a" =!= $"chk_c")
        .select($"bucket")
      val wide = rows.join(broadcast(mism), Seq("bucket"), "left_semi")
        .withColumn("majority",
          when($"c_a" === $"c_b", $"c_a")
            .when($"c_a" === $"c_c", $"c_a").otherwise($"c_b"))
      // one unpivot pass instead of a 3-way union of filters — the union
      // form re-executed the whole subtree once per replica; stack() emits
      // the identical (replica, cents) rows from ONE execution, and the
      // final total ORDER BY fixes the same output order
      wide.selectExpr("bucket", "o_orderkey", "majority",
          "stack(3, 'a', c_a, 'b', c_b, 'c', c_c) as (bad_replica, wrong_cents)")
        .filter($"wrong_cents" =!= $"majority")
        .select($"bucket", $"o_orderkey", $"bad_replica",
                $"wrong_cents", $"majority".as("majority_cents"))
        .orderBy($"o_orderkey", $"bad_replica")
    },
    // dq9: UNKNOWN-MEMBER REPAIR — the late-arriving-dimension pattern:
    // when facts reference dim members that don't exist yet (here a dim
    // with deterministic holes: every c_custkey % 7 == 3 dropped), the
    // pipeline must NOT drop or fail those facts; it left-joins and
    // coalesces the missing member into a sentinel UNKNOWN bucket so
    // totals stay complete and the orphan volume is visible per group.
    // dq1's r3 counts FK violations; dq9 is the REPAIR path that keeps
    // the warehouse loadable while the dim catches up. Plan: broadcast
    // left join (dim ≪ facts) + one hash aggregate — one fact scan.
    "dq9_unknown_member" -> { (s, dir) =>
      import s.implicits._
      val t = Tables(s, dir)
      val dim = t.customer.filter($"c_custkey" % 7 =!= 3)
        .select($"c_custkey", $"c_mktsegment")
      t.orders.join(broadcast(dim), $"o_custkey" === $"c_custkey", "left")
        .select(coalesce($"c_mktsegment", lit("UNKNOWN")).as("segment"),
                $"o_totalprice",
                $"c_custkey".isNull.cast("long").as("orphan"))
        .groupBy($"segment")
        .agg(count(lit(1)).as("n_orders"),
             sum($"orphan").as("n_orphaned"),
             Q.asDbl(sum(Q.dec2($"o_totalprice")), 2).as("sum_price"))
        .orderBy($"segment")
    },
    // dq10: ROLLING-WINDOW ANOMALY FLAGS — the freshness/volume monitor a
    // pipeline runs over its own daily intake: 28-day trailing mean/var of
    // daily revenue, flag days beyond 3σ. The z-test stays EXACT by
    // clearing denominators — (n·x − Σx)² > 9·(n·Σx² − (Σx)²) — in
    // DECIMAL(38,0) cents (HUGEINT on the oracle side): no sqrt, no
    // doubles, the flag is bit-identical on both engines. Scale shape: the
    // only data-scale pass is the date-keyed rollup (map-side combined);
    // the window then runs over CALENDAR rows (~365/year whatever the
    // corpus size — metadata-scale, PlanAuditSpec-whitelisted like r9's
    // year-total carry pass).
    // dq12: DISTRIBUTION-DRIFT MONITOR (exact chi-square) — did this
    // month's data shift against last month's baseline? The two
    // event-time halves bin `value` into fixed cents-width buckets and
    // the 2×k contingency table scores per-bin chi-square contributions
    // (a·B − b·A)²/(A·B·(a+b)) — dq10's cleared-denominator discipline:
    // numerator and denominator stay EXACT DECIMAL(38,0)/HUGEINT (at 10×
    // the squared numerator passes 10²², beyond int64), and the reported
    // contribution is the floor parts-per-million — one integer division,
    // bit-identical on both engines, no libm (log/χ²-CDF are NOT
    // engine-portable; a fixed ppm threshold on the statistic is). Scale
    // shape: one map-side-combinable (half, bin) count over the corpus;
    // everything after runs on the k-row contingency table.
    "dq12_drift_chi2" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val d38 = DecimalType(38, 0)
      val binned = Tables(s, dir).events
        .select(
          when(dayofmonth($"ts") <= 15, lit("base")).otherwise(lit("new")).as("half"),
          least(lit(9L), expr("cast(round(value * 100) as bigint) div 5000")).as("bin"))
        .groupBy($"bin")
        .agg(sum(when($"half" === "base", 1L).otherwise(0L)).as("n_base"),
             sum(when($"half" === "new", 1L).otherwise(0L)).as("n_new"))
      val tot = binned.agg(sum($"n_base").as("tot_base"), sum($"n_new").as("tot_new"))
      binned.crossJoin(broadcast(tot))
        .withColumn("num",
          ($"n_base".cast(d38) * $"tot_new".cast(d38) -
            $"n_new".cast(d38) * $"tot_base".cast(d38)))
        .withColumn("num2", ($"num" * $"num").cast(d38))
        .withColumn("den",
          ($"tot_base".cast(d38) * $"tot_new".cast(d38) *
            ($"n_base" + $"n_new").cast(d38)).cast(d38))
        .withColumn("num2m", ($"num2" * lit(1000000L).cast(d38)).cast(d38))
        .select($"bin", $"n_base", $"n_new",
          expr("num2m div den").as("contrib_ppm"))
        .orderBy($"bin")
    },
    // dq11: K-ANONYMITY RELEASE GATE — the governance check a dataset
    // release runs before publishing: group by the quasi-identifier tuple
    // (lang, source, length bucket — attributes that jointly re-identify)
    // and release only combinations with ≥ K members; rarer combinations
    // are reported suppressed. ONE map-side-combinable aggregate over the
    // corpus (the shuffle carries |combinations| rows); the release
    // decision is a per-row flag on that bounded table. At 100 TB the
    // combination table is what it is at any scale — quasi-id cardinality
    // — and the suppressed set is the privacy budget the release report
    // carries.
    "dq11_k_anonymity" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select($"lang", $"source", expr("n_chars div 100").as("len_bucket"))
        .groupBy($"lang", $"source", $"len_bucket")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("released", $"n_docs" >= KAnon)
        .orderBy($"lang", $"source", $"len_bucket")
    },
    // dq18: BENFORD FIRST-DIGIT AUDIT — the classic fabricated-numbers
    // screen: naturally-occurring amounts follow P(d) = log10(1+1/d);
    // ledgers that were invented, capped, or unit-converted don't. The
    // expected shares are FIXED integer-ppm constants (the published
    // Benford table — no log evaluation at query time, so both engines
    // carry identical integers); the observed first digit comes from the
    // decimal string of the cents value (engine-identical for positive
    // BIGINTs). Output: per digit 1-9, observed count/ppm, expected ppm,
    // absolute deviation ppm. ONE map-side-combined 9-group aggregate;
    // the deviation arithmetic runs on the 9-row frame. A real audit
    // thresholds the max deviation; the full profile is what the
    // investigator reads.
    "dq18_benford_audit" -> { (s, dir) =>
      import s.implicits._
      val benford = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
                        66947L, 57992L, 51153L, 45757L)
      val expCase = "CASE digit " + benford.zipWithIndex.map {
        case (p, i) => s"WHEN ${i + 1} THEN ${p}L"
      }.mkString(" ") + " END"
      val obs = Tables(s, dir).orders
        .select(expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
        .filter($"cents" > 0)
        .select(expr("cast(substring(cast(cents as string), 1, 1) as bigint)")
          .as("digit"))
        .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
      val tot = obs.agg(sum($"n_obs").as("n_total"))
      obs.crossJoin(broadcast(tot))
        .withColumn("obs_ppm", expr("n_obs * 1000000 div n_total"))
        .withColumn("exp_ppm", expr(expCase))
        .withColumn("abs_dev_ppm", abs($"obs_ppm" - $"exp_ppm"))
        .select($"digit", $"n_obs", $"obs_ppm", $"exp_ppm", $"abs_dev_ppm")
        .orderBy($"digit")
    },
    // dq17: L-DIVERSITY AUDIT — k-anonymity's (dq11) known failure mode:
    // a quasi-identifier group can be large (k-anonymous) yet carry ONE
    // sensitive value, so membership still discloses it (the homogeneity
    // attack). Per quasi-id group (priority × order month) count the
    // DISTINCT sensitive values (order status); the group releases only
    // with ≥2. Shape follows dq2's two-level-aggregate convention: a
    // groupBy on (group, status) collapses map-side to the bounded cell
    // table (never an Expand over the fact scan), then a second tiny
    // aggregate per group. At 100 TB the shuffle carries |cells| rows —
    // quasi-id × status cardinality, scale-free.
    "dq17_l_diversity" -> { (s, dir) =>
      import s.implicits._
      val cells = Tables(s, dir).orders
        .select($"o_orderpriority",
                expr("cast(year(o_orderdate) * 100 + month(o_orderdate) as bigint)").as("ym"),
                $"o_orderstatus")
        .groupBy($"o_orderpriority", $"ym", $"o_orderstatus")
        .agg(count(lit(1)).as("n"))
      cells.groupBy($"o_orderpriority", $"ym")
        .agg(sum($"n").as("n_rows"), count(lit(1)).as("n_status"))
        .withColumn("l_ok", $"n_status" >= 2)
        .orderBy($"o_orderpriority", $"ym")
    },
    "dq10_rolling_anomaly" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val d38 = DecimalType(38, 0)
      val daily = Tables(s, dir).orders
        .groupBy($"o_orderdate")
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
      val w = Window.orderBy($"o_orderdate").rowsBetween(-27, 0)
      daily
        .select($"o_orderdate", $"cents",
          count(lit(1)).over(w).as("n"),
          sum($"cents".cast(d38)).over(w).as("s"),
          sum(($"cents".cast(d38) * $"cents".cast(d38)).cast(d38)).over(w).as("sq"))
        .filter($"n" === 28)
        .withColumn("dev", ($"n".cast(d38) * $"cents".cast(d38) - $"s").cast(d38))
        .withColumn("is_anomaly", $"dev" * $"dev" >
          lit(9).cast(d38) * ($"n".cast(d38) * $"sq" - $"s" * $"s"))
        .select($"o_orderdate", $"cents", $"is_anomaly")
        .orderBy($"o_orderdate")
    },
    "dq2_table_profile" -> { (s, dir) =>
      import s.implicits._
      val li = Tables(s, dir).lineitem
      // One two-level aggregate PER COLUMN instead of one multi-distinct
      // aggregate: three countDistincts in a single agg plan as an Expand
      // (every scan row enters the aggregate 4x — measured 3.7s, the
      // dominant dq cost). groupBy(value).count collapses to the distinct
      // values map-side (shuffle carries |distinct| rows, not |table|),
      // and the second level reads n / nulls / distinct / min / max off
      // that tiny intermediate. Results are bit-identical to the
      // multi-distinct plan; at 100 TB this is also the right shape — no
      // Expand, and each shuffle is bounded by column cardinality.
      def prof(name: String, v: org.apache.spark.sql.Column,
               toStr: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        li.groupBy(v.as("v")).agg(count(lit(1)).as("cnt"))
          .agg(
            sum($"cnt").as("n"),
            coalesce(sum(when($"v".isNull, $"cnt")), lit(0L)).as("n_null"),
            count($"v").as("n_distinct"),
            toStr(min($"v")).as("min_s"), toStr(max($"v")).as("max_s"))
          .select(lit(name).as("col"), $"n", $"n_null", $"n_distinct",
                  $"min_s", $"max_s")
      val asDec = (c: org.apache.spark.sql.Column) =>
        c.cast("decimal(18,2)").cast("string")
      prof("l_quantity", $"l_quantity", asDec)
        .unionByName(prof("l_discount", $"l_discount", asDec))
        .unionByName(prof("l_returnflag", $"l_returnflag", identity))
        .orderBy($"col")
    },
    // dq8: exact Pearson correlation matrix over the numeric lineitem
    // columns — the multivariate profile a feature store or drift monitor
    // keeps next to dq2's univariate one. NOT corr(): both engines'
    // one-pass co-moment aggregates are float-order-sensitive, so the
    // moments come from EXACT integer sums instead (quantity is integral,
    // price/discount are 2-dp decimals -> cents; products fit bigint, sums
    // go through DECIMAL(38,0)), and the closed form
    // (n·Sxy − Sx·Sy)/(√(n·Sxx−Sx²)·√(n·Syy−Sy²)) runs on doubles cast
    // from those exact sums in identical op order on both engines — the
    // repo-wide exact-sums-then-one-IEEE-expression discipline (Tx
    // scaladoc). Scale shape: ONE scan, ten plain mergeable aggregates, a
    // single 1-row reduce; the 3-pair stack is a projection. 100 TB adds
    // columns, not passes — p columns need p(p+1)/2 product sums, still
    // one scan.
    "dq8_corr_matrix" -> { (s, dir) =>
      import s.implicits._
      val li = Tables(s, dir).lineitem
      val b = li.select(
        $"l_quantity".cast("bigint").as("q"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("p"),
        expr("cast(round(l_discount * 100) as bigint)").as("d"))
      def s38(c: org.apache.spark.sql.Column) =
        sum(c.cast("decimal(38,0)")).cast("double")
      val a = b.agg(
        count(lit(1)).cast("double").as("n"),
        s38($"q").as("sq"), s38($"p").as("sp"), s38($"d").as("sd"),
        s38($"q" * $"q").as("sqq"), s38($"p" * $"p").as("spp"),
        s38($"d" * $"d").as("sdd"),
        s38($"q" * $"p").as("sqp"), s38($"q" * $"d").as("sqd"),
        s38($"p" * $"d").as("spd"))
      def corrE(sx: String, sy: String, sxx: String, syy: String,
                sxy: String): String =
        s"((n * $sxy - $sx * $sy) / " +
          s"(sqrt(n * $sxx - $sx * $sx) * sqrt(n * $syy - $sy * $sy)))"
      a.selectExpr(
          s"""stack(3,
             'l_quantity', 'l_extendedprice',
               ${corrE("sq", "sp", "sqq", "spp", "sqp")},
             'l_quantity', 'l_discount',
               ${corrE("sq", "sd", "sqq", "sdd", "sqd")},
             'l_extendedprice', 'l_discount',
               ${corrE("sp", "sd", "spp", "sdd", "spd")})
             AS (x_col, y_col, corr_v)""")
        .orderBy($"x_col", $"y_col")
    }
  )

  /** Exact per-group DOUBLED median (v_lo + v_hi) of integer column `vcol`
    * — the two middle order statistics through ScaleOps.orderStats (see its
    * scaladoc for why the two-pass bucketed shape, not a value histogram),
    * summed so even-count midpoints never leave ℤ. */
  private def med2(df: DataFrame, gcol: String, vcol: String,
                   out: String): DataFrame = {
    import df.sparkSession.implicits._
    ScaleOps.orderStats(df, gcol, vcol,
        Seq("lo" -> "(n - 1) div 2", "hi" -> "n div 2"))
      .groupBy(col(gcol)).agg(sum($"value").as(out))
  }

  /** dq7's hex→int: value of the first `n` hex chars of column `col`, as
    * `n` unrolled positional-digit terms — identical arithmetic on both
    * engines (Spark `instr` / DuckDB `strpos`, both 1-based). */
  /** dq7/e19's canonical row string: every field LENGTH-PREFIXED
    * ("3:abc|2:xy") so values shifting across the '|' delimiter can never
    * canonicalize to the same string — ('A|B','C') and ('A','B|C') differ.
    * Identical text on both engines (integers render identically). */
  private[catalog] def canonExpr(cols: Seq[String], spark: Boolean): String =
    if (spark)
      "concat_ws('|', " + cols.map(c =>
        s"concat(cast(length(cast($c as string)) as string), ':', cast($c as string))")
        .mkString(", ") + ")"
    else
      cols.map(c => s"length($c::VARCHAR)::VARCHAR || ':' || $c::VARCHAR")
        .mkString(" || '|' || ")

  private[catalog] def hexToLong(col: String, n: Int, spark: Boolean): String = {
    val pos = if (spark) "instr" else "strpos"
    (1 to n).map { j =>
      s"($pos('0123456789abcdef', substr($col, $j, 1)) - 1) * " +
        s"cast(${1L << (4 * (n - j))} as bigint)"
    }.mkString("(", " + ", ")")
  }

  /** dq6 oracle: one two-level aggregation per declared FD. */
  private def fdSql(name: String, table: String, k: String, a: String): String =
    s"""SELECT '$name' AS fd, COUNT(*) AS n_keys,
             SUM(CASE WHEN variants > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating,
             MAX(variants) AS max_variants,
             SUM(CASE WHEN variants > 1 THEN 1 ELSE 0 END) = 0 AS holds
      FROM (SELECT k, COUNT(*)::BIGINT AS variants
            FROM (SELECT DISTINCT $k::VARCHAR AS k, $a::VARCHAR AS a FROM $table) t
            GROUP BY k) g"""

  /** dq7 oracle: one checksum aggregate per table over the same canon. */
  private def cksumSql(name: String, table: String, cols: Seq[String]): String =
    s"""SELECT '$name' AS tbl, COUNT(*) AS n_rows, SUM(h)::BIGINT AS checksum
      FROM (SELECT ${hexToLong("m", 8, spark = false)} AS h
            FROM (SELECT md5(${canonExpr(cols, spark = false)}) AS m
                  FROM $table) t0) t1"""

  // extracted so c9 can compose the exact same SQL the standalone
  // entries run (a map literal cannot reference itself)
  private lazy val dq1Sql: String = """
      WITH li AS (
        SELECT COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END)::BIGINT AS v_qty,
               SUM(CASE WHEN l_discount NOT BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END)::BIGINT AS v_disc
        FROM lineitem),
      fk AS (
        SELECT (SELECT COUNT(*) FROM orders)::BIGINT AS n,
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))::BIGINT AS v),
      nn AS (
        SELECT COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)::BIGINT AS v
        FROM customer),
      so AS (
        SELECT COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END)::BIGINT AS v
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      SELECT rule, n_checked, n_violations, n_violations = 0 AS pass FROM (
        SELECT 'r1_quantity_range' AS rule, n AS n_checked, v_qty AS n_violations FROM li
        UNION ALL SELECT 'r2_discount_range', n, v_disc FROM li
        UNION ALL SELECT 'r3_orders_custkey_fk', n, v FROM fk
        UNION ALL SELECT 'r4_acctbal_not_null', n, v FROM nn
        UNION ALL SELECT 'r5_ship_after_order', n, v FROM so) u
      ORDER BY rule"""

  private lazy val dq6Sql: String = s"""
      ${fdSql("nation_to_region", "nation", "n_nationkey", "n_regionkey")}
      UNION ALL ${fdSql("order_to_priority", "orders", "o_orderkey", "o_orderpriority")}
      UNION ALL ${fdSql("user_to_event_type", "events", "user_id", "event_type")}
      UNION ALL ${fdSql("part_to_brand", "part", "p_partkey", "p_brand")}
      ORDER BY fd"""

  private lazy val dq13Sql: String = s"""
      WITH b AS (
        SELECT ${Dq13Cols.map(c =>
          s"min($c)::DOUBLE AS lo_$c, max($c)::DOUBLE AS hi_$c, " +
          s"SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS nn_$c")
          .mkString(", ")}
        FROM lineitem WHERE l_orderkey % 10 <> 0),
      a AS (
        SELECT COUNT(*)::BIGINT AS n,
               ${Dq13Cols.map(c =>
          s"SUM(CASE WHEN t.$c < b.lo_$c THEN 1 ELSE 0 END)::BIGINT AS bl_$c, " +
          s"SUM(CASE WHEN t.$c > b.hi_$c THEN 1 ELSE 0 END)::BIGINT AS ab_$c, " +
          s"SUM(CASE WHEN t.$c IS NULL THEN 1 ELSE 0 END)::BIGINT AS nu_$c")
          .mkString(", ")}
        FROM (SELECT * FROM lineitem WHERE l_orderkey % 10 = 0) t, b)
      SELECT col_name, lo, hi, n_checked, n_below, n_above, n_new_nulls,
             n_below + n_above + n_new_nulls = 0 AS pass
      FROM (${Dq13Cols.map(c =>
          s"SELECT '$c' AS col_name, b.lo_$c AS lo, b.hi_$c AS hi, " +
          s"a.n AS n_checked, a.bl_$c AS n_below, a.ab_$c AS n_above, " +
          s"CASE WHEN b.nn_$c = 0 THEN a.nu_$c ELSE 0 END AS n_new_nulls " +
          "FROM a, b").mkString(" UNION ALL ")}) u
      ORDER BY col_name"""

  private lazy val dq16Sql: String = """
      WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events),
      now_t AS (SELECT MAX(us) AS now_us FROM ev),
      per AS (
        SELECT event_type, COUNT(*)::BIGINT AS n_events,
               MAX(us) AS last_us, MIN(us) AS first_us,
               (SELECT now_us FROM now_t) AS now_us,
               SUM(CASE WHEN us >= (SELECT now_us FROM now_t)
                                   - 86400000000 THEN 1 ELSE 0 END)::BIGINT
                 AS last_day_n
        FROM ev GROUP BY event_type)
      SELECT event_type, n_events,
             (now_us - last_us)::BIGINT AS lag_us,
             (CASE WHEN now_us - last_us <= 21600000000
                   THEN 1 ELSE 0 END)::BIGINT AS sla_ok,
             last_day_n,
             (n_events * 86400000000
                // GREATEST(now_us - first_us, 1))::BIGINT AS daily_avg,
             (last_day_n * 10000
                // GREATEST(n_events * 86400000000
                             // GREATEST(now_us - first_us, 1), 1))::BIGINT
               AS rate_ratio_bp
      FROM per ORDER BY event_type"""

  private lazy val dq12Sql: String = """
      WITH binned AS (
        SELECT LEAST(9, CAST(round(value * 100) AS BIGINT) // 5000) AS bin,
               SUM(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END)::HUGEINT AS n_base,
               SUM(CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END)::HUGEINT AS n_new
        FROM events GROUP BY bin),
      tot AS (
        SELECT SUM(n_base)::HUGEINT AS tot_base, SUM(n_new)::HUGEINT AS tot_new
        FROM binned)
      SELECT bin, n_base::BIGINT AS n_base, n_new::BIGINT AS n_new,
             (((n_base * tot_new - n_new * tot_base) *
               (n_base * tot_new - n_new * tot_base) * 1000000::HUGEINT)
              // (tot_base * tot_new * (n_base + n_new)))::BIGINT AS contrib_ppm
      FROM binned, tot ORDER BY bin"""

  private lazy val dq10Sql: String = """
      WITH daily AS (
        SELECT o_orderdate,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
        FROM orders GROUP BY 1),
      w AS (
        SELECT o_orderdate, cents,
               COUNT(*) OVER win AS n,
               SUM(cents::HUGEINT) OVER win AS s,
               SUM(cents::HUGEINT * cents::HUGEINT) OVER win AS sq
        FROM daily
        WINDOW win AS (ORDER BY o_orderdate
                       ROWS BETWEEN 27 PRECEDING AND CURRENT ROW))
      SELECT o_orderdate, cents,
             (n::HUGEINT * cents - s) * (n::HUGEINT * cents - s)
               > 9 * (n::HUGEINT * sq - s * s) AS is_anomaly
      FROM w WHERE n = 28 ORDER BY o_orderdate"""

  val oracle: Map[String, String] = Map(
    // c18: the staged manifest replayed (on-time daily counts + the
    // version rule) full-joined with the late feed's day counts
    "c18_backfill_plan" -> """
      WITH ontime AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*)::BIGINT AS n_rows
        FROM events WHERE event_id % 997 <> 0 GROUP BY 1),
      m AS (
        SELECT day,
               CASE WHEN date_part('day', CAST(day AS DATE)) % 3 = 0
                    THEN 2 ELSE 1 END AS version, n_rows
        FROM ontime),
      lt AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*)::BIGINT AS n_late
        FROM events WHERE event_id % 997 = 0 GROUP BY 1)
      SELECT COALESCE(m.day, lt.day) AS day,
             CASE WHEN COALESCE(m.version, 0) < 2 AND lt.day IS NOT NULL
                    THEN 'both'
                  WHEN COALESCE(m.version, 0) < 2 THEN 'stale'
                  ELSE 'late' END AS reason,
             COALESCE(m.n_rows, 0)::BIGINT AS store_rows,
             COALESCE(lt.n_late, 0)::BIGINT AS late_rows
      FROM m FULL JOIN lt ON m.day = lt.day
      WHERE COALESCE(m.version, 0) < 2 OR lt.day IS NOT NULL
      ORDER BY day""",
    // dq20: the suite's rules replayed as one aggregate + literal unpivot
    // dq21: every persisted counter recomputed from raw orders — skip
    // rule (status F), lookup success (O), lookup error (P, no _default)
    "dq21_run_history" -> """
      SELECT 'run_' || CAST((o_orderkey % 3) + 1 AS VARCHAR) AS run_id,
             'runs_m' AS mapping_id,
             (count(*) FILTER (WHERE o_orderstatus = 'O'))::BIGINT AS n_success,
             (count(*) FILTER (WHERE o_orderstatus = 'F'))::BIGINT AS n_skipped,
             (count(*) FILTER (WHERE o_orderstatus = 'P'))::BIGINT AS n_errors,
             TRUE AS written
      FROM orders GROUP BY 1, 2 ORDER BY 1""",
    "dq20_expectation_suite" -> """
      WITH a AS (SELECT
        count(*) FILTER (WHERE l_shipdate IS NULL) AS v0,
        count(*) FILTER (WHERE l_quantity IS NOT NULL
          AND (l_quantity < 1 OR l_quantity > 50)) AS v1,
        count(*) FILTER (WHERE l_discount IS NOT NULL
          AND (l_discount < 0 OR l_discount > 0.05)) AS v2,
        count(*) FILTER (WHERE l_returnflag IS NOT NULL
          AND l_returnflag NOT IN ('A','N','R')) AS v3,
        count(*) FILTER (WHERE l_linestatus IS NOT NULL
          AND l_linestatus NOT IN ('F')) AS v4,
        count(*) FILTER (WHERE l_returnflag IS NOT NULL
          AND NOT regexp_matches(l_returnflag, '^[AN]$')) AS v5,
        count(l_orderkey) - count(DISTINCT l_orderkey) AS v6
        FROM lineitem)
      SELECT * FROM (
        SELECT 'not_null' AS check_name, 'l_shipdate' AS col_name,
               v0 AS n_violations, v0 = 0 AS pass FROM a
        UNION ALL SELECT 'range', 'l_quantity', v1, v1 = 0 FROM a
        UNION ALL SELECT 'range', 'l_discount', v2, v2 = 0 FROM a
        UNION ALL SELECT 'accepted_values', 'l_returnflag', v3, v3 = 0 FROM a
        UNION ALL SELECT 'accepted_values', 'l_linestatus', v4, v4 = 0 FROM a
        UNION ALL SELECT 'regex_match', 'l_returnflag', v5, v5 = 0 FROM a
        UNION ALL SELECT 'unique', 'l_orderkey', v6, v6 = 0 FROM a) t
      ORDER BY col_name, check_name""",
    // c9: the three stage SQLs verbatim (the extracted vals), one verdict
    // c13: the three monitor oracles unioned as shipped; one bool_and
    "c13_ops_health" -> s"""
      WITH u AS (
        SELECT 'freshness' AS stage, event_type AS item,
               (sla_ok = 1) AS pass FROM ($dq16Sql) f
        UNION ALL
        SELECT 'drift', CAST(bin AS VARCHAR), contrib_ppm <= 500000
        FROM ($dq12Sql) d
        UNION ALL
        SELECT 'anomaly', strftime(o_orderdate, '%Y-%m-%d'), NOT is_anomaly
        FROM ($dq10Sql) a)
      SELECT * FROM (
        SELECT stage, item, pass FROM u
        UNION ALL
        SELECT 'verdict', 'all', (SELECT bool_and(pass) FROM u)) t
      ORDER BY stage, item""",
    "c9_quality_suite" -> s"""
      WITH u AS (
        SELECT 'audit' AS stage, rule AS item, pass FROM ($dq1Sql) a
        UNION ALL
        SELECT 'inferred', col_name, pass FROM ($dq13Sql) i
        UNION ALL
        SELECT 'fd', fd, holds FROM ($dq6Sql) f)
      SELECT * FROM (
        SELECT stage, item, pass FROM u
        UNION ALL
        SELECT 'verdict', 'all', (SELECT bool_and(pass) FROM u)) t
      ORDER BY stage, item""",
    // dq15: ground truth = the union of the three disjoint planted
    // drifts; the engine must localize each to its replica via the vote
    "dq15_quorum_repair" -> """
      SELECT o_orderkey % 256 AS bucket, o_orderkey, bad_replica,
             CAST(round(o_totalprice * 100) AS BIGINT) + plus AS wrong_cents,
             CAST(round(o_totalprice * 100) AS BIGINT) AS majority_cents
      FROM orders
      JOIN (VALUES ('a', 1, 7), ('b', 2, 13), ('c', 3, 21))
           d(bad_replica, plus, rem)
        ON o_orderkey % 9973 = rem
      ORDER BY o_orderkey, bad_replica""",
    // dq14: the oracle states the GROUND TRUTH of the planted drift; the
    // engine must rediscover exactly it through the two checksum levels
    // (a missed bucket, a false positive, or a collision-masked row all
    // hash-mismatch)
    "dq14_replica_reconcile" -> """
      SELECT o_orderkey % 256 AS bucket, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents_base,
             CAST(round(o_totalprice * 100) AS BIGINT) + 1 AS cents_replica
      FROM orders WHERE o_orderkey % 9973 = 7
      ORDER BY o_orderkey""",
    "dq7_table_checksum" -> s"""
      ${cksumSql("customer", "customer", Seq("c_custkey", "c_mktsegment"))}
      UNION ALL ${cksumSql("lineitem", "lineitem",
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_returnflag", "l_linestatus"))}
      UNION ALL ${cksumSql("orders", "orders",
        Seq("o_orderkey", "o_custkey", "o_orderstatus"))}
      ORDER BY tbl""",
    "dq6_fd_audit" -> dq6Sql,
    "dq5_mad_outliers" -> """
      WITH li AS (
        SELECT l_returnflag AS grp,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem),
      m AS (SELECT grp, CAST(2 * quantile_cont(cents, 0.5) AS BIGINT) AS med2
            FROM li GROUP BY grp),
      dev AS (SELECT li.grp, cents, med2, abs(cents * 2 - med2) AS dev2
              FROM li JOIN m USING (grp)),
      mad AS (SELECT grp, CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
              FROM dev GROUP BY grp)
      SELECT grp, COUNT(*) AS n, MAX(med2) AS med2, MAX(mad4) AS mad4,
             SUM(CASE WHEN dev2 * 2 > mad4 * 5 THEN 1 ELSE 0 END)::BIGINT AS n_out,
             (SUM(CASE WHEN dev2 * 2 > mad4 * 5 THEN 1 ELSE 0 END) * 1000
               // COUNT(*))::BIGINT AS out_pm
      FROM dev JOIN mad USING (grp)
      GROUP BY grp ORDER BY grp""",
    // dq16: now = max(ts) corpus-wide; integer-micros lag and rate math
    "dq16_freshness_sla" -> dq16Sql,
    "dq13_inferred_rules" -> dq13Sql,
    "dq1_quality_audit" -> dq1Sql,
    "dq4_profile_drift" -> """
      WITH pa AS (
        SELECT col, n_a, d_a FROM (
          SELECT 'l_quantity' AS col, COUNT(*)::BIGINT AS n_a,
                 COUNT(DISTINCT l_quantity)::BIGINT AS d_a FROM lineitem
          UNION ALL
          SELECT 'l_discount', COUNT(*)::BIGINT,
                 COUNT(DISTINCT l_discount)::BIGINT FROM lineitem
          UNION ALL
          SELECT 'l_returnflag', COUNT(*)::BIGINT,
                 COUNT(DISTINCT l_returnflag)::BIGINT FROM lineitem) u),
      pb AS (
        SELECT col, n_b, d_b FROM (
          SELECT 'l_quantity' AS col, COUNT(*)::BIGINT AS n_b,
                 COUNT(DISTINCT l_quantity)::BIGINT AS d_b
          FROM lineitem WHERE l_orderkey % 7 <> 0
          UNION ALL
          SELECT 'l_discount', COUNT(*)::BIGINT, COUNT(DISTINCT l_discount)::BIGINT
          FROM lineitem WHERE l_orderkey % 7 <> 0
          UNION ALL
          SELECT 'l_returnflag', COUNT(*)::BIGINT, COUNT(DISTINCT l_returnflag)::BIGINT
          FROM lineitem WHERE l_orderkey % 7 <> 0) u)
      SELECT col, n_a, n_b,
             (abs(n_a - n_b) * 1000 // n_a)::BIGINT AS dn_pm,
             d_a, d_b,
             (abs(d_a - d_b) * 1000 // d_a)::BIGINT AS dd_pm,
             ((abs(n_a - n_b) * 1000 // n_a) > 50
              OR (abs(d_a - d_b) * 1000 // d_a) > 50) AS drifted
      FROM pa JOIN pb USING (col)
      ORDER BY col""",
    "dq3_profile_approx" -> """
      SELECT col, n, n_null, n_distinct, TRUE AS within_5pct FROM (
        SELECT 'l_orderkey' AS col, COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
               COUNT(DISTINCT l_orderkey)::BIGINT AS n_distinct
        FROM lineitem
        UNION ALL
        SELECT 'l_partkey', COUNT(*)::BIGINT,
               SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
               COUNT(DISTINCT l_partkey)::BIGINT
        FROM lineitem
        UNION ALL
        SELECT 'l_suppkey', COUNT(*)::BIGINT,
               SUM(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
               COUNT(DISTINCT l_suppkey)::BIGINT
        FROM lineitem) u
      ORDER BY col""",
    // dq12: HUGEINT keeps every product exact; // is floor division on
    // non-negative operands — same ppm integers as Spark's DECIMAL(38,0)
    // `div` path
    "dq12_drift_chi2" -> dq12Sql,
    "dq11_k_anonymity" -> s"""
      SELECT lang, source, n_chars // 100 AS len_bucket,
             COUNT(*)::BIGINT AS n_docs,
             COUNT(*) >= $KAnon AS released
      FROM documents
      GROUP BY lang, source, len_bucket
      ORDER BY lang, source, len_bucket""",
    "dq18_benford_audit" -> """
      WITH obs AS (
        SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               COUNT(*)::BIGINT AS n_obs
        FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders) t
        WHERE cents > 0 GROUP BY 1),
      tot AS (SELECT SUM(n_obs)::BIGINT AS n_total FROM obs),
      e AS (
        SELECT digit, n_obs, (n_obs * 1000000) // n_total AS obs_ppm,
               CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
                 WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
                 WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
                 WHEN 9 THEN 45757 END AS exp_ppm
        FROM obs CROSS JOIN tot)
      SELECT digit, n_obs, obs_ppm::BIGINT AS obs_ppm,
             exp_ppm::BIGINT AS exp_ppm,
             abs(obs_ppm - exp_ppm)::BIGINT AS abs_dev_ppm
      FROM e ORDER BY digit""",
    "dq17_l_diversity" -> """
      WITH cells AS (
        SELECT o_orderpriority,
               year(o_orderdate) * 100 + month(o_orderdate) AS ym,
               o_orderstatus, COUNT(*)::BIGINT AS n
        FROM orders GROUP BY 1, 2, 3)
      SELECT o_orderpriority, ym, SUM(n)::BIGINT AS n_rows,
             COUNT(*)::BIGINT AS n_status,
             COUNT(*) >= 2 AS l_ok
      FROM cells GROUP BY 1, 2 ORDER BY 1, 2""",
    "dq10_rolling_anomaly" -> dq10Sql,
    "dq9_unknown_member" -> """
      SELECT COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
             COUNT(*) AS n_orders,
             SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_orphaned,
             CAST(CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS DOUBLE) AS sum_price
      FROM orders o
      LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer
                 WHERE c_custkey % 7 <> 3) c
        ON o.o_custkey = c.c_custkey
      GROUP BY 1 ORDER BY 1""",
    "dq2_table_profile" -> """
      SELECT col, n, n_null, n_distinct, min_s, max_s FROM (
        SELECT 'l_quantity' AS col, COUNT(*)::BIGINT AS n,
               SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
               COUNT(DISTINCT l_quantity)::BIGINT AS n_distinct,
               MIN(CAST(l_quantity AS DECIMAL(18,2)))::VARCHAR AS min_s,
               MAX(CAST(l_quantity AS DECIMAL(18,2)))::VARCHAR AS max_s
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', COUNT(*)::BIGINT,
               SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)::BIGINT,
               COUNT(DISTINCT l_discount)::BIGINT,
               MIN(CAST(l_discount AS DECIMAL(18,2)))::VARCHAR,
               MAX(CAST(l_discount AS DECIMAL(18,2)))::VARCHAR
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', COUNT(*)::BIGINT,
               SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)::BIGINT,
               COUNT(DISTINCT l_returnflag)::BIGINT,
               MIN(l_returnflag), MAX(l_returnflag)
        FROM lineitem) u
      ORDER BY col""",
    "dq8_corr_matrix" -> """
      WITH b AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS d
        FROM lineitem),
      a AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(q) AS DOUBLE) AS sq, CAST(SUM(p) AS DOUBLE) AS sp,
               CAST(SUM(d) AS DOUBLE) AS sd,
               CAST(SUM(q*q) AS DOUBLE) AS sqq, CAST(SUM(p*p) AS DOUBLE) AS spp,
               CAST(SUM(d*d) AS DOUBLE) AS sdd,
               CAST(SUM(q*p) AS DOUBLE) AS sqp, CAST(SUM(q*d) AS DOUBLE) AS sqd,
               CAST(SUM(p*d) AS DOUBLE) AS spd
        FROM b)
      SELECT x_col, y_col, corr_v FROM (
        SELECT 'l_quantity' AS x_col, 'l_extendedprice' AS y_col,
               ((n * sqp - sq * sp) /
                (SQRT(n * sqq - sq * sq) * SQRT(n * spp - sp * sp))) AS corr_v
        FROM a
        UNION ALL
        SELECT 'l_quantity', 'l_discount',
               ((n * sqd - sq * sd) /
                (SQRT(n * sqq - sq * sq) * SQRT(n * sdd - sd * sd)))
        FROM a
        UNION ALL
        SELECT 'l_extendedprice', 'l_discount',
               ((n * spd - sp * sd) /
                (SQRT(n * spp - sp * sp) * SQRT(n * sdd - sd * sd)))
        FROM a) u
      ORDER BY x_col, y_col"""
  )
}

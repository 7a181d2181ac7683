package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Scratch, Tables}

/** Reference-core primitive semantics (SURVEY.md §2.A) pinned as oracle
  * queries over the driver's testdata tables.
  *
  * The reference's filter rules are SKIP rules: a row matching any rule is
  * dropped (OR'd, first match wins — dynamic.py:57-82 in the reference). So
  * each fN_* query keeps `NOT (predicate)`. The tN_* queries pin each
  * transform type's value semantics (dynamic.py:84-195) on real columns.
  * These queries pin semantics; the actual spec-driven engine that compiles
  * mapping JSON to a single filter+select plan lives in graft.compile /
  * graft.engine and is unit/golden-tested.
  */
object Semantics extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 equals: skip if field == value
    "f1_equals_skip" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .filter(!($"lang" === "en"))
        .select($"doc_id", $"lang", $"source")
        .orderBy($"doc_id")
    },
    // F2 not_equals: skip if field != value  → keeps only field == value
    "f2_not_equals_skip" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .filter(!($"lang" =!= "en"))
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    },
    // F3 in: skip if field ∈ values
    "f3_in_skip" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .filter(!$"lang".isin("de", "fr"))
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    },
    // F4 not_in: LITERAL polarity (quirk Q1) — skip if field ∉ values,
    // i.e. keep only rows whose value IS in the list.
    "f4_not_in_skip" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .filter($"lang".isin("en", "es"))
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    },
    // F5 is_empty: skip if falsy ("" or NULL)
    "f5_is_empty_skip" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .filter(!($"text".isNull || $"text" === ""))
        .select($"doc_id", $"n_chars")
        .orderBy($"doc_id")
    },
    // F6 is_not_empty: skip if truthy (non-NULL, non-"") → keeps only falsy
    // rows. documents has no empty cells, so the fixture column plants both
    // falsy shapes ('' and NULL) on disjoint doc_id residues.
    "f6_is_not_empty_skip" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .withColumn("maybe",
          when(pmod($"doc_id", lit(7)) === 0, lit(""))
            .when(pmod($"doc_id", lit(11)) === 0, lit(null).cast("string"))
            .otherwise($"source"))
        .filter(!($"maybe".isNotNull && $"maybe" =!= ""))
        .select($"doc_id", $"maybe")
        .orderBy($"doc_id")
    },
    // F7 contains: skip if value != "" && value ∈ str(field)
    "f7_contains_skip" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .filter(!$"text".contains("spark"))
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    },
    // Rules are OR'd: skip if (lang == 'zh') OR (source == 'src1')
    "f8_rules_ored" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .filter(!(($"lang" === "zh") || ($"source" === "src1")))
        .select($"doc_id", $"lang", $"source")
        .orderBy($"doc_id")
    },

    // T1 direct + T2 constant: projection with copied and literal columns
    "t1_direct_constant" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).documents
        .select($"doc_id", $"lang".as("language"), lit("graft").as("engine"),
                lit(1L).as("version"))
        .orderBy($"doc_id")
    },
    // T3 date_format: reparse/reformat a datetime to a new pattern
    "t3_date_format" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).orders
        .select($"o_orderkey",
                date_format($"o_orderdate", "yyyy-MM-dd").as("d_iso"),
                date_format($"o_orderdate", "dd/MM/yyyy").as("d_eu"))
        .orderBy($"o_orderkey")
        .limit(500)
    },
    // T4 lookup with _default fallback
    "t4_lookup" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).region
        .select($"r_regionkey", $"r_name",
                when($"r_name" === "ASIA", "AS")
                  .when($"r_name" === "EUROPE", "EU")
                  .when($"r_name" === "AMERICA", "AM")
                  .otherwise("OTHER").as("code"))
        .orderBy($"r_regionkey")
    },
    // T5 suffix + T6 prefix (empty source → null in the engine; here the
    // column is never empty so the pure concat semantics are pinned)
    "t5_t6_affixes" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).customer
        .select($"c_custkey",
                concat($"c_name", lit("-USD")).as("suffixed"),
                concat(lit("cust:"), $"c_name").as("prefixed"))
        .orderBy($"c_custkey")
    },
    // T7 formula: arithmetic over row fields (exact decimal per-row)
    "t7_formula" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).lineitem
        .select($"l_orderkey", $"l_linenumber",
                Q.asDbl(Q.dec2($"l_quantity") * Q.dec2($"l_extendedprice"), 4).as("total"),
                Q.asDbl(Q.dec2($"l_extendedprice") * (Q.rate(lit(1)) - Q.rate($"l_discount")), 4).as("discounted"))
        // (l_orderkey, l_linenumber) is not unique in the synthetic data;
        // ordering by every output column makes the sort total.
        .orderBy($"l_orderkey", $"l_linenumber", $"total", $"discounted")
        .limit(1000)
    },
    // T8 conditional: first matching if/then wins, else arm, no match → null
    "t8_conditional" -> { (s, dir) =>
      import s.implicits._
      Tables(s, dir).orders
        .select($"o_orderkey",
                when($"o_totalprice" >= 300000.0, "large")
                  .when($"o_totalprice" >= 100000.0, "medium")
                  .otherwise("small").as("size_class"),
                when($"o_orderstatus" === "F", "final").as("maybe_final"))
        .orderBy($"o_orderkey")
    },
    // t11: LOOKUP FROM AN EXTERNAL SOURCE — T4's config-dict lookup
    // (dynamic.py:126-139) with the table coming from a FILE instead of
    // the mapping JSON: reference ROADMAP.md:50 ("Lookup tables from
    // external sources"). The staged lookup CSV carries (key, value)
    // rows plus the reference's `_default` convention as a reserved-key
    // ROW; the engine reads it through the same spec-driven CsvSource the
    // ETL path uses, collects `_default` as 1-row driver state, and
    // compiles the lookup to a BROADCAST left join + coalesce — the
    // scale-correct form of T4's literal when-chain (a when-chain needs
    // the table at plan-build time; an external table can be millions of
    // keys, so it joins instead — broadcast while it fits, shuffle-join
    // past that, same line of code). Incomplete table (every 3rd nation
    // missing) exercises the fallback on real rows. Oracle recomputes
    // the staged mapping rule inline.
    "t11_external_lookup" -> { (s, dir) =>
      import s.implicits._
      val lkDir = Scratch.staged(s"t11_lookup#$dir", "t11_lookup") { p =>
        Tables(s, dir).nation
          .filter(pmod($"n_nationkey", lit(3)) =!= 1)
          .select($"n_name".as("key"),
                  upper(substring($"n_name", 1, 3)).as("value"))
          .unionByName(Seq(("_default", "XX")).toDF("key", "value"))
          .coalesce(1).write.mode("overwrite").option("header", true).csv(p)
      }
      val spec = graft.spec.FileSpec(id = "lk", name = "lookup",
        columns = Seq(graft.spec.ColumnSpec("key"), graft.spec.ColumnSpec("value")))
      val lk = graft.engine.CsvSource.read(s, s"$lkDir/*.csv", spec)
      val default = lk.filter($"key" === "_default").head().getString(1)
      val table = lk.filter($"key" =!= "_default")
      Tables(s, dir).customer
        .join(broadcast(Tables(s, dir).nation), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(table), $"n_name" === $"key", "left")
        .select($"c_custkey", coalesce($"value", lit(default)).as("code"))
        .groupBy($"code").agg(count(lit(1)).as("n_customers"))
        .orderBy($"code")
    },
    // C1 condition mini-language as its own driver entry (round-4 missing
    // #5): gated suffix/prefix fields compiled through the REAL
    // TransformCompiler.compileField path — `==`, `!=`, `in [..]` gates,
    // an unparsable condition (→ gate false, value passes through), and
    // the Python-semantics quirk that a missing field compares as
    // str(None) = 'None' (dynamic.py:197-219), so `nosuch == 'None'`
    // gates TRUE on every row.
    "t10_condition_gate" -> { (s, dir) =>
      import s.implicits._
      import graft.spec.FieldMapping
      import graft.compile.TransformCompiler
      val docs = Tables(s, dir).documents
      val schema = docs.columns.toSet
      def fld(fm: FieldMapping) = TransformCompiler.compileField(fm, schema).value
      docs.select($"doc_id", $"lang", $"source",
          fld(FieldMapping("suffixed", Some("source"), "suffix",
            Map("value" -> "-en", "condition" -> "lang == 'en'"))).as("suffixed"),
          fld(FieldMapping("prefixed", Some("source"), "prefix",
            Map("value" -> "ok:", "condition" -> "source != 'src1'"))).as("prefixed"),
          fld(FieldMapping("in_tagged", Some("lang"), "suffix",
            Map("value" -> "+eu", "condition" -> "lang in ['de', 'fr']"))).as("in_tagged"),
          fld(FieldMapping("unparsable", Some("source"), "suffix",
            Map("value" -> "-x", "condition" -> "?? not a condition"))).as("unparsable"),
          fld(FieldMapping("none_gate", Some("source"), "suffix",
            Map("value" -> "-none", "condition" -> "nosuch == 'None'"))).as("none_gate"))
        .orderBy($"doc_id")
    },
    // t12: AGGREGATION TRANSFORMS IN THE MAPPING DSL — reference
    // ROADMAP.md:51 ("sum, count, average" as a transform_type), the last
    // named config-driven ETL feature (round-10 verdict item 1). The
    // mapping JSON below goes through the REAL spec path: SpecStore
    // .parseMapping → Runner.aggregatePlan, which compiles group keys via
    // TransformCompiler, skips rows by the mapping's filter rules FIRST,
    // H5-parses the aggregate inputs (strip commas, unparsable/empty →
    // 0.0), accumulates in DECIMAL(38,12) (order-independent under partial
    // aggregation — the 1000-executor requirement), and renders §1.3.2
    // money format on the way out. Fixture: staged CSV from lineitem with
    // comma-grouped quantities, every-97th "n/a" (H5 → 0.0), every-53rd
    // empty price (count skips it, avg folds it as 0.0), and an 'N'-flag
    // skip rule. Oracle replays the derivation inline.
    "t12_aggregate_mapping" -> { (s, dir) =>
      import s.implicits._
      val csvDir = Scratch.staged(s"t12_agg#$dir", "t12_agg") { p =>
        Tables(s, dir).lineitem
          .select($"l_returnflag".as("flag"), $"l_linestatus".as("status"),
            when(pmod($"l_orderkey", lit(97)) === 0, "n/a")
              .otherwise(concat(lit("1,"),
                format_string("%03d", $"l_quantity".cast("int")))).as("qty_raw"),
            when(pmod($"l_orderkey", lit(53)) === 0, "")
              .otherwise(Q.dec2($"l_extendedprice").cast("string")).as("price"))
          .coalesce(1).write.mode("overwrite").option("header", true).csv(p)
      }
      val spec = graft.spec.FileSpec(id = "li", name = "li", columns = Seq(
        graft.spec.ColumnSpec("flag"), graft.spec.ColumnSpec("status"),
        graft.spec.ColumnSpec("qty_raw"), graft.spec.ColumnSpec("price")))
      val mapping = graft.spec.SpecStore.parseMapping("""{
        "id": "agg", "name": "agg", "source_id": "li", "destination_id": "out",
        "field_mappings": [
          {"destination_field": "return_flag", "source_field": "flag",
           "transform_type": "direct", "transform_config": {}},
          {"destination_field": "line_status", "source_field": "status",
           "transform_type": "direct", "transform_config": {}},
          {"destination_field": "sum_qty", "source_field": "qty_raw",
           "transform_type": "aggregate",
           "transform_config": {"group_by": ["return_flag", "line_status"], "agg": "sum"}},
          {"destination_field": "avg_price", "source_field": "price",
           "transform_type": "aggregate",
           "transform_config": {"group_by": ["return_flag", "line_status"], "agg": "avg"}},
          {"destination_field": "n_priced", "source_field": "price",
           "transform_type": "aggregate",
           "transform_config": {"group_by": ["return_flag", "line_status"], "agg": "count"}}
        ],
        "filter_rules": [{"field": "flag", "operator": "equals", "value": "N"}]
      }""")
      val src = graft.engine.CsvSource.read(s, s"$csvDir/*.csv", spec)
      graft.engine.Runner.aggregatePlan(src, mapping)
        .orderBy($"return_flag", $"line_status")
    },
    // c17: DECLARATIVE MULTI-STEP PIPELINE CHAIN — reference ROADMAP.md:53
    // ("destination of mapping A feeding mapping B"), round-10 verdict
    // item 2. Two mappings parsed from pipeline-store JSON compose into ONE
    // Catalyst plan via engine.Pipeline.compose: m1 skips 'P' orders and
    // reshapes (direct + date_format month bucket), m2 rolls the chain up
    // with t12 aggregates. No materialization between steps — the chain is
    // a single filter→project→hashAggregate pipeline (PipelineChainSpec
    // pins chain == sequential-converts byte-for-byte, both gate
    // polarities). Oracle replays both stages inline.
    "c17_pipeline_chain" -> { (s, dir) =>
      import s.implicits._
      val csvDir = Scratch.staged(s"c17_chain#$dir", "c17_chain") { p =>
        Tables(s, dir).orders
          .select($"o_orderkey".cast("string").as("okey"),
            $"o_orderstatus".as("status"),
            date_format($"o_orderdate", "yyyy-MM-dd").as("odate"),
            Q.dec2($"o_totalprice").cast("string").as("price"))
          .coalesce(1).write.mode("overwrite").option("header", true).csv(p)
      }
      val m1 = graft.spec.SpecStore.parseMapping("""{
        "id": "m1", "name": "m1", "source_id": "s", "destination_id": "mid",
        "field_mappings": [
          {"destination_field": "status", "source_field": "status",
           "transform_type": "direct", "transform_config": {}},
          {"destination_field": "month", "source_field": "odate",
           "transform_type": "date_format",
           "transform_config": {"input_format": "%Y-%m-%d",
                                "output_format": "%Y-%m"}},
          {"destination_field": "price", "source_field": "price",
           "transform_type": "direct", "transform_config": {}}
        ],
        "filter_rules": [{"field": "status", "operator": "equals", "value": "P"}]
      }""")
      val m2 = graft.spec.SpecStore.parseMapping("""{
        "id": "m2", "name": "m2", "source_id": "mid", "destination_id": "out",
        "field_mappings": [
          {"destination_field": "status", "source_field": "status",
           "transform_type": "direct", "transform_config": {}},
          {"destination_field": "month", "source_field": "month",
           "transform_type": "direct", "transform_config": {}},
          {"destination_field": "total", "source_field": "price",
           "transform_type": "aggregate",
           "transform_config": {"group_by": ["status", "month"], "agg": "sum"}},
          {"destination_field": "n_orders", "source_field": "price",
           "transform_type": "aggregate",
           "transform_config": {"group_by": ["status", "month"], "agg": "count"}}
        ], "filter_rules": []}""")
      val spec = graft.spec.FileSpec(id = "o", name = "o", columns = Seq(
        graft.spec.ColumnSpec("okey"), graft.spec.ColumnSpec("status"),
        graft.spec.ColumnSpec("odate"), graft.spec.ColumnSpec("price")))
      val src = graft.engine.CsvSource.read(s, s"$csvDir/*.csv", spec)
      graft.engine.Pipeline.compose(src, Seq(m1, m2))
        .orderBy($"status", $"month")
    },
    // c19: SCHEDULE PLANNER — reference ROADMAP.md:48 ("Scheduled/
    // automated conversions"), the last ETL-enhancements row with no
    // declarative surface (e35's watch-folder covers the EVENT-driven
    // half; this is the TIME-driven half). Schedules are a spec type
    // (spec.ScheduleSpec, `schedules.json` keyed JSON like every other
    // store); spec.Schedules derives exact fire instants in a half-open
    // UTC window — anchor alignment (sub-daily → window start, daily →
    // `at` HH:MM, weekly → +`dow`), fixed steps, no clock reads anywhere
    // so the plan is replayable. The entry plans a January-2024 window for
    // three schedules against per-schedule last_run state: fires in
    // window, due fires (> last_run), and the CATCH-UP COLLAPSE fire —
    // of the missed slots, run ONCE at the latest (a day-long outage must
    // not replay 240 six-hour conversions). Scale shape: pure metadata —
    // the plan is |schedules| rows regardless of data volume; the runs it
    // triggers are the K2/c17 conversions, costed where they execute.
    "c19_schedule_plan" -> { (s, dir) =>
      import s.implicits._
      val (w0, w1) = ("2024-01-01 00:00:00", "2024-02-01 00:00:00")
      val specs = Seq(
        """{"id": "s1", "mapping_id": "m_hourly", "every": "6 hours"}""",
        """{"id": "s2", "mapping_id": "m_daily", "every": "1 day", "at": "03:30"}""",
        """{"id": "s3", "mapping_id": "m_weekly", "every": "1 week", "at": "09:00", "dow": 1}"""
      ).map(graft.spec.SpecStore.parseSchedule)
      val lastRun = Seq(
        ("s1", "2024-01-31 06:00:00"),
        ("s2", "2024-01-29 03:30:00"),
        ("s3", "2024-01-10 09:00:00")).toDF("id", "last_run")
      val fires = specs
        .map(sp => (sp.id, sp.mappingId, graft.spec.Schedules.fires(sp, w0, w1)))
        .toDF("id", "mapping_id", "fires")
      fires.join(lastRun, Seq("id"))
        .select($"id", $"mapping_id", explode($"fires").as("fire"), $"last_run")
        .groupBy($"id", $"mapping_id")
        .agg(count(lit(1)).as("n_fires"),
             min($"fire").as("first_fire"), max($"fire").as("last_fire"),
             sum(when($"fire" > $"last_run", 1L).otherwise(0L)).as("n_due"),
             max(when($"fire" > $"last_run", $"fire")).as("catchup_fire"))
        .orderBy($"id")
    },
    // t13: AUTO-MAPPING SUGGESTION — reference ROADMAP.md:34 ("schema
    // introspection for automatic column detection"): k26 introspects the
    // source schema; this entry turns introspected names into the mapping
    // seed the visual editor (ROADMAP.md:8) would pre-fill. For each
    // destination field, the best-scoring source column by normalized
    // name similarity: lowercase, strip one table-alias prefix ([a-z]_),
    // strip non-alnum, then integer basis-point score
    // 10000 − lev·10000 div max(len) (Levenshtein is a builtin in BOTH
    // engines, so the oracle mirrors it exactly); ties break on source
    // name, < 5000 bp ⇒ unmatched. Scale shape: pure METADATA — a
    // |dest|×|src| broadcast nested loop over column-name strings (a
    // catalog of thousands of tables is still KBs); zero data rows read.
    "t13_automap_suggest" -> { (s, dir) =>
      import s.implicits._
      val dests = Seq("customer_key", "order_date", "order_key",
        "order_status", "ship_priority", "total_price", "comment_text",
        "unmapped_field").toDF("dest_field")
      val srcs = Tables(s, dir).orders.columns.toSeq.toDF("source_col")
      def norm(c: org.apache.spark.sql.Column) =
        regexp_replace(regexp_replace(lower(c), "^[a-z]_", ""), "[^a-z0-9]", "")
      val wPick = org.apache.spark.sql.expressions.Window
        .partitionBy($"dest_field").orderBy($"score_bp".desc, $"source_col")
      dests.crossJoin(broadcast(srcs)) // 8×9 column-name rows: metadata
        .withColumn("nd", norm($"dest_field"))
        .withColumn("ns", norm($"source_col"))
        .withColumn("score_bp", expr(
          "10000L - (cast(levenshtein(nd, ns) as bigint) * 10000L)" +
            " div greatest(length(nd), length(ns))"))
        .withColumn("rn", row_number().over(wPick))
        .filter($"rn" === 1)
        .select($"dest_field",
          when($"score_bp" >= 5000, $"source_col").otherwise("(none)")
            .as("suggested_source"),
          $"score_bp", ($"score_bp" >= 5000).as("matched"))
        .orderBy($"dest_field")
    },
    // H5 lenient float parse: strip commas, unparsable → 0.0
    "h5_lenient_float" -> { (s, dir) =>
      import s.implicits._
      // build string fixtures from part: "1,234.56"-style and garbage
      Tables(s, dir).part
        .select($"p_partkey",
                concat(lit("1,"), format_string("%03.0f", $"p_size".cast("double"))).as("raw"))
        .select($"p_partkey", $"raw",
                coalesce(regexp_replace($"raw", ",", "").cast("double"), lit(0.0)).as("parsed"))
        .orderBy($"p_partkey")
    },
    // H8 currency detection from leading symbol
    "h8_currency_detect" -> { (s, dir) =>
      import s.implicits._
      val sym = element_at(array(lit("€"), lit("$"), lit("£"), lit("")),
                           (pmod($"p_partkey", lit(4)) + 1).cast("int"))
      Tables(s, dir).part
        .select($"p_partkey", concat(sym, lit("10.00")).as("price_str"))
        .select($"p_partkey", $"price_str",
                when(substring($"price_str", 1, 1) === "€", "EUR")
                  .when(substring($"price_str", 1, 1) === "$", "USD")
                  .when(substring($"price_str", 1, 1) === "£", "GBP")
                  .otherwise("EUR").as("currency"))
        .orderBy($"p_partkey")
    }
  )

  val oracle: Map[String, String] = Map(
    "f1_equals_skip" -> """
      SELECT doc_id, lang, source FROM documents
      WHERE NOT (lang = 'en') ORDER BY doc_id""",
    "f2_not_equals_skip" -> """
      SELECT doc_id, lang FROM documents
      WHERE NOT (lang <> 'en') ORDER BY doc_id""",
    "f3_in_skip" -> """
      SELECT doc_id, lang FROM documents
      WHERE NOT (lang IN ('de','fr')) ORDER BY doc_id""",
    "f4_not_in_skip" -> """
      SELECT doc_id, lang FROM documents
      WHERE lang IN ('en','es') ORDER BY doc_id""",
    "f5_is_empty_skip" -> """
      SELECT doc_id, n_chars FROM documents
      WHERE NOT (text IS NULL OR text = '') ORDER BY doc_id""",
    "f6_is_not_empty_skip" -> """
      SELECT doc_id, maybe FROM (
        SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN ''
                            WHEN doc_id % 11 = 0 THEN NULL
                            ELSE source END AS maybe
        FROM documents) t
      WHERE NOT (maybe IS NOT NULL AND maybe <> '') ORDER BY doc_id""",
    "f7_contains_skip" -> """
      SELECT doc_id, lang FROM documents
      WHERE NOT (text LIKE '%spark%') ORDER BY doc_id""",
    "f8_rules_ored" -> """
      SELECT doc_id, lang, source FROM documents
      WHERE NOT (lang = 'zh' OR source = 'src1') ORDER BY doc_id""",
    "t1_direct_constant" -> """
      SELECT doc_id, lang AS language, 'graft' AS engine, CAST(1 AS BIGINT) AS version
      FROM documents ORDER BY doc_id""",
    "t3_date_format" -> """
      SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS d_iso,
             strftime(o_orderdate, '%d/%m/%Y') AS d_eu
      FROM orders ORDER BY o_orderkey LIMIT 500""",
    "t4_lookup" -> """
      SELECT r_regionkey, r_name,
             CASE r_name WHEN 'ASIA' THEN 'AS' WHEN 'EUROPE' THEN 'EU'
                         WHEN 'AMERICA' THEN 'AM' ELSE 'OTHER' END AS code
      FROM region ORDER BY r_regionkey""",
    "t5_t6_affixes" -> """
      SELECT c_custkey, c_name || '-USD' AS suffixed, 'cust:' || c_name AS prefixed
      FROM customer ORDER BY c_custkey""",
    "t7_formula" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS total,
             CAST(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS discounted
      FROM lineitem ORDER BY l_orderkey, l_linenumber, total, discounted LIMIT 1000""",
    "t8_conditional" -> """
      SELECT o_orderkey,
             CASE WHEN o_totalprice >= 300000.0 THEN 'large'
                  WHEN o_totalprice >= 100000.0 THEN 'medium'
                  ELSE 'small' END AS size_class,
             CASE WHEN o_orderstatus = 'F' THEN 'final' END AS maybe_final
      FROM orders ORDER BY o_orderkey""",
    // t11: the staged external table is (filtered nations → 3-letter code,
    // '_default' → 'XX'); replayed inline as the CASE the staging derives
    "t11_external_lookup" -> """
      SELECT CASE WHEN n_nationkey % 3 <> 1
                  THEN upper(substring(n_name, 1, 3))
                  ELSE 'XX' END AS code,
             COUNT(*)::BIGINT AS n_customers
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1 ORDER BY 1""",
    "t10_condition_gate" -> """
      SELECT doc_id, lang, source,
             CASE WHEN lang = 'en' THEN source || '-en' ELSE source END AS suffixed,
             CASE WHEN source <> 'src1' THEN 'ok:' || source ELSE source END AS prefixed,
             CASE WHEN lang IN ('de','fr') THEN lang || '+eu' ELSE lang END AS in_tagged,
             source AS unparsable,
             source || '-none' AS none_gate
      FROM documents ORDER BY doc_id""",
    // t12: replay the staged derivation (comma-grouped qty, n/a and empty
    // plants, 'N'-flag skip rule), then the engine's defined aggregate
    // semantics — H5 parse, DECIMAL(38,12) accumulation, §1.3.2 formatting
    "t12_aggregate_mapping" -> """
      WITH src AS (
        SELECT l_returnflag AS flag, l_linestatus AS status,
               CASE WHEN l_orderkey % 97 = 0 THEN 'n/a'
                    ELSE '1,' || printf('%03d', CAST(l_quantity AS INT)) END AS qty_raw,
               CASE WHEN l_orderkey % 53 = 0 THEN ''
                    ELSE CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) END AS price
        FROM lineitem
        WHERE NOT (l_returnflag = 'N'))
      SELECT flag AS return_flag, status AS line_status,
             rtrim(rtrim(printf('%.8f',
               CAST(CAST(sum(CAST(COALESCE(TRY_CAST(replace(qty_raw, ',', '') AS DOUBLE), 0.0)
                   AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)), '0'), '.') AS sum_qty,
             rtrim(rtrim(printf('%.8f',
               CAST(CAST(sum(CAST(COALESCE(TRY_CAST(price AS DOUBLE), 0.0)
                   AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) / COUNT(*)), '0'), '.') AS avg_price,
             CAST(COUNT(*) FILTER (WHERE price <> '') AS VARCHAR) AS n_priced
      FROM src GROUP BY 1, 2 ORDER BY 1, 2""",
    // c17: both chain stages replayed inline — m1's skip rule + month
    // bucket, then m2's t12 aggregate semantics (DECIMAL(38,12), money8)
    "c17_pipeline_chain" -> """
      WITH mid AS (
        SELECT o_orderstatus AS status, strftime(o_orderdate, '%Y-%m') AS month,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price
        FROM orders WHERE NOT (o_orderstatus = 'P'))
      SELECT status, month,
             rtrim(rtrim(printf('%.8f',
               CAST(CAST(sum(CAST(COALESCE(TRY_CAST(replace(price, ',', '') AS DOUBLE), 0.0)
                   AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)), '0'), '.') AS total,
             CAST(COUNT(*) FILTER (WHERE price <> '') AS VARCHAR) AS n_orders
      FROM mid GROUP BY 1, 2 ORDER BY 1, 2""",
    // c19: the three schedules' aligned fire series replayed as timestamp
    // ranges (the anchors ARE the alignment closed form: the window opens
    // at midnight on Monday 2024-01-01, so daily@03:30 anchors same-day
    // and weekly@Mon 09:00 anchors day one)
    "c19_schedule_plan" -> """
      WITH f AS (
        SELECT 's1' AS id, 'm_hourly' AS mapping_id,
               TIMESTAMP '2024-01-31 06:00:00' AS last_run,
               unnest(range(TIMESTAMP '2024-01-01 00:00:00',
                            TIMESTAMP '2024-02-01 00:00:00',
                            INTERVAL 6 HOUR)) AS fire
        UNION ALL
        SELECT 's2', 'm_daily', TIMESTAMP '2024-01-29 03:30:00',
               unnest(range(TIMESTAMP '2024-01-01 03:30:00',
                            TIMESTAMP '2024-02-01 00:00:00',
                            INTERVAL 1 DAY))
        UNION ALL
        SELECT 's3', 'm_weekly', TIMESTAMP '2024-01-10 09:00:00',
               unnest(range(TIMESTAMP '2024-01-01 09:00:00',
                            TIMESTAMP '2024-02-01 00:00:00',
                            INTERVAL 7 DAY)))
      SELECT id, mapping_id, COUNT(*)::BIGINT AS n_fires,
             strftime(MIN(fire), '%Y-%m-%d %H:%M:%S') AS first_fire,
             strftime(MAX(fire), '%Y-%m-%d %H:%M:%S') AS last_fire,
             (COUNT(*) FILTER (WHERE fire > last_run))::BIGINT AS n_due,
             strftime(MAX(fire) FILTER (WHERE fire > last_run),
                      '%Y-%m-%d %H:%M:%S') AS catchup_fire
      FROM f GROUP BY 1, 2 ORDER BY id""",
    // t13: same normalization + levenshtein scoring over the introspected
    // schema (DESCRIBE) and the literal destination list
    "t13_automap_suggest" -> """
      WITH dests(dest_field) AS (VALUES ('customer_key'), ('order_date'),
        ('order_key'), ('order_status'), ('ship_priority'), ('total_price'),
        ('comment_text'), ('unmapped_field')),
      srcs AS (SELECT column_name AS source_col
               FROM (DESCRIBE SELECT * FROM orders)),
      scored AS (
        SELECT dest_field, source_col,
               10000 - (levenshtein(nd, ns) * 10000 //
                        greatest(length(nd), length(ns))) AS score_bp
        FROM (SELECT dest_field, source_col,
                     regexp_replace(regexp_replace(lower(dest_field),
                       '^[a-z]_', ''), '[^a-z0-9]', '', 'g') AS nd,
                     regexp_replace(regexp_replace(lower(source_col),
                       '^[a-z]_', ''), '[^a-z0-9]', '', 'g') AS ns
              FROM dests CROSS JOIN srcs) t),
      best AS (
        SELECT dest_field, source_col, score_bp,
               row_number() OVER (PARTITION BY dest_field
                 ORDER BY score_bp DESC, source_col) AS rn
        FROM scored)
      SELECT dest_field,
             CASE WHEN score_bp >= 5000 THEN source_col
                  ELSE '(none)' END AS suggested_source,
             score_bp, (score_bp >= 5000) AS matched
      FROM best WHERE rn = 1 ORDER BY dest_field""",
    "h5_lenient_float" -> """
      SELECT p_partkey, raw, COALESCE(TRY_CAST(replace(raw, ',', '') AS DOUBLE), 0.0) AS parsed
      FROM (SELECT p_partkey, '1,' || printf('%03.0f', CAST(p_size AS DOUBLE)) AS raw FROM part) t
      ORDER BY p_partkey""",
    "h8_currency_detect" -> """
      SELECT p_partkey, price_str,
             CASE WHEN substr(price_str, 1, 1) = '€' THEN 'EUR'
                  WHEN substr(price_str, 1, 1) = '$' THEN 'USD'
                  WHEN substr(price_str, 1, 1) = '£' THEN 'GBP'
                  ELSE 'EUR' END AS currency
      FROM (SELECT p_partkey,
                   (['€','$','£',''])[(p_partkey % 4) + 1] || '10.00' AS price_str
            FROM part) t
      ORDER BY p_partkey"""
  )
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for dq20's declarative expectation suite beyond the DuckDB hash
  * match: the JSON parse, the NULL-handling contract (only not_null counts
  * NULLs; value checks skip them), unique's surplus-row counting, the
  * unknown-check failure mode, and the one-scan plan shape. */
class ExpectationSuiteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val suiteJson = """{
    "id": "t", "name": "t", "table": "x",
    "expectations": [
      {"column": "a", "check": "not_null"},
      {"column": "a", "check": "range", "lo": 0, "hi": 10},
      {"column": "b", "check": "accepted_values", "values": ["x", "y"]},
      {"column": "b", "check": "regex_match", "pattern": "^[a-z]$"},
      {"column": "a", "check": "unique"}
    ]}"""

  test("JSON parse carries every field") {
    val s = graft.spec.SpecStore.parseExpectationSuite(suiteJson)
    assert(s.id == "t" && s.table == "x" && s.expectations.size == 5)
    assert(s.expectations(1).lo.contains(0.0) && s.expectations(1).hi.contains(10.0))
    assert(s.expectations(2).values == Seq("x", "y"))
    assert(s.expectations(3).pattern.contains("^[a-z]$"))
  }

  test("NULL contract: value checks skip NULLs, not_null counts them; unique counts surplus rows") {
    import spark.implicits._
    // a: one NULL (not_null=1); 99 out of range (range=1, NULL skipped);
    //    value 7 twice + 5 twice among non-nulls → unique surplus = 2
    // b: NULL skipped by accepted/regex; "zz" fails both; "Q" fails both
    val df = Seq[(java.lang.Long, String)](
      (7L, "x"), (7L, "y"), (5L, "zz"), (5L, "Q"), (99L, null), (null, "x")
    ).toDF("a", "b")
    val s = graft.spec.SpecStore.parseExpectationSuite(suiteJson)
    val out = graft.compile.ExpectationCompiler.audit(df, s)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("not_null", "a")) == 1L)
    assert(out(("range", "a")) == 1L)          // 99 only; NULL skipped
    assert(out(("accepted_values", "b")) == 2L) // zz, Q; NULL skipped
    assert(out(("regex_match", "b")) == 2L)     // zz (2 chars), Q (upper)
    assert(out(("unique", "a")) == 2L)          // 7×2 and 5×2 → 2 surplus
  }

  test("unknown check names fail loudly, not silently pass") {
    import spark.implicits._
    val bad = graft.spec.SpecStore.parseExpectationSuite(
      """{"id":"b","name":"b","expectations":[{"column":"a","check":"nope"}]}""")
    val df = Seq((1L, "x")).toDF("a", "b")
    intercept[IllegalArgumentException] {
      graft.compile.ExpectationCompiler.audit(df, bad)
    }
    // an empty accepted_values list is a spec authoring error (it would
    // flag every non-null row), rejected at compile time
    val empty = graft.spec.SpecStore.parseExpectationSuite(
      """{"id":"e","name":"e","expectations":
           [{"column":"b","check":"accepted_values","values":[]}]}""")
    intercept[IllegalArgumentException] {
      graft.compile.ExpectationCompiler.audit(df, empty)
    }
  }

  test("e36: the streamed audit's final trigger equals the batch audit") {
    import spark.implicits._
    val streamed = SparkEntry.queries("e36_stream_expectations")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val suite = graft.spec.SpecStore.parseExpectationSuite("""{
      "id": "ev", "name": "ev", "table": "events",
      "expectations": [
        {"column": "user_id",    "check": "not_null"},
        {"column": "value",      "check": "range", "lo": 0, "hi": 100},
        {"column": "event_type", "check": "accepted_values",
         "values": ["click", "view", "purchase", "signup"]},
        {"column": "props",      "check": "regex_match",
         "pattern": "^\\{\"k\": [0-9]\\}$"}
      ]}""")
    val batch = graft.compile.ExpectationCompiler
      .audit(Tables(spark, TestSpark.sf).events, suite)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    // non-vacuous: the suite mixes passing and violating rules
    assert(batch.exists(_._3 == 0L) && batch.exists(_._3 > 0L))
  }

  test("unique on a stream fails fast (distinct aggregates are not mergeable)") {
    val rate = spark.readStream.format("rate").load()
    val suite = graft.spec.ExpectationSuite("u", "u", "t",
      Seq(graft.spec.Expectation("value", "unique")))
    val audited = graft.compile.ExpectationCompiler.audit(rate, suite)
    intercept[org.apache.spark.sql.AnalysisException] {
      val q = audited.writeStream.format("memory")
        .queryName("u_" + System.nanoTime()).outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
  }

  test("whole suite compiles to ONE scan of the audited table") {
    val audit = SparkEntry.queries("dq20_expectation_suite")(spark, TestSpark.sf)
    val plan = audit.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).length +
      "BatchScan".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan, got $scans:\n$plan")
  }
}

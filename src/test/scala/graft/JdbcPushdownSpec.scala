package graft

import org.scalatest.funsuite.AnyFunSuite

/** k33 — the mapping DSL's filter rules pushed into the JDBC scan: the
  * plan must show the compiled keep predicate in the JDBC source's
  * PushedFilters (the SpecSourceSpec:53 plan-pin convention) with no
  * surviving post-scan Filter on that predicate, and the filtered read
  * must equal the engine-side filter. */
class JdbcPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def derbyProps: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private lazy val url: String = {
    val p = Scratch.dir("k33spec").toString
    System.setProperty("derby.system.home", p)
    val u = s"jdbc:derby:$p/db;create=true"
    val c = java.sql.DriverManager.getConnection(u)
    try {
      val st = c.createStatement()
      st.executeUpdate(
        "CREATE TABLE T_K33 (ID BIGINT NOT NULL PRIMARY KEY, FLAG VARCHAR(1), QTY BIGINT)")
      st.executeUpdate("INSERT INTO T_K33 VALUES (1,'N',10),(2,'A',20),(3,'R',30),(4,'N',40)")
      st.close()
    } finally c.close()
    s"jdbc:derby:$p/db"
  }

  test("k33: keep predicate lands in the JDBC scan's PushedFilters, no re-filter") {
    val rules = Seq(graft.spec.FilterRule(
      field = "FLAG", operator = "equals", value = Some("N")))
    val tbl = spark.read.jdbc(url, "T_K33", derbyProps)
    val df = tbl.filter(
      graft.compile.FilterCompiler.keepPredicate(rules, tbl.columns.toSet))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*Not\\(EqualNullSafe\\(FLAG,N\\)\\).*"),
      s"keep predicate not pushed to the JDBC scan:\n$plan")
    // the JDBC source reports the compiled filter as handled — Spark must
    // not re-evaluate it post-scan
    assert(!plan.contains("Filter NOT"), s"Spark re-filtered post-scan:\n$plan")
    val got = df.select($"ID").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(2L, 3L))
  }

  test("k33: pushed read equals the engine-side filter for every rule shape") {
    val tbl = spark.read.jdbc(url, "T_K33", derbyProps)
    val ruleSets = Seq(
      Seq(graft.spec.FilterRule("FLAG", "equals", Some("N"))),
      Seq(graft.spec.FilterRule("FLAG", "in", values = Seq("A", "R"))),
      Seq(graft.spec.FilterRule("FLAG", "not_in", values = Seq("A", "R"))),
      Seq(graft.spec.FilterRule("FLAG", "contains", Some("R"))),
      Seq(graft.spec.FilterRule("FLAG", "equals", Some("N")),
          graft.spec.FilterRule("QTY", "equals", Some("20"))))
    for (rules <- ruleSets) {
      // QTY is BIGINT in the db; the DSL compares strings — cast first,
      // exactly what the spec-driven path sees (dict[str,str] rows)
      val strs = tbl.select(tbl.columns.map(c => tbl(c).cast("string").as(c)): _*)
      val keep = graft.compile.FilterCompiler.keepPredicate(rules, strs.columns.toSet)
      val viaDb = strs.filter(keep).select($"ID").collect().map(_.getString(0)).sorted.toSeq
      val local = strs.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .filter { case (_, flag, qty) =>
          !rules.exists { r =>
            val cell = if (r.field == "FLAG") flag else qty
            r.operator match {
              case "equals"   => cell == r.value.orNull
              case "in"       => r.values.contains(cell)
              case "not_in"   => !r.values.contains(cell)
              case "contains" => r.value.exists(v => v.nonEmpty && cell.contains(v))
              case _          => false
            }
          }
        }.map(_._1).sorted.toSeq
      assert(viaDb == local, s"rules $rules: pushed=$viaDb local=$local")
    }
  }

  test("k37: QueryBuilder SQL executed on Derby == FilterCompiler on NULL-bearing rows") {
    // round-11 advice (medium): the pushed WHERE must keep exactly the rows
    // the engine keeps when the filtered column holds SQL NULL. Run the
    // compiled query ON the database and compare with the engine-side
    // keepPredicate over the raw read, for every pushable rule shape —
    // including the missing-`value` forms the old render defaulted to ''.
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.executeUpdate(
        "CREATE TABLE T_NULLS (ID BIGINT NOT NULL PRIMARY KEY, FLAG VARCHAR(4))")
      st.executeUpdate(
        "INSERT INTO T_NULLS VALUES (1,'N'),(2,'A'),(3,NULL),(4,''),(5,'R')")
      st.close()
    } finally c.close()
    val tbl = spark.read.jdbc(url, "T_NULLS", derbyProps)
    val ruleSets = Seq(
      Seq(graft.spec.FilterRule("FLAG", "equals", Some("N"))),
      Seq(graft.spec.FilterRule("FLAG", "not_equals", Some("N"))),
      Seq(graft.spec.FilterRule("FLAG", "in", values = Seq("A", "R"))),
      Seq(graft.spec.FilterRule("FLAG", "not_in", values = Seq("A", "R"))),
      Seq(graft.spec.FilterRule("FLAG", "is_empty")),
      Seq(graft.spec.FilterRule("FLAG", "is_not_empty")),
      Seq(graft.spec.FilterRule("FLAG", "equals", None)),
      Seq(graft.spec.FilterRule("FLAG", "not_equals", None)),
      Seq(graft.spec.FilterRule("FLAG", "equals", Some("N")),
          graft.spec.FilterRule("FLAG", "not_in", values = Seq("A"))))
    for (rules <- ruleSets) {
      val q = graft.spec.QuerySpec("p", "T_NULLS", Seq("ID", "FLAG"),
        filters = rules)
      val (sql, residual) = graft.spec.QueryBuilder.compile(q)
      assert(residual.isEmpty, s"unexpected residual for $rules")
      val pushed = spark.read.jdbc(url, s"($sql) P", derbyProps)
        .select($"ID").collect().map(_.getLong(0)).sorted.toSeq
      val engine = tbl.filter(graft.compile.FilterCompiler
          .keepPredicate(rules, tbl.columns.toSet))
        .select($"ID").collect().map(_.getLong(0)).sorted.toSeq
      assert(pushed == engine,
        s"rules $rules: pushed=$pushed engine=$engine\nsql=$sql")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The native SignedProjection kernel must produce EXACTLY the flat
  * folded-sign SQL form it replaced (which the v18 oracle still runs):
  * p_k = Σ_d ±q_d over BIGINT with the v18 sign table. Pinned on random
  * vectors including values large enough to overflow intermediate sums
  * (wraparound addition is order-independent), and on both evaluation
  * paths. (Sums stay inside the BIGINT range in every test — and in the
  * engine, where |q_d| ≤ 4096·|v_d| — because under ANSI mode the SQL
  * form would raise on overflow rather than wrap; within range, signed
  * integer addition is exact in any order.) */
class SignedProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val signs = Array.tabulate(8, 64) { (k, d) =>
    1L - 2L * (((1315423911L * k + 2654435761L * d) % 2147483647L) % 2)
  }
  private val sqlForm = "array(" + (0 until 8).map { k =>
    (0 until 64).map { d =>
      s"${if (signs(k)(d) > 0) "" else "-"}element_at(q, ${d + 1})"
    }.mkString(" + ")
  }.mkString(", ") + ")"

  private val rnd = new scala.util.Random(77)
  private def vecs(big: Boolean): Seq[(Long, Seq[Long])] =
    (0 until 120).map { i =>
      (i.toLong, Seq.fill(64)(
        if (big) (rnd.nextLong() >> 8) / 64 // wide but sum-safe under ANSI
        else (rnd.nextInt(1 << 13) - (1 << 12)).toLong))
    }

  private def compare(big: Boolean): Unit = {
    val df = vecs(big).toDF("id", "q")
      .withColumn("kernel", graft.functions.SignedProjection.of($"q", signs))
      .withColumn("sql", expr(sqlForm))
      .select($"id", $"kernel", $"sql")
    df.collect().foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id ${r.getLong(0)}")
    }
  }

  test("kernel == folded SQL form, quantized-range values") { compare(false) }
  test("kernel == folded SQL form, wide-range values") { compare(true) }

  test("kernel == folded SQL form, interpreted path") {
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      compare(false)
    }
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TextKernels, VectorExprs}

/** The native DotProduct expression must be bitwise identical to the
  * compiled-Scala fold (TextKernels.dotd) on BOTH evaluation paths —
  * whole-stage codegen and interpreted — since the oracle comparison
  * depends on exact doubles. */
class VectorExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val vecs: Seq[(Long, Array[Double])] =
    (0L until 50L).map(i => i -> Array.fill(64)(rnd.nextDouble() * 2 - 1))

  private def df = vecs.toDF("id", "v")

  test("native dot == compiled Scala fold, codegen path") {
    val got = df.withColumn("d", VectorExprs.dot($"v", $"v"))
      .select($"id", $"d").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == TextKernels.dotd(v, v), s"id $id")
    }
  }

  test("native dot == compiled Scala fold, interpreted path") {
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val got = df.withColumn("d", VectorExprs.dot($"v", $"v"))
        .select($"id", $"d").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      vecs.foreach { case (id, v) =>
        assert(got(id) == TextKernels.dotd(v, v), s"id $id")
      }
    }
  }

  test("length mismatch folds the shorter prefix; cosine composes exactly") {
    val two = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0))).toDF("a", "b")
    val d = two.select(VectorExprs.dot($"a", $"b")).head.getDouble(0)
    assert(d == 1.0 * 4.0 + 2.0 * 5.0)
    val c = df.withColumn("n", VectorExprs.dot($"v", $"v"))
      .select(VectorExprs.cosine($"v", $"v", $"n", $"n")).collect()
    c.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-12))
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

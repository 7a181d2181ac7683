package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The native CdcStarts kernel must produce EXACTLY the boundary array of
  * the SQL form it replaced (which the x17 DuckDB oracle still runs):
  * position 1 plus every p in [2, len-7] whose 8-char md5 window's first
  * hex pair is < '04'. Pinned on random [a-z ] corpora (the normalized
  * alphabet x17 feeds it), edge lengths 0..9, and on both evaluation
  * paths (codegen + interpreted). */
class CdcStartsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sqlForm =
    "concat(array(1), if(length(nt) < 9, array(), " +
      "filter(transform(sequence(2, length(nt) - 7), " +
      "p -> if(substring(md5(substring(nt, p, 8)), 1, 2) < '04', p, -1)), " +
      "x -> x > 0)))"

  private val rnd = new scala.util.Random(1234)
  private val alphabet = "abcdefghijklmnopqrstuvwxyz "
  private val texts: Seq[String] =
    // edge lengths around the <9 guard, then random docs up to ~600 chars
    (0 to 10).map(n => Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString) ++
      (1 to 60).map(_ => Seq.fill(50 + rnd.nextInt(550))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)

  private def compare(): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "nt")
    val rows = df
      .withColumn("kernel", graft.functions.CdcStarts.of($"nt"))
      .withColumn("sql", expr(sqlForm))
      .select($"id", $"kernel", $"sql").collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"id ${r.getLong(0)}")
    }
  }

  test("kernel == SQL boundary array, codegen path") { compare() }

  test("kernel == SQL boundary array, interpreted path") {
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") { compare() }
  }

  test("non-ASCII fallback matches the SQL form") {
    val odd = Seq("héllo wörld some text beyond nine chars",
                  "日本語のテキストはバイトと文字がずれる example windowed text")
    val df = odd.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "nt")
    val rows = df
      .withColumn("kernel", graft.functions.CdcStarts.of($"nt"))
      .withColumn("sql", expr(sqlForm))
      .select($"kernel", $"sql").collect()
    rows.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1)))
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

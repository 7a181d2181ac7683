package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextKernels
import graft.catalog.Tx

/** The compiled kernels must agree with the Catalyst-expression semantics
  * they replaced (the oracle SQL is generated from the same Tx definitions),
  * including on adversarial inputs the sf-corpus never produces. */
class TextKernelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val adversarial = Seq(
    "", " ", "   ", "a", "A B  c", "hello world", "tab\there", "new\nline",
    "punct!@#$%^&*()", "123 456", "mixed 123 a1b2c3", "Ünïcödé sträße",
    "中文 text here", "İstanbul", "a b c d e f g h", "the the the the",
    "trailing spaces   ", "   leading", "comma,separated,words",
    "x" * 300, ("word " * 50).trim)

  private def df = adversarial.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("id", "text")

  test("tokenize kernel == split/trim/regexp_replace expression") {
    val rows = df
      .withColumn("sql_ws", expr(Tx.wsExpr))
      .collect()
    rows.foreach { r =>
      val t = r.getAs[String]("text")
      assert(TextKernels.tokenize(t).toSeq == r.getSeq[String](r.fieldIndex("sql_ws")).toSeq,
        s"tokenize mismatch for ${t.take(30)}")
    }
  }

  test("polyHash kernel == aggregate/ascii expression over tokens") {
    val rows = df
      .withColumn("tok", expr(Tx.wsExpr))
      .withColumn("sql_hs", expr(s"transform(tok, t -> ${Tx.polyHash("t")})"))
      .collect()
    rows.foreach { r =>
      val t = r.getAs[String]("text")
      val want = r.getSeq[Long](r.fieldIndex("sql_hs"))
      assert(TextKernels.tokenize(t).map(TextKernels.polyHash).toSeq == want.toSeq,
        s"polyHash mismatch for ${t.take(30)}")
    }
  }

  test("shingles kernel == guarded sequence expression") {
    val rows = df
      .withColumn("ws", expr(Tx.wsExpr))
      .withColumn("sql_sh", expr(Tx.shinglesExpr(4)))
      .collect()
    rows.foreach { r =>
      val t = r.getAs[String]("text")
      assert(TextKernels.shingles4(TextKernels.tokenize(t)).toSeq ==
        r.getSeq[String](r.fieldIndex("sql_sh")).toSeq, s"shingles mismatch for ${t.take(30)}")
    }
  }

  test("non-distinct shingle hashes == explode(shinglesAllExpr) + polyHash") {
    // d16's tf path (round-14): the compiled kernel must yield the same
    // MULTISET of hashes (order included — both walk positions ascending)
    val rows = df
      .withColumn("ws", expr(Tx.wsExpr))
      .withColumn("sql_h",
        expr(s"transform(${Tx.shinglesAllExpr(4)}, sg -> ${Tx.polyHash("sg")})"))
      .withColumn("kern_h", TextKernels.shingleHashesAllUdf($"text"))
      .collect()
    rows.foreach { r =>
      val t = r.getAs[String]("text")
      assert(r.getSeq[Long](r.fieldIndex("kern_h")).toSeq ==
        r.getSeq[Long](r.fieldIndex("sql_h")).toSeq,
        s"shingleHashesAll mismatch for ${t.take(30)}")
    }
  }

  test("minhash signature: containment monotonicity sanity") {
    // a superset document can only lower or keep each minhash slot
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val sup = base + " with extra words appended here"
    val sb = TextKernels.minhash16(TextKernels.shingles4(TextKernels.tokenize(base)).map(TextKernels.polyHash))
    val ss = TextKernels.minhash16(TextKernels.shingles4(TextKernels.tokenize(sup)).map(TextKernels.polyHash))
    sb.zip(ss).foreach { case (b, s) => assert(s <= b) }
  }

  test("simhash: identical docs collide, different docs differ") {
    def sig(t: String) = TextKernels.simhash32(TextKernels.tokenize(t).map(TextKernels.polyHash))
    assert(sig("alpha beta gamma") == sig("alpha beta gamma"))
    assert(sig("alpha beta gamma") != sig("totally different words entirely"))
    assert(java.lang.Long.bitCount(sig("alpha beta gamma delta") ^ sig("alpha beta gamma epsilon")) <= 16)
  }
}

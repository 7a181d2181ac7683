package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the BIFF8 .xls source (k38): value round-trip through both CFB
  * layouts (regular FAT for ≥4096-byte streams, miniFAT/mini-stream below
  * the cutoff — the layout real small Excel files use), RK/MULRK numeric
  * decode (the packed forms Excel emits that our writer doesn't), and
  * named malformed-input rejection (a binary format must fail loudly, not
  * produce quietly-wrong frames). */
class XlsSourceSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType),
    StructField("v", DoubleType)))

  test("round-trip: values, nulls, unicode, and empty strings survive") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha", 1.5), (2L, "café ™", -2.25), (3L, "", 0.0),
      (4L, "alpha", 9.007199254740992E15)).toDF("k", "s", "v")
      .withColumn("s", org.apache.spark.sql.functions
        .when($"k" === 3L, null).otherwise($"s"))
    val dir = graft.Scratch.dir("xls_rt").toString
    XlsTable.write(df.repartition(2), dir)
    val back = XlsTable.read(spark, dir, df.schema)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(back == Seq(
      (1L, Some("alpha"), 1.5), (2L, Some("café ™"), -2.25),
      (3L, None, 0.0), (4L, Some("alpha"), 9.007199254740992E15)))
  }

  test("small parts use the miniFAT/mini-stream layout and still round-trip") {
    val rows = Iterator(Row(7L, "tiny", 0.5))
    val img = XlsTable.encode(schema, rows)
    // a one-row sheet is far below the 4096-byte cutoff → mini layout
    val size = {
      // Workbook dir-entry size sits in the directory; cheapest check is
      // behavioral: the stream extracts and parses
      val wb = XlsTable.workbookStream(img)
      assert(wb.length < 4096, s"expected a sub-cutoff stream, got ${wb.length}")
      wb.length
    }
    assert(size > 0)
    val got = XlsTable.sheetRows(XlsTable.workbookStream(img), 3,
      schema.fields.map(_.dataType)).toSeq
    assert(got == Seq(Row(7L, "tiny", 0.5)))
  }

  test("RK and MULRK records decode (integer, /100, and float forms)") {
    // hand-build a sheet substream with records our WRITER never emits
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    val out = new java.io.ByteArrayOutputStream()
    def rec(id: Int, payload: Array[Byte]): Unit = {
      out.write(le(4).putShort(id.toShort).putShort(payload.length.toShort).array())
      out.write(payload)
    }
    rec(0x0809, le(16).putShort(0x0600.toShort).putShort(0x0005.toShort)
      .putInt(0).putInt(0).putInt(0).array())          // globals BOF
    rec(0x00FC, le(8).putInt(0).putInt(0).array())     // empty SST
    rec(0x000A, Array.emptyByteArray)                  // globals EOF
    rec(0x0809, le(16).putShort(0x0600.toShort).putShort(0x0010.toShort)
      .putInt(0).putInt(0).putInt(0).array())          // sheet BOF
    // row 1: RK int 42 (rk = 42<<2 | 2), RK 1.25 as /100 int (125<<2|3)
    rec(0x027E, le(10).putShort(1.toShort).putShort(0.toShort).putShort(0.toShort)
      .putInt((42 << 2) | 2).array())
    rec(0x027E, le(10).putShort(1.toShort).putShort(2.toShort).putShort(0.toShort)
      .putInt((125 << 2) | 3).array())
    // row 2: MULRK is a CONTIGUOUS run from colFirst — float-form RK of
    // 2.5 (top 30 bits of the double) at col 0, then int 7 at col 1
    val fRk = ((java.lang.Double.doubleToLongBits(2.5) >>> 32) & 0xFFFFFFFCL).toInt
    rec(0x00BD, le(18).putShort(2.toShort).putShort(0.toShort)
      .putShort(0.toShort).putInt(fRk)                 // col 0
      .putShort(0.toShort).putInt((7 << 2) | 2)        // col 1
      .putShort(1.toShort).array())                    // colLast
    // row 3: LABEL — inline string, the pre-SST form some exporters emit
    val txt = "inline".getBytes("ISO-8859-1")
    rec(0x0204, le(9 + txt.length).putShort(3.toShort).putShort(1.toShort)
      .putShort(0.toShort).putShort(txt.length.toShort).put(0.toByte)
      .put(txt).array())
    rec(0x000A, Array.emptyByteArray)                  // sheet EOF
    val types: Array[DataType] = Array(DoubleType, StringType, DoubleType)
    val got = XlsTable.sheetRows(out.toByteArray, 3, types).toSeq
    // numeric cell under a string schema column renders via toString
    assert(got == Seq(Row(42.0, null, 1.25), Row(2.5, "7.0", null),
      Row(null, "inline", null)))
  }

  test("DSv2 surface: format read, pruning reaches the scan, names infer") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5))
      .toDF("k", "s", "v")
    val dir = graft.Scratch.dir("xls_dsv2").toString
    XlsTable.write(df.repartition(2), dir)
    val read = spark.read.format("graft.sources.XlsTableProvider")
      .schema(df.schema).option("path", dir).load()
    // full round-trip through Spark's planner
    assert(read.orderBy($"k").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      == Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5)))
    // column pruning lands in the scan's ReadSchema (k22's plan-pin style)
    val pruned = read.select($"s", $"v")
    val phys = pruned.queryExecution.executedPlan.toString
    assert(phys.contains("ReadSchema: [s, v]"),
      s"pruned columns did not reach the scan:\n$phys")
    assert(pruned.collect().map(_.getString(0)).sorted.toSeq == Seq("a", "a", "b"))
    // schema inference: names from the header row, all-string values
    val inferred = spark.read.format("graft.sources.XlsTableProvider")
      .option("path", dir).load()
    assert(inferred.schema.fieldNames.toSeq == Seq("k", "s", "v"))
    assert(inferred.schema.fields.forall(_.dataType == StringType))
    // numeric cells under the untyped string view render via Double.toString
    assert(inferred.filter($"s" === "b").select($"k").head().getString(0) == "2.0")
  }

  test("malformed inputs are rejected with named errors") {
    // bad CFB signature
    val e1 = intercept[IllegalArgumentException](
      XlsTable.workbookStream(new Array[Byte](1024)))
    assert(e1.getMessage.contains("signature"))
    // a record whose declared length overruns the stream
    import java.nio.{ByteBuffer, ByteOrder}
    val trunc = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(0x0203.toShort).putShort(500.toShort).putInt(0).array()
    val e2 = intercept[IllegalArgumentException](
      XlsTable.sheetRows(trunc, 1, Array[DataType](DoubleType)).toSeq)
    assert(e2.getMessage.contains("overruns"))
    // LABELSST pointing outside the SST
    val out = new java.io.ByteArrayOutputStream()
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    def rec(id: Int, p: Array[Byte]): Unit = {
      out.write(le(4).putShort(id.toShort).putShort(p.length.toShort).array())
      out.write(p)
    }
    rec(0x0809, le(16).putShort(0x0600.toShort).putShort(0x0005.toShort)
      .putInt(0).putInt(0).putInt(0).array())
    rec(0x00FC, le(8).putInt(0).putInt(0).array())
    rec(0x000A, Array.emptyByteArray)
    rec(0x0809, le(16).putShort(0x0600.toShort).putShort(0x0010.toShort)
      .putInt(0).putInt(0).putInt(0).array())
    rec(0x00FD, le(10).putShort(1.toShort).putShort(0.toShort)
      .putShort(0.toShort).putInt(99).array())
    rec(0x000A, Array.emptyByteArray)
    val e3 = intercept[IllegalArgumentException](
      XlsTable.sheetRows(out.toByteArray, 1, Array[DataType](StringType)).toSeq)
    assert(e3.getMessage.contains("outside SST"))
    // the writer's own guards: row cap and oversized record
    val big = Iterator.tabulate(70000)(i => Row(i.toLong, "s", 0.0))
    val e4 = intercept[IllegalArgumentException](XlsTable.encode(schema, big))
    assert(e4.getMessage.contains("row cap"))
  }

  test("SST CONTINUE spill round-trips: mid-string splits, narrow+wide+empty") {
    // a tiny per-record budget forces many CONTINUEs and mid-string splits
    // on small data — the same decode path real >8224-byte exports hit
    val strs = Seq(
      "a" * 37,                        // narrow, splits mid-string
      "é→" + ("☃" * 29),               // wide, splits mid-string
      "",                              // empty string survives interning
      "short", "b" * 90, "mixed-" + ("ß" * 40))
    val rows = strs.zipWithIndex.map { case (s, i) => Row(i.toLong, s, i / 2.0) }
    val img = XlsTable.encode(schema, rows.iterator,
      Set.empty, Set.empty, sstBudget = 40)
    val got = XlsTable.sheetRows(XlsTable.workbookStream(img), 3,
      schema.fields.map(_.dataType)).toSeq
    assert(got == rows, s"spilled SST did not round-trip:\n$got")
    // and through the full distributed read at the production budget with
    // enough unique strings to exceed one 8224-byte record
    import spark.implicits._
    val many = (0 until 600).map(i => (i.toLong, s"unique-string-$i-" + "x" * 20, i * 0.5))
    val df = many.toDF("k", "s", "v")
    val dir = graft.Scratch.dir("xls_spill").toString
    XlsTable.write(df.coalesce(1), dir)
    val back = XlsTable.read(spark, dir, df.schema).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(back == many)
  }

  test("FORMULA cached values decode: numeric, string, boolean, blank") {
    import spark.implicits._
    val fSchema = StructType(Seq(
      StructField("k", LongType), StructField("fs", StringType),
      StructField("fn", DoubleType), StructField("fb", LongType)))
    val rows = Seq(
      Row(1L, "cached-str", 2.5, 1L),
      Row(2L, "", -0.75, 0L),          // empty string → blank tag 3
      Row(3L, "wide-™-☃", 1.0E15, 1L))
    val img = XlsTable.encode(fSchema, rows.iterator,
      formulaCols = Set("fs", "fn"), boolCols = Set("fb"), sstBudget = 8224)
    val got = XlsTable.sheetRows(XlsTable.workbookStream(img), 4,
      fSchema.fields.map(_.dataType)).toSeq
    assert(got == rows, s"formula cells did not decode:\n$got")
    // distributed end-to-end through writeFixture + read
    val df = rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
      r.getLong(3))).toDF("k", "fs", "fn", "fb")
    val dir = graft.Scratch.dir("xls_formula").toString
    XlsTable.writeFixture(df.coalesce(1), dir, Set("fs", "fn"), Set("fb"), 8224)
    val back = XlsTable.read(spark, dir, df.schema).collect()
      .map(r => Row(r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_.getLong(0)).toSeq
    assert(back == rows)
  }

  test("STRING record CONTINUE spill round-trips (narrow, wide, boundary)") {
    import spark.implicits._
    // the round-13 honest-reject is now a decode path: cached formula
    // strings longer than one record spill into CONTINUE and come back
    // exact. Tiny budget forces many mid-string splits on small data —
    // including encoding-preserving splits in wide strings.
    val fSchema = StructType(Seq(
      StructField("k", LongType), StructField("fs", StringType)))
    val strs = Seq(
      "n" * 97 + "#end",              // narrow, several CONTINUEs
      "→" + ("☃" * 61) + "#end",      // wide: flags byte re-emitted per split
      "exact" + "x" * 32,             // lands near a record boundary
      "tiny")                         // no spill at all
    val rows = strs.zipWithIndex.map { case (s, i) => Row(i.toLong, s) }
    val img = XlsTable.encode(fSchema, rows.iterator,
      formulaCols = Set("fs"), boolCols = Set.empty, sstBudget = 40)
    val got = XlsTable.sheetRows(XlsTable.workbookStream(img), 2,
      fSchema.fields.map(_.dataType)).toSeq
    assert(got == rows, s"spilled STRING did not round-trip:\n$got")
    // production budget end-to-end: a >8,221-byte narrow and a >4,110-char
    // wide string both exceed one 8,224-byte record
    val longRows = Seq(
      (1L, "a" * 9000 + "#end"),
      (2L, "→" * 5000 + "#end"))
    val df = longRows.toDF("k", "fs")
    val dir = graft.Scratch.dir("xls_bigstr").toString
    XlsTable.writeFixture(df.coalesce(1), dir, Set("fs"), Set.empty, 8224)
    val back = XlsTable.read(spark, dir, df.schema).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(back == longRows)
  }

  test("FORMULA's STRING record is found past SHRFMLA; errors reject by name") {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    def build(valueTag: Int, after: Seq[(Int, Array[Byte])]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def rec(id: Int, p: Array[Byte]): Unit = {
        out.write(le(4).putShort(id.toShort).putShort(p.length.toShort).array())
        out.write(p)
      }
      rec(0x0809, le(16).putShort(0x0600.toShort).putShort(0x0005.toShort)
        .putInt(0).putInt(0).putInt(0).array())
      rec(0x00FC, le(8).putInt(0).putInt(0).array())
      rec(0x000A, Array.emptyByteArray)
      rec(0x0809, le(16).putShort(0x0600.toShort).putShort(0x0010.toShort)
        .putInt(0).putInt(0).putInt(0).array())
      // row 1 col 0: FORMULA with a tagged (non-double) cached value
      rec(0x0006, le(22).putShort(1.toShort).putShort(0.toShort).putShort(0.toShort)
        .put(valueTag.toByte).put(0.toByte).put(7.toByte).put(new Array[Byte](3))
        .putShort(0xFFFF.toShort).putShort(0.toShort).putInt(0)
        .putShort(0.toShort).array())
      after.foreach { case (id, p) => rec(id, p) }
      rec(0x000A, Array.emptyByteArray)
      out.toByteArray
    }
    val txt = "fx".getBytes("ISO-8859-1")
    val strRec = le(3 + txt.length).putShort(2.toShort).put(0.toByte).put(txt).array()
    // SHRFMLA definition sits between FORMULA and STRING — must be skipped
    val ok = build(0, Seq((0x04BC, new Array[Byte](10)), (0x0207, strRec)))
    val got = XlsTable.sheetRows(ok, 1, Array[DataType](StringType)).toSeq
    assert(got == Seq(Row("fx")))
    // error-valued formula cell (tag 2, value byte 0x07 = #DIV/0!) rejects
    val err = build(2, Nil)
    val e1 = intercept[IllegalArgumentException](
      XlsTable.sheetRows(err, 1, Array[DataType](StringType)).toSeq)
    assert(e1.getMessage.contains("ERROR value 0x07"))
    // string-cached FORMULA with no STRING record following rejects
    val noStr = build(0, Nil)
    val e2 = intercept[IllegalArgumentException](
      XlsTable.sheetRows(noStr, 1, Array[DataType](StringType)).toSeq)
    assert(e2.getMessage.contains("STRING record"))
  }

  test("BOOLERR cells decode booleans and reject error values by name") {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    def build(value: Int, isErr: Boolean): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def rec(id: Int, p: Array[Byte]): Unit = {
        out.write(le(4).putShort(id.toShort).putShort(p.length.toShort).array())
        out.write(p)
      }
      rec(0x0809, le(16).putShort(0x0600.toShort).putShort(0x0005.toShort)
        .putInt(0).putInt(0).putInt(0).array())
      rec(0x00FC, le(8).putInt(0).putInt(0).array())
      rec(0x000A, Array.emptyByteArray)
      rec(0x0809, le(16).putShort(0x0600.toShort).putShort(0x0010.toShort)
        .putInt(0).putInt(0).putInt(0).array())
      rec(0x0205, le(8).putShort(1.toShort).putShort(0.toShort).putShort(0.toShort)
        .put(value.toByte).put(if (isErr) 1.toByte else 0.toByte).array())
      rec(0x000A, Array.emptyByteArray)
      out.toByteArray
    }
    val got = XlsTable.sheetRows(build(1, isErr = false), 1,
      Array[DataType](LongType)).toSeq
    assert(got == Seq(Row(1L)))
    val gotF = XlsTable.sheetRows(build(0, isErr = false), 1,
      Array[DataType](DoubleType)).toSeq
    assert(gotF == Seq(Row(0.0)))
    val e = intercept[IllegalArgumentException](
      XlsTable.sheetRows(build(0x07, isErr = true), 1,
        Array[DataType](LongType)).toSeq)
    assert(e.getMessage.contains("ERROR value 0x07"))
  }

  test("header inference decodes inline LABEL cells and rejects empty headers") {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    def stream(withHeader: Boolean): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def rec(id: Int, p: Array[Byte]): Unit = {
        out.write(le(4).putShort(id.toShort).putShort(p.length.toShort).array())
        out.write(p)
      }
      rec(0x0809, le(16).putShort(0x0600.toShort).putShort(0x0005.toShort)
        .putInt(0).putInt(0).putInt(0).array())
      rec(0x00FC, le(8).putInt(0).putInt(0).array())
      rec(0x000A, Array.emptyByteArray)
      rec(0x0809, le(16).putShort(0x0600.toShort).putShort(0x0010.toShort)
        .putInt(0).putInt(0).putInt(0).array())
      if (withHeader) {
        val n = "col_a".getBytes("ISO-8859-1")
        rec(0x0204, le(9 + n.length).putShort(0.toShort).putShort(0.toShort)
          .putShort(0.toShort).putShort(n.length.toShort).put(0.toByte)
          .put(n).array())
      }
      rec(0x0203, le(14).putShort(1.toShort).putShort(0.toShort)
        .putShort(0.toShort).putDouble(3.5).array())
      rec(0x000A, Array.emptyByteArray)
      out.toByteArray
    }
    assert(XlsTable.headerNames(stream(withHeader = true)) == Seq("col_a"))
    val e = intercept[IllegalArgumentException](
      XlsTable.headerNames(stream(withHeader = false)))
    assert(e.getMessage.contains("no column names"))
  }
}

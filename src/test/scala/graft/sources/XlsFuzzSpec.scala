package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Differential structure-fuzzer for the from-scratch `.xls` reader
  * (round-13 verdict item 5): the decode surface grew FORMULA/BOOLERR/
  * CONTINUE paths and a segment cursor, and its contract — "round-trip or
  * reject BY NAME, never guess, never crash with a JVM-internal error" —
  * was pinned only on hand-written cases. This spec generates a seeded,
  * fully deterministic corpus of mutations over valid images:
  *
  *   A. semantics-preserving re-encodings (every legal record budget →
  *      different SST/STRING CONTINUE split points) must round-trip EXACT;
  *   B. structural corruptions (truncations, record-length lies, cch
  *      inflation, mid-header CONTINUE splits, orphan STRING, stray
  *      CONTINUE, random byte flips in stream and container) must either
  *      parse (a mutated VALUE is fine — the bytes are data) or throw the
  *      engine's own named IllegalArgumentException — never an
  *      ArrayIndexOutOfBounds/NegativeArraySize/NPE/StackOverflow, and
  *      never hang.
  *
  * Every case's outcome class is compared against a COMMITTED manifest
  * (golden/xls_fuzz/manifest.txt) so a future reader change that silently
  * turns a named reject into a crash — or a parse into a reject — shows up
  * as a diff, the same way fuzz_golden.py pins the CSV dialect.
  * Regenerate with XLS_FUZZ_REGEN=1 after an intentional change.
  */
class XlsFuzzSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType),
    StructField("f", StringType), StructField("v", DoubleType)))
  private val types = schema.fields.map(_.dataType)

  /** Base rows: enough variety to touch every record family the writer
    * emits — SST strings narrow/wide/empty (LABELSST), string/numeric
    * formula cells incl. a spilled STRING, NUMBER, BLANK. */
  private val baseRows: Seq[Row] = Seq(
    Row(1L, "alpha", "fx-short", 1.5),
    Row(2L, "→☃ wide", "→" + ("☃" * 45) + "#end", -2.25),
    Row(3L, "", null, 0.0),
    Row(4L, "shared", "n" * 90 + "#end", 9.5),
    Row(5L, "shared", "", 100.0),
    Row(6L, "z" * 70, "mid", 0.125))

  private def image(budget: Int): Array[Byte] =
    XlsTable.encode(schema, baseRows.iterator,
      formulaCols = Set("f"), boolCols = Set.empty, sstBudget = budget)

  private def decode(stream: Array[Byte]): Seq[Row] =
    XlsTable.sheetRows(stream, schema.length, types).toSeq

  /** Outcome classes. A reject is "named" when it is the engine's own
    * IllegalArgumentException carrying a message — JVM-internal index/NPE
    * failures are crashes, full stop. */
  private def outcome(stream: Array[Byte], expected: Seq[Row]): String =
    try {
      val got = decode(stream)
      if (got == expected) "PARSE_EQUAL"
      else "PARSE_MUTATED" // a value byte changed — data, not structure
    } catch {
      case e: IllegalArgumentException
          if e.getMessage != null && e.getMessage.nonEmpty => "REJECT_NAMED"
      case _: Throwable => "CRASH"
    }

  /** Record boundaries of a BIFF stream: Seq of (offset, id, len). */
  private def records(stream: Array[Byte]): Seq[(Int, Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int, Int)]
    var p = 0
    def u16(o: Int) = (stream(o) & 0xFF) | ((stream(o + 1) & 0xFF) << 8)
    while (p + 4 <= stream.length) {
      val id = u16(p); val len = u16(p + 2)
      if (p + 4 + len > stream.length) return out.result()
      out += ((p, id, len))
      p += 4 + len
    }
    out.result()
  }

  // deterministic LCG (no java.util.Random — identical across JVMs)
  private final class Lcg(seed0: Long) {
    private var s = seed0
    def next(bound: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % bound).toInt + bound) % bound
    }
  }

  private def le16(stream: Array[Byte], off: Int, v: Int): Unit = {
    stream(off) = (v & 0xFF).toByte
    stream(off + 1) = ((v >> 8) & 0xFF).toByte
  }

  test("family A: every legal budget re-split round-trips exact") {
    // 16 is the floor the writer accepts; each budget lands the CONTINUE
    // splits elsewhere, including inside wide characters' neighborhoods
    for (budget <- Seq(16, 17, 19, 23, 29, 40, 64, 100, 8224)) {
      val got = decode(XlsTable.workbookStream(image(budget)))
      assert(got == baseRows, s"budget $budget did not round-trip")
    }
  }

  /** The shared mutation corpus over the workbook STREAM — deterministic
    * ids and ordering (the committed manifest is keyed by them). */
  private def streamMutations(base: Array[Byte]): Seq[(String, Array[Byte])] = {
    val recs = records(base)
    val results = Seq.newBuilder[(String, Array[Byte])]
    def run(id: String, mutated: Array[Byte]): Unit = results += (id -> mutated)

    // 1. truncations: every record boundary, plus ±1/±2 around it, plus
    // seeded random cuts — a cut stream must reject by name or (when the
    // cut is after the sheet's EOF record) still parse
    recs.foreach { case (off, _, _) =>
      Seq(off, off + 1, off + 2).filter(c => c > 0 && c < base.length)
        .foreach { c => run(s"trunc@$c", java.util.Arrays.copyOf(base, c)) }
    }
    val r1 = new Lcg(0x5eed1)
    (0 until 40).foreach { i =>
      val c = 1 + r1.next(base.length - 1)
      run(s"trunc_rand$i@$c", java.util.Arrays.copyOf(base, c))
    }

    // 2. record-length lies: grow/shrink each record's declared length
    recs.foreach { case (off, id, len) =>
      Seq(-3, -1, 1, 7, 200).foreach { d =>
        val v = len + d
        if (v >= 0 && v <= 0xFFFF) {
          val m = base.clone()
          le16(m, off + 2, v)
          run(f"len@$off+0x$id%04X$d%+d", m)
        }
      }
    }

    // 3. cch lies in the SST: inflate/deflate the first string's length
    val sstOff = recs.collectFirst { case (o, 0x00FC, _) => o }.get
    Seq(1, 60, 5000, 0xFFFF).foreach { v =>
      val m = base.clone()
      le16(m, sstOff + 12, v) // cch of the first SST string
      run(s"sst_cch=$v", m)
    }

    // 4. mid-header CONTINUE splits: re-split the SST record's payload at
    // EVERY offset of its first 24 bytes — splits landing inside a string
    // header must reject by name; splits at char boundaries may parse
    // (the leading byte is read as option flags: data-indistinguishable,
    // which is exactly why the outcome class is pinned, not guessed)
    val (so, _, slen) = recs.collectFirst { case r @ (_, 0x00FC, _) => r }.get
    (1 until math.min(24, slen)).foreach { k =>
      val head = base.slice(so + 4, so + 4 + k)
      val tail = base.slice(so + 4 + k, so + 4 + slen)
      val m = new java.io.ByteArrayOutputStream()
      m.write(base, 0, so)
      m.write(Array[Byte](0xFC.toByte, 0, (k & 0xFF).toByte, ((k >> 8) & 0xFF).toByte))
      m.write(head)
      m.write(Array[Byte](0x3C, 0, (tail.length & 0xFF).toByte,
        ((tail.length >> 8) & 0xFF).toByte))
      m.write(tail)
      m.write(base, so + 4 + slen, base.length - (so + 4 + slen))
      run(s"sst_split@$k", m.toByteArray)
    }

    // 5. orphan STRING / stray CONTINUE records in the sheet substream:
    // unknown-in-context records are length-skipped, rows unchanged
    val sheetEof = recs.reverse.collectFirst { case (o, 0x000A, _) => o }.get
    def inject(name: String, id: Int, payload: Array[Byte]): Unit = {
      val m = new java.io.ByteArrayOutputStream()
      m.write(base, 0, sheetEof)
      m.write(Array[Byte]((id & 0xFF).toByte, ((id >> 8) & 0xFF).toByte,
        (payload.length & 0xFF).toByte, ((payload.length >> 8) & 0xFF).toByte))
      m.write(payload)
      m.write(base, sheetEof, base.length - sheetEof)
      run(name, m.toByteArray)
    }
    inject("orphan_string", 0x0207, Array[Byte](2, 0, 0, 'h', 'i'))
    inject("stray_continue", 0x003C, Array[Byte](0, 'x'))
    inject("orphan_shrfmla", 0x04BC, new Array[Byte](10))

    // 6. seeded random single-byte flips across the whole stream
    val r2 = new Lcg(0xf1e1d)
    (0 until 120).foreach { i =>
      val pos = r2.next(base.length)
      val m = base.clone()
      m(pos) = (m(pos) ^ (1 << r2.next(8))).toByte
      run(s"flip$i@$pos", m)
    }
    results.result()
  }

  /** Container-level mutations of the CFB image (same determinism rules). */
  private def imageMutations(img: Array[Byte]): Seq[(String, Array[Byte])] = {
    val results = Seq.newBuilder[(String, Array[Byte])]
    val r3 = new Lcg(0xcfb)
    (0 until 60).foreach { i =>
      val pos = r3.next(img.length)
      val m = img.clone()
      m(pos) = (m(pos) ^ (1 << r3.next(8))).toByte
      results += (s"cfb_flip$i@$pos" -> m)
    }
    (0 until 20).foreach { i =>
      val c = 1 + r3.next(img.length - 1)
      results += (s"cfb_trunc$i@$c" -> java.util.Arrays.copyOf(img, c))
    }
    results.result()
  }

  test("family B: corpus of structural mutations matches the committed manifest") {
    val img = image(40)
    val base = XlsTable.workbookStream(img)
    val all =
      streamMutations(base).map { case (id, m) => id -> outcome(m, baseRows) } ++
      imageMutations(img).map { case (id, m) =>
        // container mutants go through the CFB extractor first
        id -> (try outcome(XlsTable.workbookStream(m), baseRows)
               catch {
                 case e: IllegalArgumentException
                     if e.getMessage != null && e.getMessage.nonEmpty =>
                   "REJECT_NAMED"
                 case _: Throwable => "CRASH"
               })
      }
    val crashes = all.filter(_._2 == "CRASH")
    assert(crashes.isEmpty,
      s"${crashes.length} mutations crashed with JVM-internal errors " +
        s"(first 10): ${crashes.take(10).map(_._1).mkString(", ")}")

    val manifestText = all.map { case (k, v) => s"$k $v" }.mkString("", "\n", "\n")
    val committed = Paths.get("src/test/resources/golden/xls_fuzz/manifest.txt")
    if (sys.env.contains("XLS_FUZZ_REGEN")) {
      Files.createDirectories(committed.getParent)
      Files.writeString(committed, manifestText,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      info(s"manifest regenerated: ${all.size} cases")
    } else {
      assert(Files.exists(committed),
        "committed manifest missing — run once with XLS_FUZZ_REGEN=1")
      val want = Files.readString(committed)
      assert(manifestText == want,
        "fuzz outcomes drifted from the committed manifest — inspect the " +
          "diff; if the reader change is intentional, regenerate with " +
          "XLS_FUZZ_REGEN=1")
    }
  }

  test("family C: header inference never crashes on the same corpus") {
    // the DSv2 surface runs headerNames over USER files for schema
    // inference — the walk has its own record loop and its own requires,
    // so it gets the same crash-freedom contract as the row decode
    val img = image(40)
    val base = XlsTable.workbookStream(img)
    val cases = streamMutations(base).map { case (id, m) => (id, () => m) } ++
      imageMutations(img).map { case (id, m) =>
        (id, () => XlsTable.workbookStream(m))
      }
    val crashes = cases.flatMap { case (id, mk) =>
      try { XlsTable.headerNames(mk()); None }
      catch {
        case e: IllegalArgumentException
            if e.getMessage != null && e.getMessage.nonEmpty => None
        case _: Throwable => Some(id)
      }
    }
    assert(crashes.isEmpty,
      s"${crashes.length} mutations crashed header inference " +
        s"(first 10): ${crashes.take(10).mkString(", ")}")
  }
}

package graft

import java.nio.charset.Charset
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{CsvSink, CsvSource}
import graft.spec.FileSpec

/** Source/sink format coverage beyond the reference's hardcoded UTF-8+comma
  * (SURVEY §1.3.6: we honor the spec's delimiter/encoding): semicolon
  * delimiter, Latin-1 encoding, JSON lines round-trip. */
class FormatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CsvSource honors spec delimiter and encoding (';' + ISO-8859-1)") {
    val f = Files.createTempDirectory("fmt").resolve("latin.csv")
    val content = "name;ville\nRené;Orléans\nZoé;Nîmes\n"
    Files.write(f, content.getBytes(Charset.forName("ISO-8859-1")))
    val df = CsvSource.read(spark, f.toString,
      FileSpec("l", "l", delimiter = ";", encoding = "ISO-8859-1"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(df.columns.toSeq == Seq("name", "ville"))
    assert(rows == Seq(("René", "Orléans"), ("Zoé", "Nîmes")))
  }

  test("CsvSink writes spec delimiter; round-trips through CsvSource") {
    val out = Files.createTempDirectory("fmt").resolve("out.csv").toString
    val df = Seq(("a", "1;5", "x"), ("b", "2", "y")).toDF("k", "v", "w")
    CsvSink.writeSingleFile(df, Seq("k", "v", "w"), out, delimiter = ";")
    val txt = Files.readString(java.nio.file.Paths.get(out))
    assert(txt.startsWith("k;v;w"))
    assert(txt.contains("\"1;5\""), s"embedded delimiter not quoted:\n$txt")
    val back = CsvSource.read(spark, out, FileSpec("o", "o", delimiter = ";"))
    assert(back.collect().map(_.mkString("|")).sorted.toSeq ==
      Seq("a|1;5|x", "b|2|y"))
  }

  test("k19: MoR read equals its compaction; the delete commit rewrites no data file") {
    val sf = TestSpark.sf
    val out = SparkEntry.queries("k19_mor_delete")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // the merge-on-read view and its materialization are the same table
    assert(out(1)._2 == out(2)._2 && out(1)._3 == out(2)._3,
      s"MoR read != compacted read: ${out.toSeq}")
    assert(out(0)._2 > out(1)._2, "delete removed no rows")
    val root = Scratch.staged(s"orders_mor#$sf", "mor_orders")(_ =>
      fail("k19 fixture was not staged by the query"))
    def mf(v: Int) = Files.readString(
        java.nio.file.Paths.get(s"$root/manifest_$v.txt"))
      .split("\n").map(_.split("\t")).map(a => (a(0), a(1), a(2))).toSeq
    val (m1, m2, m3) = (mf(1), mf(2), mf(3))
    // the delete commit references the SAME data files as the base —
    // O(deleted keys) written, zero data rewritten
    assert(m1.map(e => (e._1, e._2)) == m2.map(e => (e._1, e._2)),
      "delete commit changed a data-file reference")
    assert(m2.count(_._3 != "-") == 1, "exactly one partition is dirty")
    // compaction drops the delete ref and swaps exactly the dirty dir
    assert(m3.forall(_._3 == "-"), "compaction left a delete ref")
    assert((m3.map(_._2).toSet -- m1.map(_._2).toSet).size == 1,
      "compaction must swap exactly one partition dir")
  }

  test("k20: spec evolution rewrites no history; the month query's scan shrinks") {
    val sf = TestSpark.sf
    val out = SparkEntry.queries("k20_partition_evolution")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // both specs hold the identical table
    assert(out("v1_rows") == out("v2_rows") &&
           out("v1_sum_cents") == out("v2_sum_cents"))
    // same month answer, smaller scan under the evolved spec
    assert(out("month_sum_cents_v1") == out("month_sum_cents_v2"))
    assert(out("month_rows_scanned_v2") < out("month_rows_scanned_v1"),
      "month granularity must prune below the year dir")
    // history keeps its layout: every non-hot-year dir is SHARED verbatim
    val root = Scratch.staged(s"orders_pev#$sf", "pev_orders")(_ =>
      fail("k20 fixture was not staged by the query"))
    def dirs(v: Int) = Files.readString(
        java.nio.file.Paths.get(s"$root/manifest_$v.txt"))
      .split("\n").map(_.split("\t")).map(a => (a(0), a(2))).toSeq
    val yearDirs1 = dirs(1).filter(_._1 == "year").map(_._2).toSet
    val yearDirs2 = dirs(2).filter(_._1 == "year").map(_._2).toSet
    assert(yearDirs2.subsetOf(yearDirs1), "evolution rewrote an old year dir")
    assert(dirs(2).exists(_._1 == "month"), "no month-layout entries landed")
  }

  test("k13: version-1 read is isolated from the v2 commit; storage shared copy-on-write") {
    import org.apache.spark.sql.functions.{count, expr, lit, sum}
    val sf = TestSpark.sf
    val out = SparkEntry.queries("k13_time_travel")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // v1, read AFTER v2 committed, must equal the base table exactly —
    // the snapshot-isolation property
    val base = Tables(spark, sf).orders
      .agg(count(lit(1)), sum(expr("cast(round(o_totalprice * 100) as bigint)")))
      .head
    assert(out(0) == (1L, base.getLong(0), base.getLong(1)), s"v1 drifted: ${out(0)}")
    // v2 touches only the earliest year: same row count, larger total
    assert(out(1)._2 == out(0)._2, "copy-on-write changed row count")
    assert(out(1)._3 > out(0)._3, "v2 correction not visible")
    // the two manifests share every untouched year's files (copy-on-write
    // storage sharing); exactly one entry differs
    val root = Scratch.staged(s"orders_tt#$sf", "tt_orders")(_ =>
      fail("k13 fixture was not staged by the query"))
    def mf(v: Int) = Files.readString(
      java.nio.file.Paths.get(s"$root/manifest_$v.txt")).split("\n").toSet
    val (m1, m2) = (mf(1), mf(2))
    assert(m1.size == m2.size && (m1 diff m2).size == 1,
      s"expected exactly one rewritten entry: ${m1 diff m2}")
  }

  test("JSON lines round-trip preserves events rows") {
    val src = Tables(spark, TestSpark.sf).events
      .select($"event_id", $"user_id", $"event_type", $"value", $"props")
      .orderBy($"event_id").limit(200)
    val dir = Files.createTempDirectory("fmt").resolve("ev_json").toString
    src.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
      .select($"event_id", $"user_id", $"event_type", $"value", $"props")
    assert(back.collect().map(_.mkString("|")).sorted.toSeq ==
      src.collect().map(_.mkString("|")).sorted.toSeq)
  }

  test("Avro round-trip: per-partition container files, nulls + all flat types") {
    val src = Seq(
      (1L, Some(1.5), Some("a"), Some(true), Some(7), Some(2.5f)),
      (2L, None, None, None, None, None),
      (3L, Some(-0.25), Some("héllo;τ"), Some(false), Some(-1), Some(0f)))
      .toDF("id", "d", "s", "b", "i", "f").repartition(3)
    val dir = Scratch.dir("fmt_avro").resolve("ev_avro").toString
    graft.sources.AvroTable.write(src, dir)
    // one container file per write partition
    val parts = new java.io.File(dir).list().count(_.matches("part-\\d{5}\\.avro"))
    assert(parts == 3, s"expected 3 part files, got $parts")
    val back = graft.sources.AvroTable.read(spark, dir, src.schema)
    assert(back.schema == src.schema)
    assert(back.collect().map(_.mkString("|")).sorted.toSeq ==
      src.collect().map(_.mkString("|")).sorted.toSeq)
  }

  test("ORC round-trip preserves schema (incl. timestamp/double) and rows") {
    val src = Tables(spark, TestSpark.sf).events
      .select($"event_id", $"ts", $"event_type", $"value")
      .orderBy($"event_id").limit(200)
    val dir = Files.createTempDirectory("fmt").resolve("ev_orc").toString
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // ORC carries its own schema — no inference: dtypes must be identical
    assert(back.schema == src.schema, s"schema drift: ${back.schema} vs ${src.schema}")
    assert(back.collect().map(_.mkString("|")).sorted.toSeq ==
      src.collect().map(_.mkString("|")).sorted.toSeq)
  }

  test("k15: each codec actually encodes its files (extension + footprint)") {
    // run the entry first — it stages all three codec dirs per (JVM, sf)
    assert(SparkEntry.queries("k15_codec_sweep")(spark, TestSpark.sf).count() > 0)
    Seq("snappy" -> ".snappy.parquet", "zstd" -> ".zstd.parquet",
        "gzip" -> ".gz.parquet").foreach { case (codec, ext) =>
      // same memo key as the entry — returns the already-staged path
      val p = Scratch.staged(s"k15_$codec#${TestSpark.sf}", s"k15_$codec") {
        _ => fail(s"$codec dir must already be staged by the entry")
      }
      val ls = Files.list(java.nio.file.Paths.get(p))
      val parts = try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("part-")).toList
      } finally ls.close()
      assert(parts.nonEmpty, s"$codec wrote no part files")
      assert(parts.forall(_.endsWith(ext)),
        s"$codec parts must end with $ext: $parts")
    }
  }

  test("k17: disjoint rebases converge under either commit order; the overlap abort leaves no trace") {
    import org.apache.spark.sql.functions.{count, expr, lit, sum}
    val sf = TestSpark.sf
    def v3(tag: String, order: Seq[String]): (Long, Long) = {
      val root = catalog.Formats.commitRace(spark, sf, order, tag)
      assert(!Files.exists(java.nio.file.Paths.get(s"$root/manifest_4.txt")),
        s"$tag: the aborted writer committed a manifest")
      Seq("a", "b", "c").foreach { w =>
        assert(!Files.exists(java.nio.file.Paths.get(s"$root/inflight_$w.txt")),
          s"$tag: in-flight marker for $w leaked")
      }
      val dirs = Files.readString(java.nio.file.Paths.get(s"$root/manifest_3.txt"))
        .split("\n").toSeq.map(_.split("\t")(1))
      val r = spark.read.parquet(dirs: _*)
        .agg(count(lit(1)),
             sum(expr("cast(round(o_totalprice * 100) as bigint)"))).head()
      (r.getLong(0), r.getLong(1))
    }
    // a-first: A wins the CAS, B rebases; b-first: B wins, A rebases —
    // disjoint-partition rebases must land the SAME final table
    val abc = v3("abc", Seq("a", "b", "c"))
    val bac = v3("bac", Seq("b", "a", "c"))
    assert(abc == bac, s"final table diverged by commit order: $abc vs $bac")
  }

  test("k24: xlsx round-trips XML-escaped strings, nulls, and sparse rows") {
    val dir = Scratch.dir("xlsx").toString
    val df = Seq(
      (1L, Option("a<b&c>\"d\""), Option(2.5)),
      (2L, Option.empty[String], Option(1.0)),
      (3L, Option("müller & sons"), Option.empty[Double]),
      (4L, Option.empty[String], Option.empty[Double])
    ).toDF("id", "s", "x").repartition(2)
    graft.sources.XlsxTable.write(df, dir)
    // the package is a structurally valid OOXML zip (all five parts)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".xlsx"))
    assert(files.length == 2)
    val zf = new java.util.zip.ZipFile(files.head)
    try {
      val names = zf.entries().asIterator()
      val got = scala.collection.mutable.Set[String]()
      while (names.hasNext) got += names.next().getName
      assert(Set("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml")
        .subsetOf(got.toSet), s"missing OOXML parts: $got")
    } finally zf.close()
    val back = graft.sources.XlsxTable.read(spark, dir, df.schema)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.toString), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .sortBy(_._1).toSeq
    val want = Seq(
      (1L, Some("a<b&c>\"d\""), Some(2.5)),
      (2L, None, Some(1.0)),
      (3L, Some("müller & sons"), None),
      (4L, None, None))
    assert(back == want, s"xlsx round-trip diverged: $back")
  }

  test("k25: xml round-trips escaped text, nulls, and element order") {
    val dir = Scratch.dir("xmlrt").toString
    val df = Seq(
      (1L, Option("a<b&c> d"), Option(2.5)),
      (2L, Option.empty[String], Option(1.0)),
      (3L, Option("ümlaut & <tag>"), Option.empty[Double])
    ).toDF("id", "s", "x").repartition(2)
    graft.sources.XmlTable.write(df, dir)
    val back = graft.sources.XmlTable.read(spark, dir, df.schema)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.toString),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
      .sortBy(_._1).toSeq
    assert(back == Seq(
      (1L, Some("a<b&c> d"), Some(2.5)),
      (2L, None, Some(1.0)),
      (3L, Some("ümlaut & <tag>"), None)), back.toString)
    // name-matching, not position: a reader schema with reordered fields
    // still lands values in the right slots
    val reordered = org.apache.spark.sql.types.StructType(Seq(
      df.schema("x"), df.schema("id"), df.schema("s")))
    val re = graft.sources.XmlTable.read(spark, dir, reordered)
      .collect().map(r => (r.getLong(1),
        Option(r.get(2)).map(_.toString))).sortBy(_._1).toSeq
    assert(re == Seq((1L, Some("a<b&c> d")), (2L, None),
      (3L, Some("ümlaut & <tag>"))), re.toString)
  }

  test("e33: torn commit replays to convergence; re-delivery appends nothing") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sf
    val work = Scratch.dir("e33spec")
    val store = work.resolve("store").toString
    // PRE-TEAR the store: an epoch_0 dir full of WRONG data but NO
    // manifest — the state a crash between store write and manifest
    // commit leaves behind. The replay must overwrite it, not skip it
    // and not double it.
    spark.range(5).select(lit(999999L).as("o_orderkey"),
        lit(1.0).as("o_totalprice"))
      .write.mode("overwrite").parquet(s"$store/epoch_0")
    val out = catalog.Streams.runLakehouseSink(spark, sf, store,
      work.resolve("ckpt").toString).collect()
    assert(out.length == 3, s"expected 3 committed epochs, got ${out.length}")
    // the torn garbage is gone: epoch 0's committed content is the real
    // range (the decoy rows would add 5 rows of orderkey 999999)
    assert(!out.exists(_.getLong(1) == 5L),
      "torn epoch_0 content leaked into the committed store")
    val totalRows = out.map(_.getLong(1)).sum
    val expect = Tables(spark, sf).orders.count()
    assert(totalRows == expect, s"committed rows $totalRows != input $expect")
    // AT-LEAST-ONCE RE-DELIVERY: replay an already-committed epoch by
    // hand — the manifest guard must make it a no-op (same version, same
    // totals)
    def curVer: Int = java.nio.file.Files.list(java.nio.file.Paths.get(store))
      .toArray.map(_.toString.split("/").last)
      .filter(_.startsWith("manifest_"))
      .map(_.stripPrefix("manifest_").stripSuffix(".txt").toInt).max
    val vBefore = curVer
    val batch0 = spark.read.parquet(s"$store/epoch_0")
    catalog.Streams.commitEpoch(batch0, 0L, store)
    assert(curVer == vBefore, "re-delivered epoch produced a new manifest")
    catalog.Streams.commitEpoch(batch0, 2L, store)
    assert(curVer == vBefore, "re-delivered epoch 2 produced a new manifest")
  }

  test("k21: op tags separate data change from layout change (the compaction trap)") {
    val sf = TestSpark.sf
    // run the query once so the staged manifests exist
    val out = SparkEntry.queries("k21_incremental_scan")(spark, sf).collect()
    val inc = out.find(_.getString(0) == "incremental").get
    val diff = out.find(_.getString(0) == "diff").get
    assert(inc.getLong(1) == diff.getLong(1) && inc.getLong(2) == diff.getLong(2),
      "incremental read diverged from the snapshot delta")
    // the staged root is memoized per-JVM under this key — the query run
    // above filled it, so the write lambda must never fire here
    val root = graft.Scratch.staged(s"orders_inc#$sf", "inc_orders") { _ =>
      fail("k21 staging was not memoized by the query run")
    }
    def dirs(v: Int) = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$root/manifest_$v.txt"))
      .split("\n").toSeq
      .map { l => val Array(op, d) = l.split("\\|", 2); (op, d) }
    val v1Dirs = dirs(1).map(_._2).toSet
    val fileLevelNew = dirs(2).filter(e => !v1Dirs.contains(e._2))
    // the file-level diff contains BOTH the append and the compaction
    assert(fileLevelNew.map(_._1).toSet == Set("append", "rewrite"),
      s"fixture lost the compaction decoy: $fileLevelNew")
    // a consumer reading every new dir would re-emit the compacted rows
    val naive = spark.read.parquet(fileLevelNew.map(_._2): _*).count()
    assert(naive > inc.getLong(1),
      "the compaction decoy is empty — the op tag is not load-bearing")
  }
}

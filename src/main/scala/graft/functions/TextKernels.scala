package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** x1 aggregate token counts (field names become struct fields). */
final case class TokenStats(n_tokens: Long, n_distinct: Long, sum_token_len: Long)

/** x2 quality-count components. */
final case class QualityCounts(n_tokens: Long, punct_cnt: Long, digit_cnt: Long, stop_cnt: Long)

/** x8 repetition-signal components. */
final case class RepetitionCounts(n_words: Long, n_distinct: Long, top_bigram_n: Long)

/** Compiled kernels for the per-row dedup / similarity signature math.
  *
  * These implement EXACTLY the arithmetic documented in graft.catalog.Tx
  * (and mirrored in the DuckDB oracle SQL): serial left-folds over the same
  * element order, integer mod-P hashing, IEEE double accumulation. A compiled
  * JVM function and the oracle's interpreter therefore produce bitwise
  * identical results.
  *
  * Why not pure Catalyst higher-order functions? Two reasons, both measured
  * (sf0.1 bench):
  *  1. HOF lambdas are interpreted per element — no whole-stage codegen.
  *  2. CollapseProject inlines a projected alias into every downstream
  *     reference, so a signature expression referencing `hs` 16-32 times
  *     re-runs the whole tokenize→hash pipeline 16-32× per row (observed:
  *     a single sf0.1 task >10 min in regex-split eval). Compiled kernels
  *     run the pipeline once per row, ~100× faster; in a production engine
  *     these would be codegen'd Catalyst Expressions (same contract).
  *
  * Scale: every kernel is per-row (scan → project), embarrassingly parallel;
  * at 100 TB parallelism comes from input splits, no shuffle is introduced.
  */
object TextKernels extends Serializable {
  final val P = 2147483647L

  /** 16 fixed affine minhash functions h_i(x) = (a_i*x + b_i) mod P —
    * the single source of truth (catalog SQL generators read this). */
  val AB: Seq[(Long, Long)] =
    (0 until 16).map { i => ((2L * i + 1) * 12582917L % P, (i * 40503L * 104729L + 7L) % P) }

  final val NBands = 4
  final val RowsPerBand = 4

  // precompiled patterns (round-14): String.replaceAll / String.split
  // re-compile their regex on EVERY call — per row, per call site. The
  // compiled Pattern paths below are the exact same JDK regex semantics.
  private val NonAzSpace = java.util.regex.Pattern.compile("[^a-z ]")
  private val SpaceRuns = java.util.regex.Pattern.compile(" +")

  /** == split(trim(regexp_replace(lower(text), '[^a-z ]', '')), ' +')
    * (split with limit -1, matching Spark/DuckDB regex split semantics). */
  def tokenize(text: String): Array[String] =
    SpaceRuns.split(
      NonAzSpace.matcher(text.toLowerCase).replaceAll("").trim, -1)

  /** serial polynomial hash: fold(chars, 0, (a, c) => (a*31 + c) mod P). */
  def polyHash(s: String): Long = {
    var a = 0L
    var i = 0
    while (i < s.length) { a = (a * 31 + s.charAt(i)) % P; i += 1 }
    a
  }

  /** second independent hash stream (multiplier 37) — the extra 31 bits
    * the 62-bit simhash needs. */
  def polyHash2(s: String): Long = {
    var a = 0L
    var i = 0
    while (i < s.length) { a = (a * 37 + s.charAt(i)) % P; i += 1 }
    a
  }

  /** 62-bit simhash from two independent 31-bit hash streams: bit j (j<31)
    * from the ±1 sum over hs1's bit j, bit 31+j from hs2's bit j. The
    * wide signature keeps 16-bit pigeonhole blocks selective at large
    * corpus sizes (d10), where 32-bit/8-bit blocks saturate. */
  def simhash62(hs1: Array[Long], hs2: Array[Long]): Long = {
    var out = 0L
    var j = 0
    while (j < 31) {
      var s1 = 0L; var i = 0
      while (i < hs1.length) { s1 += ((hs1(i) >> j) & 1L) * 2 - 1; i += 1 }
      if (s1 > 0) out |= 1L << j
      var s2 = 0L; i = 0
      while (i < hs2.length) { s2 += ((hs2(i) >> j) & 1L) * 2 - 1; i += 1 }
      if (s2 > 0) out |= 1L << (31 + j)
      j += 1
    }
    out
  }

  /** ALL (non-distinct) word 4-gram shingles of the token array — the
    * multiset Tx.shinglesAllExpr(4) generates (occurrence counts matter
    * where shingles become tf weights, d16). */
  def shingles4All(ws: Array[String]): Array[String] =
    if (ws.length < 4) Array.empty
    else Array.tabulate(ws.length - 3) { p =>
      s"${ws(p)} ${ws(p + 1)} ${ws(p + 2)} ${ws(p + 3)}"
    }

  /** distinct word 4-gram shingles of the token array. */
  def shingles4(ws: Array[String]): Array[String] =
    shingles4All(ws).distinct

  /** 16-slot minhash signature over base hashes (empty → P per slot). */
  def minhash16(hs: Array[Long]): Array[Long] =
    AB.map { case (a, b) =>
      if (hs.isEmpty) P
      else {
        var m = Long.MaxValue
        var i = 0
        while (i < hs.length) { val v = (a * hs(i) + b) % P; if (v < m) m = v; i += 1 }
        m
      }
    }.toArray

  /** band hashes: fold RowsPerBand signature slots per band. */
  def bands4(sig: Array[Long]): Array[Long] =
    Array.tabulate(NBands) { b =>
      var acc = 0L
      var j = 0
      while (j < RowsPerBand) { acc = (acc * 1000003 + sig(b * RowsPerBand + j)) % P; j += 1 }
      acc
    }

  /** 32-bit frequency-weighted simhash over per-token hashes: bit j set iff
    * the ±1 sum of hash-bit j over all tokens is > 0. */
  def simhash32(hs: Array[Long]): Long = {
    val sums = new Array[Long](32)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < 32) { sums(j) += ((h >> j) & 1L) * 2 - 1; j += 1 }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) { if (sums(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  /** serial left-fold dot product (doubles, identical IEEE op order to the
    * oracle's list_reduce). */
  def dotd(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = a.length
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** 16-bit random-hyperplane LSH signature: bit j = [v · h_j > 0], where
    * h_j[i] = ±1 from bit 16 of a fixed linear mix of (1-based) element
    * index i and plane j — identical arithmetic to the oracle SQL. */
  def lshSig16(v: Seq[Double]): Long = {
    var out = 0L
    var j = 0
    while (j < 16) {
      var s = 0.0
      var i = 1
      val n = v.length
      while (i <= n) {
        val sign = ((((i * 2654435761L + j * 998244353L) / 65536) % 2) * 2 - 1).toDouble
        s += v(i - 1) * sign
        i += 1
      }
      if (s > 0) out |= 1L << j
      j += 1
    }
    out
  }

  // ---- Column-level wrappers --------------------------------------------

  /** text → distinct 4-token shingle strings. */
  val shinglesUdf: Column => Column =
    { val f = udf((t: String) => shingles4(tokenize(t))); c: Column => f(c) }

  /** text → polyhashes of distinct 4-token shingles. */
  val shingleHashesUdf: Column => Column =
    { val f = udf((t: String) => shingles4(tokenize(t)).map(polyHash)); c: Column => f(c) }

  /** text → polyhashes of ALL (non-distinct) 4-token shingles — the
    * compiled twin of explode(Tx.shinglesAllExpr(4)) + Tx.polyHash, whose
    * interpreted per-char fold was d16's hot loop (round-14). */
  val shingleHashesAllUdf: Column => Column =
    { val f = udf((t: String) => shingles4All(tokenize(t)).map(polyHash))
      c: Column => f(c) }

  /** text → 16-slot minhash signature. */
  val minhashUdf: Column => Column =
    { val f = udf((t: String) => minhash16(shingles4(tokenize(t)).map(polyHash)))
      c: Column => f(c) }

  /** 16-slot signature → 4 band hashes. */
  val bandsUdf: Column => Column =
    { val f = udf((sig: Seq[Long]) => bands4(sig.toArray)); c: Column => f(c) }

  /** text → 32-bit simhash (frequency-weighted tokens). */
  val simhashUdf: Column => Column =
    { val f = udf((t: String) => simhash32(tokenize(t).map(polyHash))); c: Column => f(c) }

  /** text → 62-bit simhash (frequency-weighted tokens, two hash streams). */
  val simhash62Udf: Column => Column =
    { val f = udf { (t: String) =>
        val ws = tokenize(t)
        simhash62(ws.map(polyHash), ws.map(polyHash2))
      }
      c: Column => f(c) }

  /** float embedding → double vector (exact widening). */
  val toDoubleVecUdf: Column => Column =
    { val f = udf((v: Seq[Float]) => v.map(_.toDouble)); c: Column => f(c) }

  /** serial-fold dot product of two double vectors. */
  val dotUdf: (Column, Column) => Column =
    { val f = udf((a: Seq[Double], b: Seq[Double]) => dotd(a, b))
      (x: Column, y: Column) => f(x, y) }

  /** double vector → 16-bit random-hyperplane LSH signature. */
  val lshSigUdf: Column => Column =
    { val f = udf((v: Seq[Double]) => lshSig16(v)); c: Column => f(c) }

  /** text → min polynomial hash over all char-8-grams of the normalized
    * text (x4 winnowing-style fingerprint): positions 1..max(len-7, 1),
    * substring(p, 8) truncating at the end like SQL substring. */
  val minFingerprintUdf: Column => Column =
    { val f = udf { (t: String) =>
        val nt = NonAzSpace.matcher(t.toLowerCase).replaceAll("").trim
        val n = math.max(nt.length - 7, 1)
        var m = Long.MaxValue
        var p = 1
        while (p <= n) {
          val h = polyHash(nt.substring(p - 1, math.min(p + 7, nt.length)))
          if (h < m) m = h
          p += 1
        }
        m
      }
      c: Column => f(c) }

  /** text → (n_tokens, n_distinct, sum_token_len) in one tokenize pass. */
  val tokenStatsUdf: Column => Column =
    { val f = udf { (t: String) =>
        val ws = tokenize(t)
        TokenStats(ws.length, ws.distinct.length, ws.map(_.length.toLong).sum)
      }
      c: Column => f(c) }

  /** text → quality-count components in one pass; `stop` is the stopword set. */
  def qualityCountsUdf(stop: Set[String]): Column => Column = {
    val f = udf { (t: String) =>
      val ws = tokenize(t)
      // char classes mirror the oracle regexes exactly:
      // punct = [^a-zA-Z0-9 ], digit = [0-9]
      var punct = 0L
      var digit = 0L
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        val alnumSp = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == ' '
        if (!alnumSp) punct += 1
        if (c >= '0' && c <= '9') digit += 1
        i += 1
      }
      QualityCounts(math.max(ws.length, 1), punct, digit, ws.count(stop))
    }
    c: Column => f(c)
  }

  /** text → (n_words, n_distinct, max bigram frequency) in one pass — the
    * integer components of the Gopher-style repetition signals (fraction in
    * the top word bigram, duplicate-word fraction). */
  val repetitionUdf: Column => Column =
    { val f = udf { (t: String) =>
        val ws = tokenize(t)
        val bg = new scala.collection.mutable.HashMap[String, Long]()
        var i = 0
        while (i < ws.length - 1) {
          val k = ws(i) + " " + ws(i + 1)
          bg.update(k, bg.getOrElse(k, 0L) + 1)
          i += 1
        }
        RepetitionCounts(ws.length, ws.distinct.length,
          if (bg.isEmpty) 0L else bg.values.max)
      }
      c: Column => f(c) }

  /** text → predicted language: marker-word counts; label l wins if its
    * score >= max of all LATER labels' scores (fixed tiebreak order, same
    * as the oracle's nested CASE). */
  def predictLangUdf(markers: Seq[(String, Seq[String])]): Column => Column = {
    val sets = markers.map { case (l, ws) => (l, ws.toSet) }
    val f = udf { (t: String) =>
      val ws = tokenize(t)
      val scores = sets.map { case (l, set) => (l, ws.count(set)) }
      @annotation.tailrec
      def pick(rest: List[(String, Int)]): String = rest match {
        case (l, _) :: Nil => l
        case (l, s) :: tail => if (s >= tail.map(_._2).max) l else pick(tail)
        case Nil => ""
      }
      pick(scores.toList)
    }
    c: Column => f(c)
  }
}

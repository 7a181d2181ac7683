package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs
import Tx.dotSql

/** In-engine spherical k-means coarse quantizer for the ANN / near-dup
  * blocking paths (replaces round-1's `label` / first-k-seed stand-ins —
  * north-star mandate, no reference citation).
  *
  * Determinism across engines AND across parallelism: float sums are
  * order-sensitive, so Lloyd's update runs on INTEGER-quantized components
  * — q_i = round(v_i * 2^24) — whose per-cell sums are exact under any
  * shuffle order. Centroid means convert back to doubles as
  * (exact int)/(exact int), one IEEE division, bitwise identical in Spark,
  * the JVM driver, and DuckDB; the assignment cosine is the shared
  * serial-fold dot product (Tx.dotSql / VectorExprs), so argmax cells match
  * bitwise. Ties break on cell asc via lexicographic min of (-cos, cell).
  *
  * Precondition: vectors (and therefore seeds) are non-zero — a zero seed
  * would make its cosine NaN, and NaN ordering differs between the literal
  * (array_min: NaN last) and join (ORDER BY DESC: NaN first) assignment
  * paths. The embeddings table satisfies this; a production ingest should
  * drop zero-norm vectors before training.
  *
  * Scale shape (100 TB) — the MLlib-KMeans loop structure:
  *  - centroids are k×dim driver state (tiny), inlined as LITERALS into the
  *    assignment expression: assignment is a pure per-row projection — no
  *    join, no window, NO shuffle;
  *  - each update is one map-side-combined integer aggregate shuffling k
  *    rows of (dim longs);
  *  - iterations are a small fixed count (T=2 here);
  *  - an emptied cell simply drops out (mirrored on both engines).
  */
object Quantizer {

  /** 2^24 — float32-origin components scale into exact-in-double integers. */
  final val Scale = 16777216.0

  /** cell id + mean vector + its squared norm (serial-fold). */
  final case class Centroid(cell: Int, cv: Array[Double], cn2: Double)

  /** Adds `q` (integer-quantized copy of `v`) — input must have
    * (vec_id, v: array<double>, norm2). */
  def withQ(e: DataFrame): DataFrame =
    e.withColumn("q", expr(s"transform(v, x -> cast(round(x * $Scale) as bigint))"))

  /** Target mean cell population: cells scale with the table so the
    * within-cell quadratic rerank stays O(N · CellTarget), not O(N²/k) —
    * the 10× soak showed fixed k=8 going 6× superlinear. */
  final val CellTarget = 625L

  /** k = max(8, N / CellTarget), identically derived in the SQL twin. */
  def kFor(n: Long): Int = math.max(8L, n / CellTarget).toInt

  /** Memoized centroids for the embeddings table under `dir` — the trained
    * quantizer is deterministic model state, so queries sharing
    * (dir, iters, dim) (d5, v3) train once per session. k adapts to the
    * table size via kFor. */
  private val trained =
    new scala.collection.concurrent.TrieMap[(String, Int, Int), Seq[Centroid]]

  def centroidsFor(e: DataFrame, dir: String, iters: Int, dim: Int): Seq[Centroid] =
    trained.getOrElseUpdate((dir, iters, dim),
      centroids(withQ(e), kFor(e.count()), iters, dim))

  /** Centroids trained on the DETERMINISTIC SAMPLE vec_id % mod == 0 — the
    * 100 TB shape: Lloyd's passes touch 1/mod of the table (k still sized
    * for the FULL population, seeds = the first k sample members, ids
    * 0, mod, …, (k−1)·mod), and only the final assignment reads everything.
    * The SQL twin (`centroidsSql(…, sampleMod)`) mirrors the same filter,
    * so the trained model stays bitwise-matched. */
  def centroidsSampledFor(e: DataFrame, dir: String, iters: Int, dim: Int,
                          mod: Int): Seq[Centroid] =
    trained.getOrElseUpdate((s"$dir#m$mod", iters, dim), {
      val k = kFor(e.count())
      val train = withQ(e.filter(pmod(col("vec_id"), lit(mod)) === 0))
      centroids(train, k, iters, dim, seedBound = k.toLong * mod)
    })

  /** Memoized centroids trained on an already-filtered INDEX subset (v8's
    * incremental add-batch: the model is fixed state trained when the index
    * was built; incoming batches only assign against it). `tag` keys the
    * memo per index definition; k is sized for the index population. */
  def centroidsOnIndexFor(indexE: DataFrame, dir: String, tag: String,
                          iters: Int, dim: Int): Seq[Centroid] =
    trained.getOrElseUpdate((s"$dir#$tag", iters, dim),
      centroids(withQ(indexE), kFor(indexE.count()), iters, dim))

  private def serialDot(a: Array[Double], b: Array[Double]): Double = {
    // identical op order to Tx.dotSql / VectorExprs.dot: left fold of a+x_i
    var acc = 0.0; var i = 0
    while (i < a.length) { acc = acc + a(i) * b(i); i += 1 }
    acc
  }

  private def centroid(cell: Int, n: Long, sums: Array[Long]): Centroid = {
    val denom = n.toDouble * Scale
    val cv = sums.map(_.toDouble / denom)
    Centroid(cell, cv, serialDot(cv, cv))
  }

  /** Per-row cosine against a literal centroid. */
  private def cosTo(c: Centroid): Column =
    VectorExprs.cosine(col("v"), typedLit(c.cv), col("norm2"), lit(c.cn2))

  /** Above this k, the literal-centroid expression (k × dim constants in
    * one codegen'd projection) gets too large to compile well; assignment
    * switches to a broadcast-join + per-key window (the classic IVF
    * assignment shape — still no data-sized shuffle key, the window groups
    * are k rows per vector). */
  final val LiteralMax = 16

  /** All cells sorted nearest-first for the current row: array of
    * (neg = -cos, cell) structs, ascending — lexicographic struct order
    * gives (cos desc, cell asc). A pure projection, no shuffle. */
  def sortedCells(cents: Seq[Centroid]): Column =
    array_sort(array(cents.map(c =>
      struct((-cosTo(c)).as("neg"), lit(c.cell).as("cell"))): _*))

  private def centsDf(e: DataFrame, cents: Seq[Centroid]): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    cents.map(c => (c.cell, c.cv.toSeq, c.cn2)).toDF("cell", "cv", "cnorm2")
  }

  /** The native-kernel twin of `sortedCells` (round 14): centroid matrix
    * as ONE reference object instead of k×dim literals — tiny plan, tight
    * codegen'd argmin, and `nullable` no longer baits constraint
    * propagation into duplicating the whole expression into a Filter
    * (QuantizerKernelSpec pins kernel == literal form bitwise). */
  private def kernelCol(cents: Seq[Centroid], nProbe: Int): Column =
    graft.functions.QuantizerKernels.nearestCells(
      col("v"), col("norm2"),
      cents.map(_.cell), cents.map(_.cv),
      cents.map(c => java.lang.Math.sqrt(c.cn2)), nProbe)

  private def kernelColArray(cents: Seq[Centroid], nProbe: Int): Column =
    graft.functions.QuantizerKernels.nearestCellsArray(
      col("v"), col("norm2"),
      cents.map(_.cell), cents.map(_.cv),
      cents.map(c => java.lang.Math.sqrt(c.cn2)), nProbe)

  /** `nProbe` nearest cells per row (cos desc, cell asc): input columns +
    * `cell`, one row per probed cell. */
  def probe(e: DataFrame, cents: Seq[Centroid], nProbe: Int): DataFrame = {
    val keep = e.columns.map(col) :+ col("cell")
    if (cents.size <= LiteralMax)
      e.withColumn("cell", explode(kernelColArray(cents, nProbe)))
        .select(keep: _*)
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("_ccos").desc, col("cell"))
      e.crossJoin(broadcast(centsDf(e, cents)))
        .withColumn("_ccos",
          VectorExprs.cosine(col("v"), col("cv"), col("norm2"), col("cnorm2")))
        .withColumn("_crank", row_number().over(w))
        .filter(col("_crank") <= nProbe)
        .select(keep: _*)
    }
  }

  /** Nearest-cell assignment: literal-expression projection for small k
    * (array_min of (-cos, cell) structs, zero shuffle), broadcast-join +
    * window argmin for large k. */
  def assign(e: DataFrame, cents: Seq[Centroid]): DataFrame =
    if (cents.size <= LiteralMax)
      // coalesce makes `cell` provably non-nullable (the kernel only yields
      // null for a null vector, which the precondition excludes), so the
      // downstream cell equi-joins infer no isnotnull filter — the literal
      // form paid a full duplicate assignment evaluation there
      e.withColumn("cell", coalesce(kernelCol(cents, 1), lit(-1)))
    else probe(e, cents, 1)

  /** Final centroids after `iters` Lloyd updates from the first-k init
    * (init centroid = its seed's quantized vector, mean of a 1-row cell).
    * The quantized input is cached across the 1+`iters` passes (the MLlib
    * KMeans pattern) and released before returning. */
  def centroids(eq0: DataFrame, k: Int, iters: Int, dim: Int,
                seedBound: Long = -1L): Seq[Centroid] = {
    val eq = eq0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try centroidsOn(eq, k, iters, dim, if (seedBound < 0) k.toLong else seedBound)
    finally eq.unpersist(blocking = false)
  }

  private def centroidsOn(eq: DataFrame, k: Int, iters: Int, dim: Int,
                          seedBound: Long): Seq[Centroid] = {
    val init = eq.filter(col("vec_id") < seedBound)
      .select(col("vec_id").cast("int").as("cell"), col("q"))
      .collect()
      .map(r => centroid(r.getInt(0), 1L, r.getSeq[Long](1).toArray))
      .sortBy(_.cell).toSeq
    (1 to iters).foldLeft(init) { (cents, _) =>
      val sums = (0 until dim).map(i => sum(element_at(col("q"), i + 1)).as(s"s$i"))
      assign(eq, cents)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
        .map { r =>
          centroid(r.getInt(0), r.getLong(1),
            (0 until dim).map(i => r.getLong(2 + i)).toArray)
        }
        .sortBy(_.cell).toSeq
    }
  }

  // ---- DuckDB twin: generated CTE chain over an existing `e(vec_id, v,
  // norm2)` relation; final centroid CTE is named `kmc`. ----

  private def cosSql(v: String, cv: String, n2: String, cn2: String): String =
    s"${dotSql(v, cv)} / (sqrt($n2) * sqrt($cn2))"

  /** CTE fragment: `kq` (quantized vectors), per-iteration assign/update
    * CTEs, final centroids `kmc(cell, cv, cnorm2)`. k is derived from the
    * table size exactly like the Spark side's kFor. */
  def centroidsSql(iters: Int, dim: Int, sampleMod: Int = 1): String = {
    // mod == 1 keeps the unsampled SQL byte-identical (d5/v3 oracles)
    val trainFilter = if (sampleMod > 1) s" WHERE t.vec_id % $sampleMod = 0" else ""
    val seedBound =
      if (sampleMod > 1) s"(SELECT k FROM kk) * $sampleMod" else "(SELECT k FROM kk)"
    val seedFilter = if (sampleMod > 1) s"vec_id % $sampleMod = 0 AND " else ""
    val sb = new StringBuilder
    // MATERIALIZED: DuckDB inlines plain CTEs at every reference (the v14
    // lesson) — kq is read by every assign pass + kcells (up to 4x), and
    // kmc/kcells are read 2-3x by the pair/verdict oracles; each inline
    // would replay the whole Lloyd chain. Values are unchanged; at the
    // 100x soak this is the difference between one 64M-row assign pass
    // and an OOM-killed re-evaluation storm.
    sb ++= s"""kq AS MATERIALIZED (
      SELECT vec_id, v, norm2,
             list_transform(v, x -> CAST(round(x * $Scale) AS BIGINT)) AS q
      FROM e),
    kk AS (SELECT greatest(8, COUNT(*) // $CellTarget) AS k FROM e),
    kd0 AS (
      SELECT cell, cv, ${dotSql("cv", "cv")} AS cnorm2 FROM (
        SELECT vec_id AS cell,
               list_transform(q, x -> x::DOUBLE / (1::BIGINT::DOUBLE * $Scale)) AS cv
        FROM kq WHERE ${seedFilter}vec_id < $seedBound) z)"""
    for (t <- 1 to iters) {
      val prev = s"kd${t - 1}"
      val sums = (0 until dim).map(i => s"sum(q[${i + 1}])::BIGINT").mkString(", ")
      sb ++= s""",
    ka$t AS (
      SELECT k.vec_id, k.q, z.cell FROM (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY acos DESC, cell) AS crank
          FROM (SELECT t.vec_id, c.cell,
                       ${cosSql("t.v", "c.cv", "t.norm2", "c.cnorm2")} AS acos
                FROM kq t CROSS JOIN $prev c$trainFilter) pp) zz
        WHERE crank = 1) z
      JOIN kq k ON k.vec_id = z.vec_id),
    kc$t AS (SELECT cell, count(*)::BIGINT AS n, [$sums] AS sq
      FROM ka$t GROUP BY cell),
    kd$t AS (
      SELECT cell, cv, ${dotSql("cv", "cv")} AS cnorm2 FROM (
        SELECT cell, list_transform(sq, x -> x::DOUBLE / (n::DOUBLE * $Scale)) AS cv
        FROM kc$t) w)"""
    }
    sb ++= s""",
    kmc AS MATERIALIZED (SELECT cell, cv, cnorm2 FROM kd$iters)"""
    sb.toString
  }

  /** CTE fragment for the final assignment over `kmc`:
    * `kcells(vec_id, v, norm2, cell)`. */
  /** The argmax windows above and here keep their sort input NARROW —
    * (vec_id, cell) plus the computed cos sort key; the 64-dim q/v list
    * payloads join back on vec_id AFTER crank = 1. With the lists riding
    * the sort, the 100x soak's 64M-row assignment window materialized
    * >40 GB of spill per pass (the round-7 oracle wall); narrow, the sort
    * carries ~24 B/row and the whole pass fits in memory. Same rows, same
    * tiebreaks — only the payload routing changes. */
  def cellsSql: String = s""",
    kcells AS MATERIALIZED (
      SELECT k.vec_id, k.v, k.norm2, z.cell FROM (
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY acos DESC, cell) AS crank
          FROM (SELECT t.vec_id, c.cell,
                       ${cosSql("t.v", "c.cv", "t.norm2", "c.cnorm2")} AS acos
                FROM kq t CROSS JOIN kmc c) pp) zz
        WHERE crank = 1) z
      JOIN kq k ON k.vec_id = z.vec_id)"""
}

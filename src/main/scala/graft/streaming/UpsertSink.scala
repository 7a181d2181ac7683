package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TABLE-BACKED keyed upsert target for the e16 foreachBatch sink — the
  * MERGE INTO every production foreachBatch sink implements (a Delta/
  * Iceberg MERGE, a JDBC upsert), expressed as the engine's own u6 FULL
  * OUTER merge shape (catalog/Relational.scala u6_merge_upsert) over a
  * versioned parquet table. Replaces the round-4 driver-map store: the
  * merge is a distributed join — NO per-batch collect(), so "active keys
  * per batch" can be 100 TB-unbounded and the sink shape still holds.
  *
  * Layout: `root/v<batchId>/` parquet dirs of (k, v, last_batch); the
  * highest committed version is current. Each applyBatch writes the merged
  * state to `_tmp_v<b>` and atomically renames to `v<b>` — readers never
  * see a half-written version. Older versions are pruned after commit.
  *
  * Semantics pinned here and by UpsertSinkSpec:
  *  - UPSERT: later batches overwrite a key's value (update-mode streams
  *    re-emit a key whenever its aggregate changes);
  *  - IDEMPOTENT REPLAY: state rows carry the batch id that last wrote
  *    them, and the merge takes the incoming value only when
  *    `last_batch < batchId` — re-running a failed/retried batch (Spark's
  *    at-least-once foreachBatch contract) re-merges the identical state,
  *    which is exactly how exactly-once sinks are built over foreachBatch.
  *
  * At 100 TB: one version = one keyed table; the FULL OUTER join shuffles
  * state + batch on the key (or co-partitions via bucketing), and version
  * pruning bounds storage at ~2 snapshots. A real deployment swaps the
  * rename for a transaction-log commit — the merge plan is unchanged.
  */
final class TableUpsertStore(root: String) {

  private def fs(s: SparkSession) =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def versions(s: SparkSession): Seq[(Long, Path)] = {
    val f = fs(s)
    val base = new Path(root)
    if (!f.exists(base)) Nil
    else f.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v"))
      .map(st => (st.getPath.getName.drop(1).toLong, st.getPath))
      .sortBy(_._1)
  }

  private def current(s: SparkSession): Option[DataFrame] =
    versions(s).lastOption.map { case (_, p) => s.read.parquet(p.toString) }

  /** Merge one micro-batch of (key, value) rows — first two columns of
    * `batch` — under batch-id idempotence. Fully distributed. */
  def applyBatch(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    import s.implicits._
    val inc = batch.select(batch.columns.take(2).map(col): _*).toDF("k", "iv")
    val fresh = $"iv".isNotNull && ($"last_batch".isNull || $"last_batch" < batchId)
    val merged = current(s) match {
      case None =>
        inc.select($"k", $"iv".as("v"), lit(batchId).as("last_batch"))
      case Some(cur) =>
        cur.select($"k", $"v".as("cv"), $"last_batch")
          .join(inc, Seq("k"), "full_outer")
          .select($"k",
            when(fresh, $"iv").otherwise($"cv").as("v"),
            when(fresh, lit(batchId)).otherwise($"last_batch").as("last_batch"))
    }
    val f = fs(s)
    val tmp = new Path(root, s"_tmp_v$batchId")
    merged.write.mode("overwrite").parquet(tmp.toString)
    val fin = new Path(root, s"v$batchId")
    if (f.exists(fin)) {
      // replayed batch whose version already committed: it merged the same
      // batch against the same predecessor state, so fin is identical —
      // keep it and drop the re-computation (never delete-then-rename:
      // that window would leave the store with ZERO committed versions)
      f.delete(tmp, true)
    } else if (!f.rename(tmp, fin)) {
      throw new java.io.IOException(s"upsert commit failed: $tmp -> $fin")
    }
    // prune only AFTER the new version is committed
    versions(s).dropRight(1).foreach { case (_, p) => f.delete(p, true) }
  }

  /** Current merged state as (k, v). */
  def snapshot(s: SparkSession): DataFrame =
    current(s).map(_.select(col("k"), col("v")))
      .getOrElse(s.emptyDataFrame.select(lit(0L).as("k"), lit(0L).as("v")).limit(0))

  /** Distinct batch ids that last wrote surviving keys — lets specs assert
    * a run REALLY spanned multiple micro-batches. k-distinct driver pull. */
  def batchIds(s: SparkSession): Set[Long] =
    current(s).map(_.select(col("last_batch")).distinct()
        .collect().map(_.getLong(0)).toSet)
      .getOrElse(Set.empty)
}

package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only optimization profiler (round 14, guide §1): per query, measure
  * wall seconds AND the job/stage/task shape so overhead-bound entries
  * (many tiny jobs/stages) separate from compute-bound ones (task time ≫
  * scheduling). Not part of the driver contract — Bench.scala is the
  * canonical artifact; this exists so plan changes are chosen empirically.
  *
  * Usage: runMain graft.ProfileBench [query,query,...]  (default: all).
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  * Output: one TSV line per query to stdout (prefixed PROF) and the full
  * table to /tmp/profile_bench.tsv.
  */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
    val shufR = new java.util.concurrent.atomic.AtomicLong(0)
    val shufW = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shufR.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        if (sys.env.contains("PROF_STAGES")) {
          val tm = s.stageInfo.taskMetrics
          println(f"STAGE ${s.stageInfo.stageId}%4d tasks=${s.stageInfo.numTasks}%4d " +
            f"run=${tm.executorRunTime / 1e3}%7.2fs cpu=${tm.executorCpuTime / 1e9}%7.2fs " +
            f"gc=${tm.jvmGCTime / 1e3}%5.2fs in=${tm.inputMetrics.bytesRead / 1e6}%8.1fMB " +
            f"sr=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB " +
            f"sw=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB  ${s.stageInfo.name.take(90)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
      }
    })
    try {
      SparkEntry.entry(spark).count()
      SparkEntry.queries.get("w1_row_number_topk")
        .foreach(_(spark, "/root/testdata/sf0.001").count())
    } catch { case _: Throwable => () }
    val only: Option[Set[String]] = args.lift(0).map(_.split(",").toSet)
    val (streamQ, batchQ) = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .partition(q => q._1.contains("_stream") ||
        q._1.startsWith("c10_") || q._1.startsWith("c12_"))
    val sb = new StringBuilder(
      "query\tsec\tjobs\tstages\ttasks\ttask_s\tshuf_mb\n")
    for ((name, fn) <- batchQ ++ streamQ) {
      // one warm rep (plan/codegen/stage costs absorbed), then measure
      val s0 = Scratch.stagingSeconds
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      val warmStage = Scratch.stagingSeconds - s0
      Seq(jobs, stages, tasks, taskMs, shufR, shufW).foreach(_.set(0))
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      spark.catalog.clearCache() // between-queries cache drop, as in Bench
      // listener events are async; give the bus a moment to drain
      Thread.sleep(60)
      val sec = (System.nanoTime() - t0) / 1e9
      val row = f"$name\t${if (ok) sec else -sec}%.3f\t${jobs.get}\t${stages.get}\t${tasks.get}\t${taskMs.get / 1e3}%.2f\t${(shufR.get + shufW.get) / 1e6}%.2f"
      println((if (warmStage > 0.05) f"PROF $row\tstaged=${warmStage}%.1f" else s"PROF $row"))
      sb.append(row).append('\n')
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/profile_bench.tsv"), sb.toString)
    spark.stop()
  }
}

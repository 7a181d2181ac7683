package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-run benchmark: times every SparkEntry query at the env-given SF and
  * prints ONE JSON line. A short untimed warmup (tiny-SF flagship query)
  * absorbs JVM/classloader/codegen cold-start so per-query numbers measure
  * the plans, not first-touch overhead. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // 83 queries share one JVM: without GC the ContextCleaner never
      // releases finished broadcasts/caches, execution memory shrinks and
      // later sorts spill — keep the cleaner ticking
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: exercise scan→shuffle→sort→window codegen paths once, untimed
    try {
      SparkEntry.entry(spark).count()
      SparkEntry.queries.get("w1_row_number_topk")
        .foreach(_(spark, "/root/testdata/sf0.001").count())
    } catch { case _: Throwable => () }
    // BENCH_r03 lesson: one timed pass is a noisy sample — a transient load
    // moment (GC, state-store teardown from a neighboring streaming run)
    // fabricated a 9× "regression" that a clean rerun didn't reproduce. Two
    // guards: (a) each query is timed `Reps` times and the MIN is reported
    // (min is the right estimator for plan cost — noise only ever adds);
    // (b) streaming entries run LAST, so their micro-batch harness teardown
    // can't sit inside any batch query's timing window.
    val Reps = 2
    // A failed query returns NEGATIVE elapsed time — a sentinel, so breakage
    // can't masquerade as a suspiciously fast success (BENCH_r05 finding #3).
    def timeOnce(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -((System.nanoTime() - t0) / 1e9).max(1e-3) }
    }
    // Optional comma-separated query filter (dev iterations on one plan);
    // the driver invokes with no args → full suite, contract unchanged.
    val only: Option[Set[String]] = args.lift(0).map(_.split(",").toSet)
    // c10/c12 drive real micro-batch streams too — keep every
    // stream-running entry in the trailing phase
    val (streamQ, batchQ) = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .partition(q => q._1.contains("_stream") ||
        q._1.startsWith("c10_") || q._1.startsWith("c12_"))
    val results = (batchQ ++ streamQ).map { case (name, fn) =>
      // min over reps, but only over SUCCESSFUL reps; all-failed → the
      // (negative) sentinel survives into the artifact
      val reps = (1 to Reps).map(_ => timeOnce(fn))
      val ok = reps.filter(_ >= 0)
      name -> (if (ok.nonEmpty) ok.min else reps.min)
    }
    val failed = results.collect { case (n, v) if v < 0 => n }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // Locale.ROOT: the f-interpolator uses the default locale, which would
    // emit decimal COMMAS on some JVMs and corrupt the JSON line
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def line(kv: Seq[(String, String)]): String = {
      val qs = kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","nqueries":${results.size},"failed":$fl}"""
    }
    // Full-name per-query times → a file (the driver's stdout tail capture is
    // ~2 KB; at 200+ queries even short-key lines front-truncate out of the
    // window → BENCH_r05 parsed:null). Stdout gets ONE SHORT FINAL line:
    // the parseable total plus only the 10 slowest queries.
    val full = line(results.map { case (k, v) => k -> r3(v) })
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "BENCH_LOCAL.json")), full + "\n")
    catch { case _: Throwable => () }
    val slowest = results.sortBy(-_._2).take(10)
    val shortLine = line(slowest.map { case (k, v) => k -> r3(v) })
    // Stop Spark BEFORE printing: session teardown logs WARNs (state-store
    // unload, temp-checkpoint cleanup) to stderr, and if the driver merges
    // streams those lines would land after the metric JSON. With the
    // session already down, the println is the last thing this JVM emits.
    spark.stop()
    println(shortLine)
    System.out.flush()
  }
}

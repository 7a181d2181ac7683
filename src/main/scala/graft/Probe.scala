package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries for N reps each on one warm session —
  * separates per-plan cost from JVM/suite crowding (BENCH drift triage).
  * Usage: runMain graft.Probe <reps> <query>[,<query>…]  (env
  * SPARK_GRAFT_SF_DIR selects the scale factor, default sf0.1). */
object Probe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("c2_export_shards"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warm FS + codegen
    for (name <- names; i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      printf("PROBE %s rep%d %.2f s (%d rows)%n", name, i, (System.nanoTime() - t0) / 1e9, n)
    }
    spark.stop()
  }
}

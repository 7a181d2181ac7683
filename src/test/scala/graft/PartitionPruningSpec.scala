package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** At 100 TB the events table is date-partitioned; a day-scoped query must
  * read only that day's files. This pins the layout contract: partitioned
  * write → partition filters in the scan, no full-table read. */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("date-partitioned events: day filter prunes to one partition") {
    val dir = Files.createTempDirectory("graft_part").resolve("events").toString
    Tables(spark, TestSpark.sf).events
      .withColumn("event_date", to_date($"ts"))
      .write.partitionBy("event_date").mode("overwrite").parquet(dir)

    val day = spark.read.parquet(dir)
      .filter($"event_date" === "2024-01-02")
    val plan = day.queryExecution.executedPlan.toString

    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_date"), s"no partition filter:\n$plan")
    // pruned scan must read strictly fewer files than the full table
    def scannedFiles(p: org.apache.spark.sql.DataFrame) =
      p.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.length // location files (unpruned listing)
      }.sum
    val dayRows = day.count()
    val allRows = spark.read.parquet(dir).count()
    assert(dayRows > 0 && dayRows < allRows)
    // physical proof: selectedPartitions metric — one partition directory
    val metrics = day.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metrics
    }.head
    day.count() // materialize metrics
    assert(metrics.get("numPartitions").exists(_.value <= 1),
      s"read more than one partition: ${metrics.get("numPartitions").map(_.value)}")
  }
}

package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** j9's contract: with NO manual salting, AQE's OptimizeSkewedJoin must
  * absorb a planted hot key — split the oversized shuffle partition and
  * replicate the matching side — while the join result stays exactly the
  * plain equi-join's. Thresholds are lowered to make the testdata-scale
  * skew visible; production keeps the defaults (a 100 TB hot key clears
  * them on its own). Complements j8, which keeps the manual hot/cold-split
  * pattern for when the hot set is known and pre-partitioning must hold. */
class AqeSkewJoinSpec extends AnyFunSuite {
  private lazy val base = TestSpark.spark

  test("planted hot key: AQE skew split fires and the result is unchanged") {
    val s = base.newSession()
    import s.implicits._
    import org.apache.spark.sql.functions._
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")

    val dir = Files.createTempDirectory("aqeskew").toString
    // 90% of fact rows share key 0 → that key's shuffle partition dwarfs
    // the median and clears the lowered skew thresholds. The per-row sha2
    // payload keeps the skewed partition's SHUFFLE bytes large — a bare
    // repeated key compresses below any threshold — and must survive into
    // the aggregate so it isn't pruned before the join shuffle.
    s.range(0, 300000)
      .select(when($"id" % 10 =!= 0, lit(0L)).otherwise($"id" % 3000).as("k"),
              sha2(concat(lit("x"), $"id".cast("string")), 256).as("payload"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    s.range(0, 3000)
      .select($"id".as("k"), concat(lit("p"), $"id" % 5).as("prio"))
      .write.mode("overwrite").parquet(s"$dir/dim")

    val agg = s.read.parquet(s"$dir/fact")
      .join(s.read.parquet(s"$dir/dim"), "k")
      .groupBy($"prio").agg(count(lit(1)).as("n"), max(length($"payload")).as("pl"))
    val rows = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // every fact row matches exactly one dim row; key 0 → prio "p0"
    assert(rows.values.sum == 300000L)
    assert(rows("p0") >= 270000L)

    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE skew-join split did not fire:\n$plan")
  }
}

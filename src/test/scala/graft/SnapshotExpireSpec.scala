package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** k16's physical-reclaim contract: after expiration the unreferenced
  * data directory and the expired manifest are GONE, while every
  * directory a retained manifest references survives — vacuum must
  * reclaim storage without touching live data.
  */
class SnapshotExpireSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("k16: unreferenced dirs reclaimed, referenced dirs intact") {
    import spark.implicits._
    // run the entry — it stages + expires once per (JVM, sf)
    val res = SparkEntry.queries("k16_snapshot_expire")(spark, sf).collect()
    assert(res.length == 3)
    assert(res(0).getLong(1) == -1L && res(0).getLong(2) == -1L,
      "version 1 must report unavailable")
    assert(res(1).getLong(1) > 0 && res(2).getLong(1) > 0)
    val root = Scratch.staged(s"orders_vac#$sf", "vac_orders") {
      _ => fail("store must already be staged by the entry")
    }
    assert(!Files.exists(Paths.get(s"$root/manifest_1.txt")),
      "expired manifest must be deleted")
    val retained = Seq(2, 3).flatMap(v =>
      Files.readString(Paths.get(s"$root/manifest_$v.txt")).split("\n")).toSet
    retained.foreach(d =>
      assert(Files.exists(Paths.get(d)), s"referenced dir $d must survive"))
    val ls = Files.list(Paths.get(root))
    val dataDirs = try ls.iterator().asScala
      .map(_.toString).filter(_.split("/").last.startsWith("y")).toSet
    finally ls.close()
    assert(dataDirs == retained,
      s"every surviving data dir must be referenced: ${dataDirs -- retained}")
    // the base version of the mutated year is the reclaimed one
    assert(dataDirs.exists(_.endsWith("_v2")) &&
           dataDirs.exists(_.endsWith("_v3")))
  }
}

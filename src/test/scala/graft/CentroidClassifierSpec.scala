package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x23's centroid classifier: on planted separable classes the held-out
  * routing must be perfect (the mechanism learns when signal exists — the
  * fixture embeddings carry none, so the catalog entry's value is the
  * confusion-matrix report itself); on the real fixture the prediction
  * must equal an independent plain-Scala twin. */
class CentroidClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("x23: planted separable classes route perfectly on the held-out split") {
    import spark.implicits._
    // class c lives on axis c with deterministic per-row jitter on axis 10+c
    val rows = (0L until 90L).map { id =>
      val cls = (id % 3).toInt
      val v = new Array[Double](16)
      v(cls) = 1.0
      v(10 + cls) = 0.1 + 0.01 * (id % 7).toDouble
      (id, v.toSeq, s"c$cls")
    }
    val df = rows.toDF("vec_id", "v", "lang")
    val out = graft.catalog.Text.centroidClassify(df, dim = 16).collect()
    assert(out.forall(r => r.getString(0) == r.getString(1)),
      s"misrouted rows: ${out.filter(r => r.getString(0) != r.getString(1)).mkString(",")}")
    assert(out.map(_.getLong(2)).sum == rows.count(_._1 % 5 == 0))
  }

  test("x23: fixture confusion matrix matches a plain-Scala twin") {
    import spark.implicits._
    val got = SparkEntry.queries("x23_centroid_classifier")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val labeled = Tables(spark, sf).embeddings
      .withColumn("v", $"embedding".cast("array<double>"))
      .select($"vec_id", $"v")
      .join(Tables(spark, sf).documents
        .select($"doc_id".as("vec_id"), $"lang"), Seq("vec_id"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getString(2)))
    val dim = labeled.head._2.length
    val sums = scala.collection.mutable.Map[String, Array[Long]]()
    labeled.filter(_._1 % 5 != 0).foreach { case (_, v, lang) =>
      val acc = sums.getOrElseUpdate(lang, new Array[Long](dim))
      var i = 0
      while (i < dim) { acc(i) += math.round(v(i) * catalog.Quantizer.Scale); i += 1 }
    }
    val cents = sums.toSeq.sortBy(_._1).map { case (lang, sq) =>
      val cv = sq.map(_.toDouble)
      var n2 = 0.0; var i = 0
      while (i < dim) { n2 += cv(i) * cv(i); i += 1 }
      (lang, cv, n2)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val want = scala.collection.mutable.Map[(String, String), Long]()
    labeled.filter(_._1 % 5 == 0).foreach { case (_, v, lang) =>
      val n2 = dot(v, v)
      // cos desc, lang asc — cents sorted by lang, strict > keeps first
      var best = ""; var bc = Double.NegativeInfinity
      cents.foreach { case (cl, cv, cn2) =>
        val cos = dot(v, cv) / (math.sqrt(n2) * math.sqrt(cn2))
        if (cos > bc) { bc = cos; best = cl }
      }
      want((lang, best)) = want.getOrElse((lang, best), 0L) + 1L
    }
    assert(got == want.toMap)
  }
}

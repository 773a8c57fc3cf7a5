package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val df = (1L to 20000L).map(i => (i % 1777, (i % 100).toDouble)).toDF("k", "v")

  test("hll distinct count within its rsd bound") {
    val approx = Sketches.approxDistinct(df, Seq("k"), rsd = 0.05)
      .as[Long].head()
    assert(math.abs(approx - 1777.0) / 1777.0 <= 0.05, s"approx=$approx")
  }

  test("gk quantiles within rank-error bound of exact") {
    val qs = Seq(0.1, 0.5, 0.9)
    val approx = Sketches.approxQuantiles(df, "v", qs, accuracy = 1000)
      .as[Seq[Double]].head()
    val exact = df.stat.approxQuantile("v", qs.toArray, 0.0) // relativeError=0 → exact
    approx.zip(exact).foreach { case (a, e) =>
      // rank error n/accuracy = 20 ranks ≈ 0.1% of values; values step by 1
      assert(math.abs(a - e) <= 1.0, s"approx=$a exact=$e")
    }
  }

  test("frequent items never miss a true heavy hitter") {
    val skewed = ((1 to 5000).map(_ => 42L) ++ (1L to 1000L)).toDF("k")
    val hits = Sketches.frequentItems(skewed, Seq("k"), support = 0.5)
      .as[Seq[Long]].head()
    assert(hits.contains(42L))
  }
}

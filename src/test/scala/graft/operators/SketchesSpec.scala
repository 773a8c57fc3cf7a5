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

  // the distributed formulation must be BIT-identical to the builtin —
  // a6's oracle parity rides on replicating Percentile.getPercentile's
  // exact double arithmetic, not on being "close"
  private def assertBitEqual(data: org.apache.spark.sql.DataFrame,
      c: String, qs: Seq[Double]): Unit = {
    val mine = Sketches.exactPercentiles(data, c, qs).as[Seq[Double]].head()
    val builtin = data
      .agg(expr(s"percentile($c, array(${qs.map(q => s"${q}D").mkString(",")}))"))
      .as[Seq[Double]].head()
    assert(mine.size == builtin.size)
    mine.zip(builtin).foreach { case (m, b) =>
      assert(java.lang.Double.doubleToLongBits(m) ==
        java.lang.Double.doubleToLongBits(b), s"mine=$m builtin=$b for qs=$qs")
    }
    spark.catalog.clearCache()
  }

  test("exactPercentiles is bit-identical to the builtin percentile") {
    val qs = Seq(0.0, 0.5, 0.9, 0.99, 1.0)
    // duplicates + irregular gaps + negative values
    val dup = ((1 to 500).map(i => (i % 37).toDouble * 1.7 - 3.3) ++
      Seq.fill(100)(5.1) ++ (1 to 99).map(_ * 0.001)).toDF("v")
    assertBitEqual(dup, "v", qs)
    // exact-integer interpolation positions: n = 101 → pos = q*100 integral
    val exact101 = (0 until 101).map(i => math.pow(1.1, i % 13) * i).toDF("v")
    assertBitEqual(exact101, "v", Seq(0.25, 0.5, 0.75))
    // nulls ignored, single distinct value, tiny n
    val withNulls = Seq[Option[Double]](Some(2.0), None, Some(2.0), None, Some(7.5))
      .toDF("v")
    assertBitEqual(withNulls, "v", qs)
    assertBitEqual(Seq(42.0).toDF("v"), "v", qs)
    // the contract fixture itself (sf0.001 lineitem)
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    assertBitEqual(li, "l_extendedprice", Seq(0.5, 0.9, 0.99))
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class ProfilingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val df = Seq(
    (Some(1L), Some("a"), Some(1.5)),
    (Some(2L), None, Some(2.5)),
    (Some(2L), Some("b"), None),
    (None, Some("b"), Some(-0.5))).toDF("id", "s", "v")

  test("profile: null/distinct/min/max per column, numeric vs string lanes") {
    val p = Profiling.profile(df, Seq("id", "v"), Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "v", "s"))
    val id = p("id")
    assert(id.getLong(1) == 4 && id.getLong(2) == 1) // rows, nulls
    assert(id.getLong(3) == 2)                       // distinct (1, 2)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 2.0)
    assert(id.isNullAt(6) && id.isNullAt(7))         // string lane empty
    val s = p("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) == "a" && s.getString(7) == "b")
    val v = p("v")
    assert(v.getDouble(4) == -0.5 && v.getDouble(5) == 2.5)
  }

  test("profile: exact path expands for multi-distinct, approx path does not") {
    def plan(approx: Boolean) = Profiling
      .profile(df, Seq("id", "v"), Seq("s"), approxDistinct = approx)
      .queryExecution.executedPlan.toString
    assert(plan(approx = false).contains("Expand"),
      "exact multi-column distinct should plan an Expand")
    assert(!plan(approx = true).contains("Expand"),
      "HLL sketches must aggregate without an Expand")
    // approx still lands in the right ballpark on this tiny input
    val a = Profiling.profile(df, Seq("id"), Nil, approxDistinct = true)
      .select("n_distinct").as[Long].head
    assert(a >= 1 && a <= 3)
  }

  test("profile: special characters in column names are data, not identifiers") {
    val weird = df.withColumnRenamed("id", "a b").withColumnRenamed("s", "it's.dotted")
    val p = Profiling.profile(weird, Seq("a b"), Seq("it's.dotted"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("a b", "it's.dotted"))
    assert(p("a b").getLong(3) == 2)
    assert(p("it's.dotted").getString(6) == "a")
  }

  test("profile: unknown column fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Profiling.profile(df, Seq("nope"), Nil)
    }
    assert(e.getMessage.contains("nope"))
  }
}

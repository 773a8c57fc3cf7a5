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

  test("profile: neither path plans an Expand (exact distincts run per-column)") {
    // the Expand shape (k distinct columns in one agg → k+1× scan rows
    // into one combined hash aggregate) spilled super-linearly at a 10×
    // corpus — SCALE_CURVE.md catch; exact distincts must run as
    // separate single-column two-phase aggregates instead
    def plan(approx: Boolean) = Profiling
      .profile(df, Seq("id", "v"), Seq("s"), approxDistinct = approx)
      .queryExecution.executedPlan.toString
    assert(!plan(approx = false).contains("Expand"),
      "exact distincts must run as per-column aggregates, never an Expand")
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

  test("corrMatrix: perfect, anti, and independent pairs hand-checked") {
    val d = Seq(
      (1.0, 2.0, -1.0, 5.0),
      (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0),
      (4.0, 8.0, -4.0, 5.0)).toDF("x", "y2x", "neg", "const")
    val m = Profiling.corrMatrix(d, Seq("x", "y2x", "neg", "const"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(m.size == 6)
    assert(m(("x", "y2x")) == (4L, Some(1.0)), "y = 2x is corr 1")
    assert(m(("x", "neg")) == (4L, Some(-1.0)), "y = -x is corr -1")
    assert(m(("x", "const"))._2.isEmpty, "zero variance -> null, not NaN")
    assert(m(("y2x", "neg")) == (4L, Some(-1.0)))
  }

  test("corrMatrix: pairwise-complete under nulls") {
    // (x, y) complete on 3 rows where both present; the null row in y
    // must not poison the (x, z) pair, which stays complete on 4
    val d = Seq(
      (Some(1.0), Some(1.0), Some(4.0)),
      (Some(2.0), Some(2.0), Some(3.0)),
      (Some(3.0), None, Some(2.0)),
      (Some(4.0), Some(4.0), Some(1.0))).toDF("x", "y", "z")
    val m = Profiling.corrMatrix(d, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(m(("x", "y")) == (3L, Some(1.0)), "3 complete rows, still exact corr 1")
    assert(m(("x", "z")) == (4L, Some(-1.0)))
    assert(m(("y", "z"))._1 == 3L)
  }

  test("corrMatrix: matches a hand-computed non-trivial value") {
    // x = 1..4, w = (1, 2, 4, 3): corr = 0.8 exactly
    val d = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 4.0), (4.0, 3.0)).toDF("x", "w")
    val r = Profiling.corrMatrix(d, Seq("x", "w")).collect().head
    assert(r.getDouble(3) == 0.8)
  }

  test("property: corrMatrix equals a driver-side exact-lattice reference bit-for-bit") {
    // The whole point of the operator is that any engine lands on the
    // same BYTES: exact integer sums, doubles only in the pinned final
    // closed form. A plain Scala replica of that recipe must agree
    // with == on doubles — no tolerance — across random data.
    val rnd = new scala.util.Random(77)
    val rows = (1 to 300).map(_ => (
      math.rint(rnd.nextDouble() * 10000) / 100.0,
      math.rint(rnd.nextGaussian() * 1000) / 100.0,
      math.rint(rnd.nextDouble() * 50)))
    def ref(xs: Seq[Double], ys: Seq[Double]): Option[Double] = {
      val xl = xs.map(v => math.rint(v * 10000).toLong)
      val yl = ys.map(v => math.rint(v * 10000).toLong)
      val n = xl.size.toDouble
      val sx = xl.sum.toDouble; val sy = yl.sum.toDouble
      val sxy = xl.zip(yl).map { case (a, b) => a * b }.sum.toDouble
      val sxx = xl.map(a => a * a).sum.toDouble
      val syy = yl.map(a => a * a).sum.toDouble
      val varx = n * sxx - sx * sx; val vary = n * syy - sy * sy
      val cov = n * sxy - sx * sy
      if (varx > 0 && vary > 0)
        Some(math.rint(cov / (math.sqrt(varx) * math.sqrt(vary)) * 1e6) / 1e6)
      else None
    }
    val df = rows.toDF("a", "b", "c")
    val got = Profiling.corrMatrix(df, Seq("a", "b", "c"), scale = 4, listwise = true)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val cols = Map("a" -> rows.map(_._1), "b" -> rows.map(_._2), "c" -> rows.map(_._3))
    for { (ca, cb) <- Seq(("a", "b"), ("a", "c"), ("b", "c")) } {
      assert(got((ca, cb)) == ref(cols(ca), cols(cb)),
        s"($ca,$cb): ${got((ca, cb))} vs ref ${ref(cols(ca), cols(cb))}")
    }
  }

  test("corrMatrix: listwise path equals pairwise on null-free data, drops rows under nulls") {
    val clean = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 7.0, -3.0))
      .toDF("x", "y", "z")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("col_a", "col_b").collect().map(_.toSeq).toSeq
    assert(rows(Profiling.corrMatrix(clean, Seq("x", "y", "z"), listwise = true)) ==
      rows(Profiling.corrMatrix(clean, Seq("x", "y", "z"))),
      "shared-sum listwise path must be exact on null-free data")
    // a null in ANY column drops the whole row in listwise mode
    val holey = Seq((Some(1.0), Some(1.0), Some(1.0)),
      (Some(2.0), None, Some(2.0)), (Some(3.0), Some(3.0), Some(3.0)))
      .toDF("x", "y", "z")
    val lw = Profiling.corrMatrix(holey, Seq("x", "y", "z"), listwise = true)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(lw.values.forall(_ == 2L), "listwise n counts only fully-complete rows")
    val pw = Profiling.corrMatrix(holey, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pw(("x", "z")) == 3L, "pairwise keeps the (x,z)-complete row listwise drops")
  }

  test("profile: a column in both lanes works identically pinned and unpinned") {
    // r11 review fix: with pinInput = true, a column listed in both
    // numericCols and stringCols used to duplicate its name in the
    // pinned projection → ambiguous-reference AnalysisException that
    // the unpinned path never raised
    def rows(pin: Boolean) =
      Profiling.profile(df, Seq("id", "v"), Seq("id", "s"), pinInput = pin)
        .collect().map(_.toString).sorted.toSeq
    assert(rows(pin = true) == rows(pin = false))
    // r12 review fix: the lane is decided by which input LIST the
    // occurrence came from, not name membership — a dual-lane column
    // yields ONE numeric row and ONE string row (it used to be
    // profiled numeric twice and never as string)
    val idRows = Profiling.profile(df, Seq("id", "v"), Seq("id", "s"))
      .collect().filter(_.getString(0) == "id")
    assert(idRows.length == 2, s"dual-lane id should profile twice: ${idRows.toSeq}")
    val (numLane, strLane) = idRows.partition(!_.isNullAt(4))
    assert(numLane.length == 1 && strLane.length == 1,
      s"expected one numeric-lane and one string-lane row: ${idRows.toSeq}")
    assert(numLane.head.getDouble(4) == 1.0 && numLane.head.isNullAt(6))
    assert(strLane.head.isNullAt(4) && !strLane.head.isNullAt(6))
  }

  test("profile: pinInput = true matches the unpinned results on a derived frame") {
    val derived = df.join(df.select(col("id").as("id2")), col("id") === col("id2"))
      .drop("id2")
    def rows(pin: Boolean) =
      Profiling.profile(derived, Seq("id", "v"), Seq("s"), pinInput = pin)
        .collect().map(_.toString).sorted.toSeq
    assert(rows(pin = true) == rows(pin = false))
  }
}

class TopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("perGroup: per-group ranks, measure-desc id-asc ties, short groups") {
    val d = Seq(
      ("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 9.0), ("a", 4L, 1.0),
      ("b", 5L, 2.0),
      ("c", 6L, 3.0), ("c", 7L, 3.0), ("c", 8L, 3.0))
      .toDF("g", "id", "m")
    val r = TopK.perGroup(d, Seq("g"), "m", "id", k = 2)
      .as[(String, Int, Long, Double)].collect().toSet
    assert(r == Set(
      ("a", 1, 2L, 9.0), ("a", 2, 3L, 9.0),   // tie -> lower id first
      ("b", 1, 5L, 2.0),                       // group smaller than k
      ("c", 1, 6L, 3.0), ("c", 2, 7L, 3.0)))   // all-ties -> id order
  }

  test("perGroup: multi-column grouping keeps all group keys") {
    val d = Seq((1, "x", 10L, 1.0), (1, "x", 11L, 2.0), (2, "y", 12L, 3.0))
      .toDF("g1", "g2", "id", "m")
    val r = TopK.perGroup(d, Seq("g1", "g2"), "m", "id", k = 1)
      .as[(Int, String, Int, Long, Double)].collect().toSet
    assert(r == Set((1, "x", 1, 11L, 2.0), (2, "y", 1, 12L, 3.0)))
  }
}

class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naive(corpus: Seq[(Long, String)], probes: Seq[(Long, String)],
      d: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    (for {
      (pid, ps) <- probes; (cid, cs) <- corpus
      dist = lev(ps, cs) if dist <= d
    } yield (pid, cid, dist)).toSet
  }

  private def run(corpus: Seq[(Long, String)], probes: Seq[(Long, String)],
      d: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.editDistanceJoin(
        corpus.toDF("id", "s"), probes.toDF("id", "s"), "id", "s", d)
      .as[(Long, Long, Int)].collect().toSet

  val corpus = Seq(
    1L -> "warehouse-north", 2L -> "warehouse-south", 3L -> "depot-east",
    4L -> "depot-west", 5L -> "hub-central", 6L -> "ab", 7L -> "abc")

  test("equals the naive cross-join at maxDist 1 (typos, exact, misses)") {
    val probes = Seq(
      10L -> "warehouse-nortj",  // 1 sub of corpus 1
      11L -> "depot-eastt",      // 1 insert of corpus 3
      12L -> "hub-central",      // exact
      13L -> "completely-other") // no match
    assert(run(corpus, probes, 1) == naive(corpus, probes, 1))
  }

  test("degenerate short probes route through length keys, stay complete") {
    // "ab" has 1 distinct 3-gram (< d*q+1 = 4) — the adversarial case
    // where every gram can be destroyed; must still find "abc"/"ab"
    val probes = Seq(20L -> "ab", 21L -> "abd", 22L -> "x")
    assert(run(corpus, probes, 1) == naive(corpus, probes, 1))
  }

  test("maxDist 2 equivalence (wider prefix, multi-edit matches)") {
    val probes = Seq(
      30L -> "warehuse-nort",    // 2 edits of corpus 1
      31L -> "depot-easterly")   // 4 edits — out
    assert(run(corpus, probes, 2) == naive(corpus, probes, 2))
  }

  test("maxDist 0 degenerates to exact string match") {
    val probes = Seq(40L -> "depot-west", 41L -> "depot-wes")
    assert(run(corpus, probes, 0) == Set((40L, 4L, 0)))
  }

  test("property: equals the naive join on random small-alphabet strings") {
    // Small alphabet maximizes shared q-grams and repeated-gram
    // degeneracy — the adversarial regime for count filtering. One
    // batch, fixed seed, d drawn per-probe comparison at both 1 and 2.
    val rnd = new scala.util.Random(4242)
    def randStr(): String = {
      val n = 1 + rnd.nextInt(12)
      (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    val corpus = (1L to 60L).map(i => i -> randStr())
    val probes = (100L to 140L).map(i => i -> randStr())
    Seq(1, 2).foreach { d =>
      assert(run(corpus, probes, d) == naive(corpus, probes, d),
        s"divergence from naive at maxDist=$d")
    }
  }

  test("property: cross-route completeness at a tiny variantCap") {
    // variantCap=8 pushes the deletion/gram boundary into the middle of
    // the 1..12-char length range (d=1: deletion ≤ 6 chars, gram > 6;
    // d=2: deletion ≤ 2, gram > 2), so this exercises BOTH routes and
    // every cross-boundary pairing — a probe on one route matching a
    // corpus string in the band the other route must also index. The
    // default-cap property test above, by contrast, runs entirely on
    // the deletion route.
    val rnd = new scala.util.Random(2026)
    def randStr(): String = {
      val n = 1 + rnd.nextInt(12)
      (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    val corpus = (1L to 60L).map(i => i -> randStr())
    val probes = (100L to 140L).map(i => i -> randStr())
    Seq(1, 2).foreach { d =>
      val got = FuzzyJoin.editDistanceJoin(
          corpus.toDF("id", "s"), probes.toDF("id", "s"), "id", "s", d,
          variantCap = 8)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == naive(corpus, probes, d),
        s"divergence from naive at maxDist=$d, variantCap=8")
    }
  }

  test("unicode: deletion variants count CHARACTERS, matching levenshtein") {
    // non-ASCII (2-byte and 3-byte UTF-8, surrogate-free) through the
    // deletion route: substring/length/levenshtein must all agree on
    // character (not byte) semantics or completeness breaks silently
    val corpus = Seq(1L -> "café-crème", 2L -> "日本語テキスト", 3L -> "naïve")
    val probes = Seq(
      10L -> "cafe-crème",   // 1 sub (é→e)
      11L -> "日本語テキス",   // 1 char deleted
      12L -> "naïves")       // 1 char inserted
    assert(run(corpus, probes, 1) == naive(corpus, probes, 1))
  }

  test("deletionMaxLen bounds the variant count at every d") {
    // d=1: len+1 variants; d=2: 1+len+C(len,2); the threshold is the
    // largest len still within cap
    assert(FuzzyJoin.deletionMaxLen(1, 4096) == 4095)
    val l2 = FuzzyJoin.deletionMaxLen(2, 4096)
    def v2(n: Long) = 1 + n + n * (n - 1) / 2
    assert(v2(l2) <= 4096 && v2(l2 + 1) > 4096, s"l2=$l2")
    assert(FuzzyJoin.deletionMaxLen(0, 1) > 1000000)
    // r9 review fix: the bound must hold at EVERY returned length, not
    // just lengths above d — at d >= 13 the old unvalidated len=d start
    // admitted strings with 2^d > cap variants
    def exactVariants(len: Int, d: Int): BigInt =
      (0 to math.min(d, len)).map(i =>
        (BigInt(len - i + 1) to BigInt(len)).product / (BigInt(1) to BigInt(i)).product).sum
    for (d <- Seq(13, 20, 40); cap <- Seq(64L, 4096L)) {
      val l = FuzzyJoin.deletionMaxLen(d, cap)
      assert(exactVariants(l, d) <= cap, s"d=$d cap=$cap len=$l admits too many")
      assert(exactVariants(l + 1, d) > cap, s"d=$d cap=$cap len=$l not maximal")
    }
    // a huge cap must not wrap the running binomial negative (which
    // would admit unboundedly long keys); the answer stays sane
    val big = FuzzyJoin.deletionMaxLen(30, Long.MaxValue / 2)
    assert(big > 0 && exactVariants(big, 30) <= Long.MaxValue / 2)
  }

  test("deletionMaxLen never wraps for ANY cap, including Long.MaxValue") {
    // r11 review fix: caps above Long.MaxValue/2 disarm the `sum > cap`
    // early-exit, so the accumulator needed its own add-overflow guard;
    // and cap == Long.MaxValue collides with the overflow sentinel
    // itself (clamped). The returned length must stay positive, finite,
    // and within the cap at every d.
    def exactVariants(len: Int, d: Int): BigInt =
      (0 to math.min(d, len)).map(i =>
        (BigInt(len - i + 1) to BigInt(len)).product / (BigInt(1) to BigInt(i)).product).sum
    for (d <- Seq(2, 13, 30, 62, 63, 64);
         cap <- Seq(Long.MaxValue / 2 + 1, Long.MaxValue - 1, Long.MaxValue)) {
      val l = FuzzyJoin.deletionMaxLen(d, cap)
      // the search's intentional 1<<20 length ceiling may bind for
      // small d at effectively-unbounded caps (variants(2^20, 2) ≈
      // 5.5e11 never reaches the cap) — that saturation IS part of the
      // non-wrap guarantee under test, so l == 1<<20 is a legitimate
      // "effectively unbounded" answer. No maximality assertion here:
      // the implementation's overflow guard is intentionally
      // conservative (it saturates when an intermediate term*f would
      // wrap even if the true BigInt count fits under the cap), so
      // exact-binomial maximality can legitimately fail near Long
      // range; maximality for cap-bound d is covered by the previous
      // test. What must hold for EVERY (d, cap): positive, ceiling-
      // bounded, and never admitting more variants than the cap.
      assert(l > 0 && l <= (1 << 20), s"d=$d cap=$cap gave l=$l")
      assert(exactVariants(l, d) <= BigInt(cap),
        s"d=$d cap=$cap len=$l admits too many variants")
    }
  }

}

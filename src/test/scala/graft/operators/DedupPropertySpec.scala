package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Randomized string-level reference check for [[Dedup.spanDupStats]] —
  * the one dedup operator whose production path rides HASHED token
  * windows (xxhash64 fingerprints) instead of the span strings
  * themselves. The collision trade is argued in the operator's scaladoc
  * (~m²/2⁶⁵); this spec replaces the argument with evidence on random
  * corpora: a direct driver-side computation over the literal span
  * STRINGS must agree row-for-row with the fingerprinted pipeline.
  *
  * The generator plants real structure: a shared boilerplate phrase
  * (longer than the window) injected into a random subset of docs, a
  * small word pool so natural window collisions occur, whitespace noise
  * (runs, tabs, CRs), empty docs, and docs shorter than the window
  * (whole-doc span semantics). Fixed seed — failures reproduce. */
class DedupPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Driver-side reference: tokenizes exactly like
    * [[graft.plans.WordShingles]] (lowercase, split on the Java-regex
    * `\s` class, windows with multiplicity, whole-doc span when
    * 0 < tokens < n) but keeps the span STRINGS and groups on them. */
  private def referenceStats(
      docs: Seq[(Long, String)], n: Int): Map[Long, (Long, Long, Double)] = {
    def isWs(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    def spansOf(text: String): Seq[String] = {
      val words = scala.collection.mutable.ArrayBuffer[String]()
      val t = text.toLowerCase
      var i = 0
      while (i < t.length) {
        while (i < t.length && isWs(t.charAt(i))) i += 1
        val s = i
        while (i < t.length && !isWs(t.charAt(i))) i += 1
        if (i > s) words += t.substring(s, i)
      }
      if (words.isEmpty) Nil
      else if (words.length < n) Seq(words.mkString(" "))
      else words.sliding(n).map(_.mkString(" ")).toSeq
    }
    val perDoc = docs.map { case (id, text) => id -> spansOf(text) }
    val docsPerSpan: Map[String, Int] = perDoc
      .flatMap { case (id, ss) => ss.distinct.map(s => (s, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    perDoc.filter(_._2.nonEmpty).map { case (id, ss) =>
      val total = ss.size.toLong
      val dup = ss.count(s => docsPerSpan(s) > 1).toLong
      id -> ((total, dup, dup.toDouble / total))
    }.toMap
  }

  test("spanDupStats == string-level reference on random corpora with planted spans") {
    val rnd = new scala.util.Random(4242)
    val pool = Vector("the", "quick", "Brown", "fox", "jumps", "OVER",
      "lazy", "dog", "and", "ran", "away", "fast")
    val ws = Vector(" ", "  ", "\t", " \r\n", "\n")
    // boilerplate templates long enough to span several windows — the
    // planted cross-doc signal (exactly what spanDupStats exists to find)
    val templates = Vector(
      "this article is licensed under the terms of the public license agreement",
      "click here to subscribe to our newsletter and never miss an update again")
    for (trial <- 1 to 5; n <- Seq(3, 10)) {
      val docs: Seq[(Long, String)] = (1 to 60).map { i =>
        val base = (0 until rnd.nextInt(25))
          .map(_ => pool(rnd.nextInt(pool.length)))
        val withTpl =
          if (rnd.nextInt(3) == 0) {
            val tpl = templates(rnd.nextInt(templates.length)).split(' ').toSeq
            val at = if (base.isEmpty) 0 else rnd.nextInt(base.length)
            base.take(at) ++ tpl ++ base.drop(at)
          } else base
        val text = withTpl.map(w => w + ws(rnd.nextInt(ws.length))).mkString
        (trial * 1000L + i, text)
      }
      val expected = referenceStats(docs, n)
      val got = Dedup.spanDupStats(docs.toDF("doc_id", "text"), "doc_id", "text", n)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got.keySet == expected.keySet,
        s"trial=$trial n=$n doc set mismatch: ${got.keySet.diff(expected.keySet)} / ${expected.keySet.diff(got.keySet)}")
      for ((id, exp) <- expected)
        assert(got(id) == exp, s"trial=$trial n=$n doc=$id got=${got(id)} expected=$exp")
    }
  }

  test("prefix ssjoin == full enumeration on random corpora (singleton-prefix drop is witness-safe)") {
    // Validates the round-15 optimization: df=1 prefix entries are
    // dropped from the candidate self-join, on the argument that a
    // prefix-filter WITNESS shingle is shared by both docs and so has
    // df >= 2 by definition. Random corpora with planted near-dups and
    // masses of unique vocabulary (so most prefix entries ARE
    // singletons — the worst case for the drop) must still produce
    // exactly the full-enumeration pair set, at two thresholds.
    val rnd = new scala.util.Random(777)
    val pool = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    for (trial <- 1 to 3; threshold <- Seq(0.5, 0.8)) {
      val docs: Seq[(Long, String)] = (1 to 40).flatMap { i =>
        // each doc: a run of pool words plus a UNIQUE id-salted tail so
        // singleton shingles dominate every prefix
        val base = (0 until (8 + rnd.nextInt(10)))
          .map(_ => pool(rnd.nextInt(pool.length)))
        val uniq = (0 until 6).map(j => s"u${trial}_${i}_$j")
        val text = (base ++ uniq).mkString(" ")
        val id = trial * 1000L + i
        // plant a near-dup for ~1 in 4 docs: same text, one word changed
        if (rnd.nextInt(4) == 0) {
          val words = (base ++ uniq).toArray
          words(rnd.nextInt(words.length)) = "mutated"
          Seq((id, text), (id + 500L, words.mkString(" ")))
        } else Seq((id, text))
      }
      val df = docs.toDF("doc_id", "text")
      def pairs(r: org.apache.spark.sql.DataFrame) =
        r.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val full = pairs(Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 3,
        threshold = threshold))
      val pref = pairs(Dedup.ngramJaccardPairsPrefix(df, "doc_id", "text", n = 3,
        threshold = threshold))
      assert(pref == full, s"trial=$trial t=$threshold:\n pref=$pref\n full=$full")
      if (threshold == 0.5) assert(full.nonEmpty, s"trial=$trial planted dups missing")
    }
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.functions.TextFunctions._

/** Randomized batch invariants for the text expressions: one fixed-seed
  * corpus of hostile strings, one Spark job per invariant (a per-sample
  * forAll would pay a job per case). These are the contracts other
  * operators BUILD ON — sortedness feeds the merge-intersect, token
  * conservation feeds chunk dedup, canonicalization feeds exact dedup. */
class TextPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // fixed-seed corpus with deliberate edges: empty, whitespace-only,
  // unicode, punctuation runs, very long, single word, tabs/newlines
  private lazy val corpus: Seq[String] = {
    val rnd = new scala.util.Random(42)
    val vocab = Seq("alpha", "Beta", "GAMMA", "δέλτα", "a1", "x,y", "!!", "e.g", "словцо", "词")
    val rand = (1 to 300).map { _ =>
      val n = rnd.nextInt(60)
      (1 to n).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
    }
    rand ++ Seq("", " ", "\t\n ", "word", "  padded  ", "a\tb\nc", "!?.,;", "x" * 5000)
  }
  private lazy val df = corpus.zipWithIndex.map(_.swap).toDF("id", "text").cache()

  test("fused quality gate == composed predicate on the random corpus") {
    // the gate's one-kernel-call reimplementation of the composed
    // arithmetic must hold on arbitrary text, not just the curated
    // hostile rows (CJK ratios, unicode word lengths, punctuation runs
    // all feed the score) — and across thresholds that straddle every
    // score component's contribution
    for (minQ <- Seq(0.0, 0.3, 0.5, 0.6, 0.8); lang <- Seq("en", "und", null)) {
      val bad = df.filter(
        qualityGate(col("text"), minQ, lang) =!=
          (if (lang == null) qualityScore(col("text")) >= minQ
           else qualityScore(col("text")) >= minQ && langId(col("text")) === lang))
        .count()
      assert(bad == 0, s"minQ=$minQ lang=$lang: $bad rows diverge")
    }
  }

  test("fingerprint is invariant under case and whitespace shape") {
    val mangled = concat(lit("  "),
      upper(regexp_replace(col("text"), " ", "\t ")), lit(" \n"))
    val bad = df.filter(fingerprint(col("text")) =!= fingerprint(mangled)).count()
    assert(bad == 0, s"$bad rows changed fingerprint under canonical-equivalent mangling")
  }

  test("chunking conserves tokens and bounds every chunk") {
    val rows = df.select(
        wsTokenCount(col("text")).as("total"),
        transform(chunkText(col("text"), 7), c => wsTokenCount(c)).as("per"))
      .as[(Int, Seq[Int])].collect()
    rows.foreach { case (total, per) =>
      assert(per.sum == total, s"token loss: $total vs $per")
      assert(per.forall(_ <= 7), s"overful chunk: $per")
      // every chunk except possibly the last is exactly full
      if (per.nonEmpty) assert(per.init.forall(_ == 7), s"ragged middle chunk: $per")
    }
  }

  test("shingle sets are distinct and sorted (the merge-intersect contract)") {
    val rows = df.select(shingleSet(col("text"), 3).as("s"))
      .as[Seq[String]].collect()
    rows.foreach { s =>
      assert(s == s.distinct, "duplicate shingle")
      assert(s == s.sorted, s"unsorted shingles: ${s.take(5)}...")
    }
  }

  test("minhash signatures have fixed arity and set semantics") {
    // set semantics: the signature depends on the shingle SET, not the
    // array order — reversing the array must not change it (distinct
    // expression trees, so this isn't collapsed to one evaluation)
    val rows = df.filter(length(col("text")) > 0)
      .select(minhashSignature(shingleSet(col("text"), 3), 32).as("sig"),
        minhashSignature(reverse(shingleSet(col("text"), 3)), 32).as("sig2"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (a, b) =>
      assert(a.length == 32)
      assert(a == b, "signature is order-sensitive — set semantics broken")
    }
  }

  test("quality score and langId are total and bounded on hostile input") {
    val rows = df.select(qualityScore(col("text")).as("q"), langId(col("text")).as("l"))
      .as[(Double, String)].collect()
    rows.foreach { case (q, l) =>
      assert(!q.isNaN && q >= 0.0 && q <= 1.0, s"q out of range: $q")
      assert(l.nonEmpty)
    }
  }

  test("redaction scrubs every rule's pattern and is idempotent") {
    val cases = Seq(
      "write to bob.smith+x@corp.example.co today",
      "server at 192.168.001.1 port 80",
      "call +1 (555) 123-4567 now",
      "mixed a@b.io and 10.0.0.1 and 555 123 9876!",
      "clean text with no pii at all")
    val out = cases.toDF("text")
      .select(redact(col("text")).as("r"), redactionCount(col("text")).as("n"),
        redact(redact(col("text"))).as("rr"))
      .as[(String, Int, String)].collect()
    assert(out(0)._1 == "write to <EMAIL> today")
    assert(out(1)._1 == "server at <IP> port 80")
    assert(out(1)._2 == 1, s"IP double-counted as phone: n=${out(1)._2}")
    assert(out(2)._1 == "call <PHONE> now")
    assert(out(3)._1 == "mixed <EMAIL> and <IP> and <PHONE>!")
    assert(out(3)._2 == 3, s"n=${out(3)._2}")
    assert(out(4)._1 == "clean text with no pii at all" && out(4)._2 == 0)
    // idempotent: a second pass changes nothing (no replacement token
    // re-triggers a rule)
    out.foreach { case (r, _, rr) => assert(r == rr) }
  }

  test("int8 quantization bounds every component on random vectors") {
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 200).map(i =>
      (i.toLong, Array.fill(16)((rnd.nextFloat() - 0.5f) * rnd.nextInt(1000))))
      .toDF("id", "v")
    val rows = vecs.select(graft.operators.Similarity.quantizeInt8(col("v")).as("z"))
      .select(col("z.scale"), col("z.q")).as[(Double, Seq[Byte])].collect()
    rows.foreach { case (scale, q) =>
      assert(scale > 0)
      assert(q.forall(b => b >= -127 && b <= 127), q)
    }
  }
}

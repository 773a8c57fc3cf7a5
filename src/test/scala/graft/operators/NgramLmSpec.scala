package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Bigram LM fluency scoring ([[NgramLm.bigramScore]]) — the model and
  * the smoothing are pinned against a fixture small enough to work by
  * hand, so the operator can't drift into "some plausible number". */
class NgramLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // tokens: d1 [a,b,a], d2 [a,b], d3 [c]
  // bigram instances: d1 (a,b),(b,a); d2 (a,b) → c(a,b)=2, c(b,a)=1
  // unigrams: a=3, b=2, c=1 → V=3
  // p(a,b) = (2+1)/(3+3) = 0.5 ; p(b,a) = (1+1)/(2+3) = 0.4
  val docs = Seq((1L, "a b a"), (2L, "A  b"), (3L, "c")).toDF("doc_id", "text")

  test("hand-computed add-1 smoothing: counts, vocab, per-doc mean") {
    val out = NgramLm.bigramScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet == Set(1L, 2L), "single-token docs carry no bigrams")
    assert(out(1L)._1 == 2 && math.abs(out(1L)._2 - 0.45) < 1e-12)
    assert(out(2L)._1 == 1 && math.abs(out(2L)._2 - 0.5) < 1e-12)
  }

  test("junk scores below fluent text under the self-trained model") {
    val corpus = (Seq(
      (100L, "zq xv qj wk vx"),                 // token soup: every bigram unseen elsewhere
      (101L, "the quick brown fox jumps")) ++   // fluent-ish, repeated support below
      (0L until 20L).map(i => (i, "the quick brown fox jumps")))
      .toDF("doc_id", "text")
    val s = NgramLm.bigramScore(corpus, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(s(100L) < s(101L),
      s"junk ${s(100L)} must score below supported text ${s(101L)}")
  }

  test("importance weights: hand-computed two-model ratios, unseen target mass") {
    // corpus: d1 "a b" en, d2 "a b" xx, d3 "a c" en, d4 "b b" xx, d5 "d d" xx
    // corpus: uni a=3 b=4 c=1 d=2 (V=4); big (a,b)=2 (a,c)=1 (b,b)=1 (d,d)=1
    // target(en): uniT a=2 b=1 c=1 d=0; bigT (a,b)=1 (a,c)=1
    // r(a,b) = (2/6) / (3/7) = 7/9    r(a,c) = (2/6) / (2/7) = 7/6
    // r(b,b) = (1/5) / (2/8) = 0.8    (target-unseen BIGRAM, seen token)
    // r(d,d) = (1/4) / (2/6) = 0.75   (target-unseen TOKEN: c1t = 0 path)
    val corpus = Seq(
      (1L, "a b", "en"), (2L, "a b", "xx"), (3L, "a c", "en"),
      (4L, "b b", "xx"), (5L, "d d", "xx")).toDF("doc_id", "text", "lang")
    val w = NgramLm.importanceWeights(corpus, "doc_id", "text", "lang = 'en'")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(w(1L) - 7.0 / 9) < 1e-9)
    assert(math.abs(w(2L) - 7.0 / 9) < 1e-9, "weights are content-based, not label-based")
    assert(math.abs(w(3L) - 7.0 / 6) < 1e-9)
    assert(math.abs(w(4L) - 0.8) < 1e-9)
    assert(math.abs(w(5L) - 0.75) < 1e-9)
  }

  test("addK must be positive") {
    val e = intercept[IllegalArgumentException] {
      NgramLm.bigramScore(docs, "doc_id", "text", addK = 0.0)
    }
    assert(e.getMessage.contains("addK"))
  }
}

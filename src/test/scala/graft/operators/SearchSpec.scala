package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Hand-verifiable BM25 / TF-IDF semantics on a tiny corpus. */
class SearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "spark spark spark join"),
    (2L, "spark join"),
    (3L, "hash join merge"),
    (4L, "scan filter")).toDF("doc_id", "text")

  test("bm25 ranks higher-tf docs above lower-tf, skips non-matching docs") {
    val top = Search.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 10)
      .as[(Long, Double, Long)].collect()
    // only docs 1 and 2 contain 'spark'
    assert(top.map(_._1).toSeq == Seq(1L, 2L))
    // hand-computed: N=4, df=2, idf=ln(2); avgdl=(4+2+3+2)/4=2.75
    // doc1: tf=3,dl=4 → idf*6.6/(3+1.2*(0.25+0.75*4/2.75))
    val idf = math.log(2.0)
    val s1 = idf * 3 * 2.2 / (3 + 1.2 * (0.25 + 0.75 * 4 / 2.75))
    val s2 = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / 2.75))
    assert(math.abs(top(0)._2 - math.rint(s1 * 1e6) / 1e6) < 1e-9)
    assert(math.abs(top(1)._2 - math.rint(s2 * 1e6) / 1e6) < 1e-9)
    assert(top.forall(_._3 == 1L), "each hit matched exactly one query term")
  }

  test("bm25 multi-term scores sum per doc and count terms hit") {
    val top = Search.bm25TopK(docs, "doc_id", "text",
        Seq("spark", "merge"), k = 10)
      .as[(Long, Double, Long)].collect()
    val byId = top.map(r => r._1 -> r).toMap
    assert(byId.keySet == Set(1L, 2L, 3L))
    assert(byId(3L)._3 == 1L, "doc 3 hits only 'merge'")
    // 'merge' (df=1) is rarer than 'spark' (df=2) → higher idf
    assert(byId(3L)._2 > byId(2L)._2,
      "rare-term hit outranks a single common-term hit at similar dl")
  }

  test("bm25 query terms are case-insensitive and deduped") {
    val a = Search.bm25TopK(docs, "doc_id", "text", Seq("SPARK", "spark"), k = 5)
      .as[(Long, Double, Long)].collect()
    val b = Search.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 5)
      .as[(Long, Double, Long)].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("tfidf top terms pick the rarest high-tf term per doc") {
    val d = Seq(
      (1L, "alpha alpha beta"),
      (2L, "beta gamma"),
      (3L, "beta beta beta")).toDF("doc_id", "text")
    val top1 = Search.tfidfTopTerms(d, "doc_id", "text", perDoc = 1)
      .as[(Long, String, Int)].collect().map(r => r._1 -> r._2).toMap
    // df: alpha=1, beta=3 (idf=ln(1)=0), gamma=1
    assert(top1(1L) == "alpha")
    assert(top1(2L) == "gamma")
    assert(top1(3L) == "beta") // only term present, even at idf 0
  }

  test("bm25 pin tokenizes each document exactly once (staged, not re-derived)") {
    // r12 review fix: the single-select form re-referenced words(text)
    // inside higher-order-function lambdas — HOFs evaluate interpreted
    // (CodegenFallback) with no subexpression elimination across lambda
    // bodies, so the tokenizer ran ~(2 + matched terms)× per row and
    // both bm25-consuming bench keys regressed ~35%. The staged form
    // names the token arrays as real columns across stacked projections;
    // this audit counts tokenizer applications (the `split` call words()
    // is built on) in the OPTIMIZED plan of the un-pinned base frame and
    // fails if CollapseProject ever inlines the producer back into its
    // multi-reference consumers.
    // the repartition is a fence against ConvertToLocalRelation (which
    // would eagerly evaluate projections over this in-memory fixture
    // and erase the very expressions being counted — a parquet-backed
    // corpus keeps them either way)
    val base = Search.bm25Base(docs.repartition(1), "doc_id", "text",
      Seq("spark", "join"))
    val nSplits = base.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.map(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.StringSplit => s
      }.size).sum
    }.sum
    assert(nSplits == 1, s"tokenizer should run once per row, found $nSplits split() sites")
    // and the staging is transparent to results: same rows as ever
    val top = Search.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 10)
      .as[(Long, Double, Long)].collect()
    assert(top.map(_._1).toSeq == Seq(1L, 2L))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, FuzzyJoin, Search, Similarity}

/** Audit of every `localCheckpoint` pin in the operator pipelines
  * (README §"Operator notes: pinned intermediates"): a pinned frame
  * sits on executor storage with TRUNCATED lineage for the lifetime of
  * the query, so it must carry only the columns its consumers need —
  * ids, lengths, signatures, hashes; never a text / token-array /
  * vector payload the plan could re-derive. The r9 review found
  * `bm25TopK` pinning the full tokenized corpus (`__w` riding a pin it
  * only needed `dl` from); this spec pins the fixed shape and fences
  * every other operator's pin against the same regression.
  *
  * Mechanism: a lazy `localCheckpoint` materializes in the analyzed
  * plan as a `LogicalRDD` leaf carrying the pinned output attributes —
  * collecting those leaves gives the exact column set each pin stores.
  */
class PinAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** (name, dataType) sets of every pinned (LogicalRDD) leaf in the
    * plan. Matched by class name: LogicalRDD is the only leaf a
    * localCheckpoint produces, and none of these operator plans
    * contains any other RDD-backed leaf. */
  private def pinnedOutputs(df: DataFrame): Seq[Set[(String, DataType)]] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LeafNode
        if l.getClass.getSimpleName == "LogicalRDD" =>
        l.output.map(a => (a.name, a.dataType)).toSet
    }

  private def isPayload(nt: (String, DataType)): Boolean = nt match {
    // token arrays and embedding vectors are payload wherever they are
    // re-derivable; the sites that legitimately pin them (Dedup verify
    // sets, Similarity bucket self-joins) assert their exact need-set
    // instead of using this blanket predicate
    case (_, ArrayType(StringType, _)) => true
    case (_, ArrayType(FloatType | DoubleType, _)) => true
    case ("text", StringType) => true
    case ("cs" | "ps", StringType) => true
    case _ => false
  }

  val docs = Seq(
    (1L, "spark makes distributed compute declarative and fast"),
    (2L, "duckdb makes local analytics declarative and fast"),
    (3L, "the quick brown fox jumps over the lazy dog"),
    (4L, "spark and duckdb both run declarative sql queries")
  ).toDF("doc_id", "text")

  test("bm25TopK pins only (doc_id, dl, query-term tfs) — never tokens") {
    val plan = Search.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "declarative"), k = 3)
    val pins = pinnedOutputs(plan)
    assert(pins.nonEmpty, "expected the shared corpus-stats/postings pin")
    pins.foreach { p =>
      assert(!p.exists(isPayload), s"payload column in a bm25 pin: $p")
    }
    // ONE pin shared by the stats and postings branches: the slim
    // (doc_id, dl) projection plus the query-term-sized tf structs —
    // `tfs` is bounded by the query, never by the corpus. Expectations
    // are derived from the plan/source schema, never hand-written type
    // literals: three rounds of spec flake all came from guessed
    // schema minutiae (top-hit order, containsNull, nullable) on a
    // test whose actual purpose is the column SET and the no-payload
    // rule, not nullability plumbing.
    assert(pins.distinct.size == 1,
      s"expected one shared pin for stats+postings, got: ${pins.distinct}")
    val pin = pins.head
    assert(pin.map(_._1) == Set("doc_id", "dl", "tfs"),
      s"pin column drift: $pin")
    assert(pin.contains("doc_id" -> docs.schema("doc_id").dataType),
      s"doc_id type drift: $pin")
    assert(pin.collectFirst { case ("dl", t) => t }.contains(DoubleType))
    pin.collectFirst { case ("tfs", t) => t }.get match {
      case ArrayType(s: StructType, _) =>
        assert(s.fieldNames.toSeq == Seq("term", "tf"), s"tfs struct drift: $s")
        assert(s("term").dataType == StringType && s("tf").dataType == DoubleType,
          s"tfs leaf type drift: $s")
      case other => fail(s"tfs should be array<struct<term, tf>>, got $other")
    }
    // and the result still surfaces the corpus' best matches: docs 1
    // and 4 each match both query terms (doc 1 edges doc 4 on BM25's
    // length normalization under the default k1/b) — assert the top-2
    // set, not an order the fixture doesn't pin down
    val top = plan.collect()
    assert(top.length >= 2 && top.take(2).map(_.getLong(0)).toSet == Set(1L, 4L),
      s"docs 1 and 4 match both query terms: ${top.mkString(",")}")
  }

  test("bigramScore pins only the unigram dictionary — never token arrays") {
    val plan = graft.operators.NgramLm.bigramScore(docs, "doc_id", "text")
    val pins = pinnedOutputs(plan)
    assert(pins.nonEmpty, "expected the unigram-dictionary pin")
    pins.foreach { p =>
      assert(!p.exists(isPayload), s"payload column in a bigramScore pin: $p")
    }
    assert(pins.distinct.size == 1,
      s"expected one shared unigram-dictionary pin, got: ${pins.distinct}")
    assert(pins.head.map(_._1) == Set("w1", "__c1"),
      s"pin column drift: ${pins.head}")
  }

  test("tfidfTopTerms pins the (doc_id, term, tf) postings — never text") {
    val plan = Search.tfidfTopTerms(docs, "doc_id", "text", perDoc = 2)
    val pins = pinnedOutputs(plan)
    assert(pins.nonEmpty)
    pins.foreach(p => assert(!p.exists(isPayload), s"payload in tfidf pin: $p"))
    assert(plan.count() > 0)
  }

  test("editDistanceJoin pins gram postings — never the joined strings") {
    val names = Seq((1L, "acme corp"), (2L, "acme c0rp"), (3L, "zenith ltd"))
      .toDF("id", "name")
    val plan = FuzzyJoin.editDistanceJoin(names, names, "id", "name",
      maxDist = 1, maxKeyLen = 4) // force the gram route
    val pins = pinnedOutputs(plan)
    assert(pins.nonEmpty, "gram route pins its postings")
    pins.foreach { p =>
      assert(!p.exists(isPayload), s"full string in a fuzzy-join pin: $p")
    }
  }

  test("dedup pipelines never pin the raw text column") {
    for (plan <- Seq(
      Dedup.minhashLshPairs(docs, "doc_id", "text"),
      Dedup.ngramJaccardPairs(docs, "doc_id", "text"))) {
      pinnedOutputs(plan).foreach { p =>
        assert(!p.contains("text" -> StringType), s"raw text pinned: $p")
      }
    }
  }

  test("similarity pins carry exactly their documented need-sets (vectors ARE the need)") {
    val rnd = new scala.util.Random(5)
    val emb = (0 until 40).map(i => (i.toLong, Array.fill(8)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    // the vector element type is derived from the SOURCE schema (not a
    // hand-written ArrayType literal — containsNull must track however
    // the encoder produced it); the bucket self-join legitimately
    // visits the same pinned leaf once per branch → compare the
    // DISTINCT leaf set, not leaf occurrences
    val vec = emb.schema("embedding").dataType
    val nd = Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.9, corpusSize = Some(40L))
    assert(pinnedOutputs(nd).distinct == Seq(Set(
      "id" -> LongType, "v" -> vec, "n" -> DoubleType, "bucket" -> LongType)),
      s"lshNearDupPairs pin drifted: ${pinnedOutputs(nd).distinct}")
    val cent = emb.filter($"vec_id" < 4)
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    val sd = Similarity.semanticDedup(emb, "vec_id", "embedding", cent, 0.9)
    assert(pinnedOutputs(sd).distinct == Seq(Set(
      "id" -> LongType, "cid" -> LongType, "xv" -> vec, "xn" -> DoubleType)),
      s"semanticDedup pin drifted: ${pinnedOutputs(sd).distinct}")
  }
}

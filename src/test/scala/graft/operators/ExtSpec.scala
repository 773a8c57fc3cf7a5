package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.functions.TextFunctions
import graft.multimodal.Multimodal

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "completely different words about spark engines"),
    (4L, "THE QUICK  BROWN fox jumps over the lazy dog"),  // exact mod spacing/case
    (5L, "another unrelated text talking about parquet files")).toDF("doc_id", "text")

  test("exact dedup collapses case/spacing variants, keeps lowest id") {
    val kept = Dedup.exact(docs, "doc_id", "text").select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 3L, 5L)) // 4 collapses into 1
  }

  test("empty/whitespace docs neither crash nor pair in the minhash paths") {
    // empty shingle sets minhash to identical signatures; unguarded
    // they collide in every band and divide 0/0 in the verify (ANSI
    // abort). The guard drops them, same rule as simhash.
    val noisy = docs.unionByName(Seq(
      (100L, ""), (101L, "   "), (102L, "\t\n")).toDF("doc_id", "text"))
    val pairs = Dedup.minhashLshPairs(noisy, "doc_id", "text",
        n = 3, k = 32, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p._1 >= 100L || p._2 >= 100L),
      "empty docs must not pair with anything")
    assert(pairs.contains((1L, 4L)), "real near-dups still found")
    val across = Dedup.minhashLshPairsAcross(
        Seq((200L, ""), (201L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text"),
        noisy, "doc_id", "text", n = 3, k = 32, bands = 8, threshold = 0.5)
      .select("id_new").as[Long].collect().toSet
    assert(across == Set(201L), "bipartite: empty new-side doc matches nothing")
  }

  test("minhash knobs validate: bands must divide k") {
    intercept[IllegalArgumentException](
      Dedup.minhashLshPairs(docs, "doc_id", "text", k = 16, bands = 32))
    intercept[IllegalArgumentException](
      Dedup.minhashLshPairs(docs, "doc_id", "text", k = 32, bands = 7))
  }

  test("ngram jaccard finds the near-dup pair exactly") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("span dedup: hand-counted cross-doc window fractions") {
    // n=3 windows over 9-word docs → 7 spans each. Docs 1 and 2 differ
    // only in the last word, so exactly the windows not touching it
    // (positions 0..5 → 6 spans) are shared; doc 4 ≡ doc 1 after
    // case/space normalization (all 7 shared); docs 3 and 5 share none.
    val stats = Dedup.spanDupStats(docs, "doc_id", "text", n = 3)
      .select("doc_id", "n_spans", "cross_doc_spans")
      .as[(Long, Long, Long)].collect().map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(stats(1L) == ((7L, 7L))) // all 7 shared with doc 4
    assert(stats(4L) == ((7L, 7L)))
    assert(stats(2L) == ((7L, 6L))) // 6 of 7 shared with docs 1/4
    assert(stats(3L)._2 == 0L && stats(5L)._2 == 0L)
    // short doc (< n tokens) contributes its whole text as one span
    val short = Seq((10L, "tiny doc"), (11L, "tiny doc"), (12L, "other")).toDF("doc_id", "text")
    val s2 = Dedup.spanDupStats(short, "doc_id", "text", n = 3)
      .select("doc_id", "n_spans", "cross_doc_spans")
      .as[(Long, Long, Long)].collect().map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(s2(10L) == ((1L, 1L)) && s2(11L) == ((1L, 1L)) && s2(12L) == ((1L, 0L)))
  }

  test("bipartite LSH finds cross-corpus near-dups only") {
    val corpus = docs.filter($"doc_id" <= 3)
    val batch = docs.filter($"doc_id" >= 4)
    val pairs = Dedup.minhashLshPairsAcross(batch, corpus, "doc_id", "text",
        n = 3, k = 32, bands = 8, threshold = 0.5)
      .select("id_new", "id_corpus").as[(Long, Long)].collect().toSet
    // doc 4 is 1-mod-case (j=1 with 1, near 2); 5 matches nothing
    assert(pairs == Set((4L, 1L), (4L, 2L)))
  }

  test("minhash LSH agrees with exact ngram jaccard on clear dups") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3, k = 32, bands = 8,
      threshold = 0.5).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
  }

  test("simhash: identical-mod-case texts at distance 0; near-dups close; unrelated far") {
    val sigs = docs.select($"doc_id",
      TextFunctions.simhash64(TextFunctions.words($"text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(4L)) // same tokens after lower()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)))
  }

  test("md5 simhash agrees with the reference bit definition") {
    // independent scala reimplementation of the bit spec: per-token bit b
    // = bit b%8 (LSB-first) of md5-digest byte b/8; ±1 votes; sign → bit
    def refSim(tokens: Seq[String]): Long = {
      val votes = new Array[Int](64)
      val md = java.security.MessageDigest.getInstance("MD5")
      tokens.foreach { t =>
        val d = md.digest(t.getBytes("UTF-8"))
        (0 until 64).foreach { b =>
          if (((d(b / 8) >> (b % 8)) & 1) == 1) votes(b) += 1 else votes(b) -= 1
        }
      }
      (0 until 64).foldLeft(0L)((s, b) => if (votes(b) > 0) s | (1L << b) else s)
    }
    val got = docs.select($"doc_id",
      TextFunctions.simhashMd5(TextFunctions.tokens($"text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    docs.select($"doc_id", $"text").as[(Long, String)].collect().foreach {
      case (id, text) =>
        val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        assert(got(id) == refSim(toks), s"doc $id")
    }
    assert(got(1L) == got(4L)) // case/spacing-insensitive
  }

  test("md5-simhash pairs find near-dups within hamming radius") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 10, md5Bits = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("prefix-filtered jaccard equals unfiltered full enumeration") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val prefix = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(prefix == exact)
    assert(prefix.nonEmpty)
  }

  test("prefix ssjoin keeps boundary pairs at exactly J = t (length/positional filter slack)") {
    // A's 8 shingles are a strict subset of B's 10 → J = 8/10 = 0.8,
    // sitting EXACTLY on the threshold and exactly on the length
    // filter's t·|B| ≤ |A| boundary — a float-rounding over-prune here
    // would silently drop a qualifying pair
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val b = a + " w11 w12"
    val df2 = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairsPrefix(df2, "doc_id", "text", n = 3, threshold = 0.8)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.length == 1 && pairs.head._1 == 1L && pairs.head._2 == 2L, pairs.toSeq)
    assert(math.abs(pairs.head._3 - 0.8) < 1e-12)
  }

  test("ngram jaccard df-pruning keeps true pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5,
      maxShingleDf = Some(4)).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("prefix ssjoin hot/cold split is answer-invariant, incl. the un-hinted fallback") {
    def pairs(r: org.apache.spark.sql.DataFrame) =
      r.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = pairs(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5))
    // hotDf = 0 routes EVERY shingle through the hot (broadcast-
    // annotated) branch — must not change the answer
    val allHot = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text",
      n = 3, threshold = 0.5, hotDf = 0)
    assert(pairs(allHot) == expected)
    // a 1-byte broadcast threshold makes the measured-size check drop
    // the hints (round-16 advice): the degraded shuffled-join plan must
    // produce the identical answer, and the plan must actually contain
    // no broadcast anywhere
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val unhinted = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text",
        n = 3, threshold = 0.5, hotDf = 0)
      assert(pairs(unhinted) == expected)
      assert(!unhinted.queryExecution.executedPlan.toString.contains("Broadcast"),
        "the forced hot-table hints must be dropped past the measured size cap")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.95f, 0.05f)), // close to 2
    (4L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("zero-norm vectors score 0 everywhere instead of aborting under ANSI") {
    val withZero = vecs.unionByName(
      Seq((9L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val top = Similarity.cosineTopK(withZero, withZero, "vec_id", "embedding", k = 5)
      .as[(Long, Int, Long, Double)].collect()
    assert(top.nonEmpty, "the job must complete")
    assert(top.filter(_._1 == 9L).forall(_._4 == 0.0),
      "a zero probe scores 0 against everything")
    assert(top.filter(_._1 == 0L).find(_._3 == 9L).forall(_._4 == 0.0),
      "a zero corpus vector never outranks a real neighbor")
  }

  test("semantic contamination: nearest eval vector, tie to lowest id, threshold filters") {
    // eval = {0 → x-axis, 2 → y-axis}; corpus 1 is near 0 (cos ≈ .994),
    // corpus 3 is near 2 (cos ≈ .999), corpus 4 is anti-parallel to 0
    // (cos −1 vs 0, 0 vs 2 → below any positive threshold)
    val eval = vecs.filter($"vec_id".isin(0L, 2L))
    val corpus = vecs.filter(!$"vec_id".isin(0L, 2L))
    val out = Similarity.semanticContamination(
        corpus, eval, "vec_id", "embedding", threshold = 0.9)
      .select($"vec_id", $"eval_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 3L -> 2L), s"got $out")
    // exact tie between the two eval vectors → lowest eval id wins
    val tied = Seq((7L, Array(0.7071f, 0.7071f, 0.0f))).toDF("vec_id", "embedding")
    val t = Similarity.semanticContamination(
        tied, eval, "vec_id", "embedding", threshold = 0.5)
      .select($"eval_id").as[Long].collect().toSeq
    assert(t == Seq(0L), s"tie must resolve to eval 0, got $t")
  }

  test("brute-force cosine top-1 finds the geometric neighbor") {
    val top1 = Similarity.cosineTopK(vecs, vecs, "vec_id", "embedding", k = 1)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect().toMap
    assert(top1(0L) == 1L)
    assert(top1(1L) == 0L)
    assert(top1(2L) == 3L)
    assert(top1(3L) == 2L)
  }

  test("cosine of identical vectors is 1, orthogonal is 0, opposite is -1") {
    val c = vecs.as("a").join(vecs.as("b"), lit(true))
      .select($"a.vec_id", $"b.vec_id",
        Similarity.cosine($"a.embedding", $"b.embedding").as("c"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    assert(math.abs(c((0L, 0L)) - 1.0) < 1e-12)
    assert(math.abs(c((0L, 2L))) < 1e-12)
    assert(math.abs(c((0L, 4L)) + 1.0) < 1e-12)
  }

  test("kmeans refinement moves centroids to cluster means and plugs into ivf") {
    // two clear direction-clusters; init centroids = one member of each
    val data = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.95f, 0.05f, 0.0f)),
      (10L, Array(0.0f, 1.0f, 0.0f)), (11L, Array(0.0f, 0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val init = data.filter($"vec_id".isin(0L, 10L))
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    val refined = Similarity.kmeansRefine(data, "vec_id", "embedding",
        init, "cid", "cv", iters = 2)
      .as[(Long, Seq[Float])].collect().toMap
    // centroid 0 ≈ mean of cluster {0,1,2}; centroid 10 ≈ mean of {10,11}
    val c0 = refined(0L); val c10 = refined(10L)
    assert(math.abs(c0.head - (1.0f + 0.9f + 0.95f) / 3) < 1e-6, c0)
    assert(math.abs(c10(1) - (1.0f + 0.9f) / 2) < 1e-6, c10)
    // refined centroids drop into the IVF search plan
    val hits = Similarity.ivfTopKWith(data, data, "vec_id", "embedding",
        k = 2, refined.toSeq.map { case (i, v) => (i, v.toArray) }.toDF("cid", "cv"),
        nprobe = 1)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect().toSet
    // same-cluster neighbors are found within one probed cluster
    assert(hits.contains((0L, 1L)) && hits.contains((10L, 11L)))
  }

  test("lsh near-dup pairs recover planted exact duplicates") {
    val planted = vecs.withColumn("vec_id", $"vec_id" + 100)
    val pairs = Similarity.lshNearDupPairs(vecs.unionByName(planted),
        "vec_id", "embedding", threshold = 0.999, nbits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every original must pair with its planted copy (identical sign bits)
    (0L to 4L).foreach(i => assert(pairs.contains((i, i + 100L)), s"vec $i"))
  }

  test("semantic dedup drops within-cluster near-dups and keeps cluster-straddling pairs") {
    val data = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.01f, 0.0f)),  // near-dup of 0, same cluster
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.98f, 0.02f)),  // near-dup of 2, same cluster
      (4L, Array(0.70f, 0.70f, 0.0f)),  // diagonal → cluster 0 (tie → lowest cid)
      (5L, Array(0.69f, 0.72f, 0.0f))   // near-dup of 4 but lands in cluster 1
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("cid", "cv")
    val res = Similarity.semanticDedup(data, "vec_id", "embedding", cents,
        threshold = 0.98)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(res(0L)._2, "lowest id survives its dup pair")
    assert(!res(1L)._2, "near-dup of 0 dropped")
    assert(res(2L)._2)
    assert(!res(3L)._2, "near-dup of 2 dropped")
    // the documented approximation: 4~5 are near-dups (cos ≈ 0.9998)
    // but straddle the cluster boundary, so SemDeDup never compares them
    assert(res(4L)._1 == 0L && res(5L)._1 == 1L, "4 and 5 in different clusters")
    assert(res(4L)._2 && res(5L)._2, "cross-cluster near-dups both survive")
  }

  test("hierarchical assignment equals flat argmax with nCoarse >= k, tie-breaks included") {
    // real fixture embeddings, 16 centroids: with every centroid its
    // own anchor the two paths must agree EXACTLY (same tie rule)
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"corpus_id", $"cid").as[(Long, Long)].collect().toSet
    val flat = rows(Similarity.assignClusters(emb, "vec_id", "embedding", centroids))
    val hier = rows(Similarity.assignClustersHier(emb, "vec_id", "embedding",
      centroids, nCoarse = 16))
    assert(hier == flat)
    // the equality must survive k > maxAnchors: the exact regime takes
    // the literal branch instead of silently rerouting through the
    // approximate anchors-of-anchors recursion (round-16 review catch —
    // with maxAnchors = 4 < k = 16 the old code recursed and could
    // land boundary rows on a non-nearest centroid)
    val hierPastBound = rows(Similarity.assignClustersHier(emb, "vec_id",
      "embedding", centroids, nCoarse = 16, maxAnchors = 4))
    assert(hierPastBound == flat)
  }

  /** 4 axis-direction clusters whose members wiggle only toward axis 0
    * (axis 1 for the axis-0 cluster) — with anchors {c0, c2} (the
    * stride-2 pick at nCoarse = 2) every member's nearest ANCHOR cell
    * provably contains its true argmax centroid, so hier must equal
    * flat on this fixture while still exercising a real 2-anchor
    * hierarchy. Wiggle magnitude 0.05·(i/4) ≤ 0.45 keeps the own-axis
    * argmax; adjacent members' cosine ≤ 0.9991 < the dedup threshold. */
  private def separatedClusters(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val axis = i % 4
      val waxis = if (axis == 0) 1 else 0
      val w = 0.05f * (i / 4)
      (i.toLong, Array.tabulate(4)(d =>
        if (d == axis) 1.0f else if (d == waxis) w else 0.0f))
    }

  test("hierarchical assignment matches flat on separated clusters and preserves duplicates") {
    val data = separatedClusters(80)
    // planted exact duplicates of the first 8 vectors at higher ids
    val planted = data.take(8).map { case (i, v) => (i + 1000L, v.clone()) }
    val df = (data ++ planted).toDF("vec_id", "embedding")
    val cents = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f)), (1L, Array(0f, 1.0f, 0f, 0f)),
      (2L, Array(0f, 0f, 1.0f, 0f)), (3L, Array(0f, 0f, 0f, 1.0f)))
      .toDF("cid", "cv")
    def rows(r: org.apache.spark.sql.DataFrame) =
      r.select($"corpus_id", $"cid").as[(Long, Long)].collect().toMap
    val flat = rows(Similarity.assignClusters(df, "vec_id", "embedding", cents))
    val hier = rows(Similarity.assignClustersHier(df, "vec_id", "embedding",
      cents, nCoarse = 2))
    assert(hier == flat, "separated clusters: hier == flat")
    // the unconditional invariant: identical vectors, identical cells
    (0 until 8).foreach(i =>
      assert(hier(i.toLong) == hier(i + 1000L), s"duplicate $i assignment"))
  }

  test("semanticDedup routes large k through hierarchical assignment, same planted result") {
    // same separated fixture; force the hier route with a tiny
    // threshold and check the planted copies are still dropped and the
    // originals kept — the result the flat route produces
    val data = separatedClusters(40)
    val planted = data.take(8).map { case (i, v) => (i + 1000L, v.clone()) }
    val df = (data ++ planted).toDF("vec_id", "embedding")
    val cents = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f)), (1L, Array(0f, 1.0f, 0f, 0f)),
      (2L, Array(0f, 0f, 1.0f, 0f)), (3L, Array(0f, 0f, 0f, 1.0f)))
      .toDF("cid", "cv")
    def keepMap(hierFrom: Int) =
      Similarity.semanticDedup(df, "vec_id", "embedding", cents,
          threshold = 0.9999, hierAssignFrom = hierFrom)
        .select($"id", $"keep").as[(Long, Boolean)].collect().toMap
    val viaHier = keepMap(1)          // k=4 >= 1 → hierarchical route
    val viaFlat = keepMap(1000)       // k=4 <  1000 → flat route
    assert(viaHier == viaFlat)
    (0 until 8).foreach { i =>
      assert(viaHier(i.toLong), s"original $i kept")
      assert(!viaHier(i + 1000L), s"planted copy of $i dropped")
    }
  }

  test("forced centroid broadcasts are guarded against the session threshold") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      // 64 centroids × dim 8 ≈ 64·(32+48) = 5120 B > 1 KB threshold
      val big = (0 until 64).map(i => (i.toLong, Array.fill(8)(i.toFloat + 1)))
        .toDF("cid", "cv")
      val e = intercept[IllegalArgumentException](
        Similarity.assignClusters(vecs, "vec_id", "embedding", big))
      assert(e.getMessage.contains("assignClusters") &&
        e.getMessage.contains("assignClustersHier"), e.getMessage)
      val e3 = intercept[IllegalArgumentException](
        Similarity.ivfTopKWith(vecs, vecs, "vec_id", "embedding", 2, big, 1))
      assert(e3.getMessage.contains("ivfTopKWith"), e3.getMessage)
      // the hierarchical path broadcasts only ~sqrt(k) anchors — the
      // same centroid table passes (8 anchors ≈ 640 B < 1 KB)
      val dim8 = vecs.select($"vec_id",
        org.apache.spark.sql.functions.expr(
          "concat(embedding, cast(array(0.0, 0.0, 0.0, 0.0, 0.0) as array<float>))"
        ).as("embedding"))
      assert(Similarity.assignClustersHier(dim8, "vec_id", "embedding", big)
        .count() == 5)
      // kmeansRefine no longer fail-fasts past the threshold (round-16):
      // it routes its assignment through the hierarchical path and must
      // SUCCEED on the same over-threshold table the old guard rejected
      assert(Similarity.kmeansRefine(dim8, "vec_id", "embedding", big,
        "cid", "cv").count() == 64)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("guard still protects sessions that DISABLE auto-broadcast (thr <= 0)") {
    // -1 is the standard production setting to PREVENT broadcast OOMs
    // from bad stats — precisely those sessions must keep the guard on
    // the forced hints (round-16 advice). Disabled threshold falls back
    // to the 8 GiB sanity cap, overridable via
    // spark.graft.forcedBroadcastCap.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = (0 until 64).map(i => (i.toLong, Array.fill(3)(i.toFloat + 1)))
        .toDF("cid", "cv")
      // a small frame passes under the default cap — no spurious trip
      assert(Similarity.assignClusters(vecs, "vec_id", "embedding", big)
        .count() == 5)
      // the explicit cap knob trips the guard even with thr = -1
      spark.conf.set("spark.graft.forcedBroadcastCap", "1024")
      val e = intercept[IllegalArgumentException](
        Similarity.assignClusters(vecs, "vec_id", "embedding", big))
      assert(e.getMessage.contains("sanity cap"), e.getMessage)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.graft.forcedBroadcastCap")
    }
  }

  /** 16 pairwise non-parallel directions: rows whose vectors EQUAL a
    * centroid must land on that centroid at EVERY recursion depth —
    * both sides of every coarse level run the same deterministic argmax
    * over the same anchor sets (see assignClustersHier's scaladoc). */
  private def distinctDirections(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val t = 1.0f + i * 0.37f
      (i.toLong, Array(1.0f, t, t * t / 10f, t * t * t / 100f))
    }

  test("anchors-of-anchors: forced multi-level == two-level == flat on exact copies") {
    val cents = distinctDirections(16).toDF("cid", "cv")
    // corpus = scaled copies of every centroid (cosine is scale-free)
    val corpus = distinctDirections(16)
      .map { case (i, v) => (i + 100L, v.map(_ * 2.5f)) }
      .toDF("vec_id", "embedding")
    def rows(r: org.apache.spark.sql.DataFrame) =
      r.select($"corpus_id", $"cid").as[(Long, Long)].collect().toMap
    // maxAnchors = 3 < 4 = ceil(sqrt(16)) anchors → one recursion level
    // (4 anchors → 2 super-anchors → literal): a real three-level tree
    val multi = rows(Similarity.assignClustersHier(corpus, "vec_id", "embedding",
      cents, maxAnchors = 3))
    val twoLevel = rows(Similarity.assignClustersHier(corpus, "vec_id", "embedding",
      cents))
    val flat = rows(Similarity.assignClusters(corpus, "vec_id", "embedding", cents))
    assert(multi == flat, "multi-level must place every exact copy on its centroid")
    assert(twoLevel == flat)
    (0 until 16).foreach(i => assert(multi(i + 100L) == i.toLong, s"copy of $i"))
  }

  test("hier drops null-vector centroids; flat keeps them as zero-sim candidates") {
    // the round-16 contract: a null cv carries no geometry — the hier
    // path ignores it entirely, where flat can assign to it when every
    // real cosine is negative (it scores 0). Pin BOTH behaviors.
    val cents = Seq(
      (0L, null.asInstanceOf[Array[Float]]),
      (5L, Array(1.0f, 0.0f, 0.0f))).toDF("cid", "cv")
    val negRow = Seq((1L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val flatCid = Similarity.assignClusters(negRow, "vec_id", "embedding", cents)
      .select($"cid").as[Long].head()
    val hierCid = Similarity.assignClustersHier(negRow, "vec_id", "embedding", cents,
        nCoarse = 2)
      .select($"cid").as[Long].head()
    assert(flatCid == 0L, "flat: the zero-scoring null centroid wins over cos=-1")
    assert(hierCid == 5L, "hier: null centroids are dropped from the fine table")
  }

  test("kmeansRefine at corpus-derived k succeeds via the hier route (old guard errored)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // 512 × dim-4 centroids ≈ 512·(16+48) = 32 KB > the 8 KB session
      // threshold — exactly the configuration the r15 guard fail-fasted
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "8192")
      val cents = distinctDirections(512).toDF("cid", "cv")
      // corpus: one exact copy of each of the first 8 centroids → those
      // clusters' means are their own centroid; the 504 empty clusters
      // keep their previous centroid — the refined table must equal the
      // input bit for bit
      val corpus = distinctDirections(8)
        .map { case (i, v) => (i + 100L, v.clone()) }.toDF("vec_id", "embedding")
      val refined = Similarity.kmeansRefine(corpus, "vec_id", "embedding",
          cents, "cid", "cv", iters = 2)
        .as[(Long, Seq[Float])].collect().toMap
      val original = distinctDirections(512).map { case (i, v) => i -> v.toSeq }.toMap
      assert(refined.size == 512)
      assert(refined == original,
        "exact-copy members and empty clusters must leave every centroid unchanged")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("semanticDedup surfaces the maxCluster k-knob remedy from a real query") {
    // one centroid → every vector lands in one cluster of 6 > cap 4;
    // the error must carry the remedy END TO END, raised from inside
    // the executing query, not just from the expression unit test
    val data = (0 until 6).map(i => (i.toLong, Array(1.0f, 0.001f * i)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0f, 0.0f))).toDF("cid", "cv")
    val e = intercept[Exception](
      Similarity.semanticDedup(data, "vec_id", "embedding", cents,
        threshold = 0.99, maxCluster = 4).collect())
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("n/5000"))),
      s"expected the k-knob remedy end-to-end, got: $e")
  }

  test("semantic dedup widens integral id types and rejects non-integral ones loudly") {
    // int ids — the public-API shape the r14 bigint-only scoring
    // expression regressed: must widen to long transparently and
    // return the ORIGINAL int type on output
    val data = Seq(
      (0, Array(1.0f, 0.0f)),
      (1, Array(0.99f, 0.01f)),   // near-dup of 0
      (7, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0f, 0.0f)), (7L, Array(0.0f, 1.0f)))
      .toDF("cid", "cv")
    val res = Similarity.semanticDedup(data, "vec_id", "embedding", cents,
      threshold = 0.98)
    assert(res.schema("id").dataType == org.apache.spark.sql.types.IntegerType)
    val keep = res.select($"id", $"keep").as[(Int, Boolean)].collect().toMap
    assert(keep == Map(0 -> true, 1 -> false, 7 -> true), keep)
    // a string id must fail at plan-build time with the remedy, not
    // silently null out under an implicit cast
    val strData = Seq(("a", Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Similarity.semanticDedup(strData, "vec_id", "embedding", cents, 0.9))
    assert(e.getMessage.contains("integral id column"), e.getMessage)
  }

  test("ivf top-k equals brute force when every cluster is probed") {
    // 5 vectors, 2 centroids (vec_id < 2), nprobe = 2 probes everything
    // → IVF must reduce to exact search
    val exact = Similarity.cosineTopK(vecs, vecs, "vec_id", "embedding", k = 2)
      .select("probe_id", "rank", "corpus_id").as[(Long, Int, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(vecs, vecs, "vec_id", "embedding",
        k = 2, nCentroids = 2, nprobe = 2)
      .select("probe_id", "rank", "corpus_id").as[(Long, Int, Long)].collect().toSet
    assert(ivf == exact)
  }

  test("ivf restricted search returns a subset of brute-force candidates") {
    val ivf1 = Similarity.ivfTopK(vecs, vecs, "vec_id", "embedding",
        k = 4, nCentroids = 2, nprobe = 1)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect().toSet
    val all = Similarity.cosineTopK(vecs, vecs, "vec_id", "embedding", k = 4)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(ivf1.subsetOf(all))
    assert(ivf1.nonEmpty)
  }

  test("lsh top-k reaches a useful recall floor on real embeddings") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val probes = emb.filter($"vec_id" < 20)
    val exact = Similarity.cosineTopK(emb, probes, "vec_id", "embedding", k = 5)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect().toSet
    // 4 sign bits/table, 8 tables: single-table collision for these
    // low-sim neighbors is ~0.13; the union lifts recall to
    // 1-(1-p)^8 ≈ 0.67 while still pruning candidates per table 16x
    val lsh = Similarity.lshCosineTopK(emb, probes, "vec_id", "embedding",
        k = 5, nbits = 4, tables = 8)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (lsh intersect exact).size.toDouble / exact.size
    assert(recall >= 0.45, s"recall=$recall (lsh=${lsh.size}, exact=${exact.size})")
  }

  test("lsh buckets are deterministic and identical vectors collide") {
    val b = vecs.select($"vec_id", Similarity.lshBucket($"embedding", 8).as("b"))
      .as[(Long, Long)].collect().toMap
    val b2 = vecs.select($"vec_id", Similarity.lshBucket($"embedding", 8).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b == b2)
    // opposite vectors land in complementary-ish buckets, not the same
    assert(b(0L) != b(4L))
  }

  test("lsh top pairs matches brute-force top-20 on real embeddings") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Similarity.bruteForcePairs(emb, "vec_id", "embedding", threshold = -2.0)
      .orderBy(desc("sim"), $"id_a", $"id_b").limit(20)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    // corpus-derived parameters (no explicit nbits/tables): n=500 must
    // land on the coarse oracle-exact point
    assert(Similarity.lshTopPairsPolicy(500) == ((2, 16)))
    val lsh = Similarity.lshTopPairs(emb, "vec_id", "embedding", n = 20)
      .orderBy(desc("sim"), $"id_a", $"id_b")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    assert(lsh == exact)
  }

  test("lsh top pairs: mass-duplicate collapse is answer-preserving; null vectors excluded") {
    // 300 copies of ONE vector share every sign bucket at any nbits —
    // the skew no selectivity knob can split. The n+1-smallest-ids
    // collapse must keep the LSH answer EQUAL to brute force over the
    // full corpus (dominance argument in Similarity.lshTopPairs), and
    // a null embedding must take part in no pair instead of NPE-ing
    // the bucket expression (both were r9 review findings).
    val rnd = new scala.util.Random(77)
    val base = Array.fill(16)(rnd.nextFloat())
    val dups = (0 until 300).map(i => (1000L + i, base))
    val distinctVecs = (0 until 50).map(i =>
      (2000L + i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val withNull = Seq((3000L, null.asInstanceOf[Array[Float]]))
    val corpus = (dups ++ distinctVecs ++ withNull).toDF("vec_id", "embedding")
    val exact = Similarity.bruteForcePairs(
        corpus.filter($"embedding".isNotNull), "vec_id", "embedding", threshold = -2.0)
      .orderBy(desc("sim"), $"id_a", $"id_b").limit(20)
      .select($"id_a", $"id_b", round($"sim", 9)).as[(Long, Long, Double)].collect().toSeq
    // corpusSize forces the LSH branch (the floor path would broadcast)
    val lsh = Similarity.lshTopPairs(corpus, "vec_id", "embedding", n = 20,
        corpusSize = Some(1000000L))
      .orderBy(desc("sim"), $"id_a", $"id_b")
      .select($"id_a", $"id_b", round($"sim", 9)).as[(Long, Long, Double)].collect().toSeq
    assert(lsh == exact, s"lsh=$lsh\nexact=$exact")
    // the top-20 must be exactly the sim-1.0 pairs among the 20+1
    // smallest duplicate ids (pid-asc tie-break)
    assert(lsh.forall(_._3 == 1.0))
    assert(lsh.forall(p => p._1 >= 1000L && p._2 <= 1020L))
  }

  test("lsh top pairs is exact for ids beyond 2^31 on both branches") {
    // real corpora key by 64-bit content hashes; the r9 packed
    // (id_a << 32) | id_b pair key silently corrupted above 2^31 and
    // guarded with a raise — the two-long pair identity must instead
    // just WORK, on the floor (broadcast all-pairs) branch and the LSH
    // bucket branch alike, including negative hash values
    val rnd = new scala.util.Random(99)
    val ids = Seq(5000000000L, 9223372036854775000L, -42L, 3L << 40, 7L, -5000000001L)
    val corpus = ids.map(id => (id, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val exact = Similarity.bruteForcePairs(corpus, "vec_id", "embedding", threshold = -2.0)
      .orderBy(desc("sim"), $"id_a", $"id_b").limit(5)
      .select($"id_a", $"id_b", round($"sim", 9)).as[(Long, Long, Double)].collect().toSeq
    val floor = Similarity.lshTopPairs(corpus, "vec_id", "embedding", n = 5)
      .orderBy(desc("sim"), $"id_a", $"id_b")
      .select($"id_a", $"id_b", round($"sim", 9)).as[(Long, Long, Double)].collect().toSeq
    assert(floor == exact, s"floor branch:\nlsh=$floor\nexact=$exact")
    // bucket branch (corpusSize forces it past the floor): plant
    // DUPLICATE vectors under 64-bit ids — identical vectors share
    // every sign bucket at any nbits, so recall is 1 by construction
    // and the assertion tests pair IDENTITY, not LSH's probabilistic
    // recall on unrelated low-sim pairs
    val planted = ids.zipWithIndex.flatMap { case (id, i) =>
      val v = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      Seq((id, v), (id + 1000000L, v))
    }.toDF("vec_id", "embedding")
    val plantedExact = Similarity.bruteForcePairs(planted, "vec_id", "embedding", threshold = -2.0)
      .orderBy(desc("sim"), $"id_a", $"id_b").limit(6)
      .select($"id_a", $"id_b", round($"sim", 9)).as[(Long, Long, Double)].collect().toSeq
    val bucketed = Similarity.lshTopPairs(planted, "vec_id", "embedding", n = 6,
        corpusSize = Some(1000000L))
      .orderBy(desc("sim"), $"id_a", $"id_b")
      .select($"id_a", $"id_b", round($"sim", 9)).as[(Long, Long, Double)].collect().toSeq
    assert(bucketed == plantedExact, s"bucket branch:\nlsh=$bucketed\nexact=$plantedExact")
    assert(bucketed.count(_._3 == 1.0) == 6, s"expected the 6 planted dup pairs: $bucketed")
  }

  test("lsh tables sizing follows the caller's nbits, not the policy's") {
    // recall contract: (1 - p^nbits)^T <= 1e-3. Coarse buckets need few
    // tables (clamped up to 16); fine buckets need many (clamped at 64).
    // An nbits-only override must re-derive tables at ITS selectivity —
    // 16 tables sized for nbits=2 would miss ~25% of pairs at nbits=16.
    assert(Similarity.lshTablesFor(2) == 16)
    assert(Similarity.lshTablesFor(11) == Similarity.lshTopPairsPolicy(1000000)._2)
    assert(Similarity.lshTablesFor(16) == 64)
  }

  test("lsh top pairs policy bounds candidate volume at 10x fixture scale") {
    // policy shape: nbits grows with corpus size, tables clamped
    assert(Similarity.lshTopPairsPolicy(2000) == ((2, 16)))
    assert(Similarity.lshTopPairsPolicy(1000000)._1 == 11)
    assert(Similarity.lshTopPairsPolicy(1000000000L) == ((21, 64)))
    // synthetic corpus 20x the sf0.1 fixture (40k vectors, 64 dims,
    // hash-derived floats → near-balanced sign buckets). Policy gives
    // nbits=7 (128 buckets/table), tables=17 → expected reduction
    // 128/17 ≈ 7.5x vs all-pairs, growing with every further doubling.
    val n = 40000
    val dims = 64
    val syn = spark.range(n).select($"id".as("vec_id"),
      array((0 until dims).map(d =>
        ((hash($"id", lit(d)).cast("double") / Int.MaxValue)).cast("float")): _*).as("embedding"))
    val (nbits, tables) = Similarity.lshTopPairsPolicy(n, targetBucket = 500)
    val vol = Similarity.lshCandidateVolume(syn, "embedding", nbits, tables)
    val allPairs = n.toLong * (n - 1) / 2
    // balanced buckets give ~ tables * n * targetBucket / 2; allow 2x
    // slack for imbalance. Both bounds must hold: linear-in-n, and far
    // below the all-pairs volume a fixture-tuned nbits=2 degrades to.
    assert(vol <= 2L * tables * n * 500 / 2, s"volume $vol vs linear bound")
    assert(vol <= allPairs / 5, s"volume $vol vs all-pairs $allPairs")
  }

  test("lsh near-dup default nbits is corpus-derived: volume stays linear at 10x fixture") {
    // regression: a FIXED nbits=8 default has constant selectivity, so
    // Σ bucket² grows quadratically once n >> 2^8. The policy default
    // grows nbits with log2(n) instead; single-table near-dup uses the
    // policy's nbits with tables=1.
    val n = 40000
    val dims = 64
    val syn = spark.range(n).select($"id".as("vec_id"),
      array((0 until dims).map(d =>
        ((hash($"id", lit(d)).cast("double") / Int.MaxValue)).cast("float")): _*).as("embedding"))
    val (nbits, _) = Similarity.lshTopPairsPolicy(n, targetBucket = 500)
    val vol = Similarity.lshCandidateVolume(syn, "embedding", nbits, tables = 1)
    assert(vol <= 2L * n * 500 / 2, s"single-table volume $vol vs linear bound ${2L * n * 500 / 2}")
    // and the planted-duplicate recall contract survives the policy
    // default (identical vectors share sign bits at every nbits)
    val small = syn.filter($"vec_id" < 200)
    val planted = small.withColumn("vec_id", $"vec_id" + 100000)
    val pairs = Similarity.lshNearDupPairs(small.unionByName(planted),
        "vec_id", "embedding", threshold = 0.999, corpusSize = Some(400))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 200L).foreach(i => assert(pairs.contains((i, i + 100000L)), s"vec $i"))
  }

  test("lsh top pairs plan: no nested loop at scale; bounded broadcast at the floor") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // the SCALE path (policy past its nbits floor — the 100 TB shape)
    // must never plan a nested loop or cartesian
    val plan = Similarity.lshTopPairs(emb, "vec_id", "embedding", n = 20,
        corpusSize = Some(1000000L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    // the bucket-scored shape has NO join anywhere: pairs are scored
    // inside the bucket group and never rejoin the vector payload (the
    // r8 pair-explode shape SortMergeJoined vectors back in twice and
    // was 48x slower at a 10x corpus — SCALE_CURVE.md)
    assert(!plan.contains("Join"), plan.take(2000))
    // at the policy FLOOR (corpus within ~4 buckets' worth) the direct
    // broadcast pair enumeration is chosen DELIBERATELY: the tables'
    // buckets would cover ~all pairs anyway, 16× redundantly, plus a
    // distinct shuffle — the bounded NLJ is strictly less work there
    val floorPlan = Similarity.lshTopPairs(emb, "vec_id", "embedding", n = 20)
      .queryExecution.executedPlan.toString
    assert(floorPlan.contains("BroadcastNestedLoopJoin"), floorPlan.take(2000))
    // and the fast path is EXACT: identical to brute-force top-20
    val fastTop = Similarity.lshTopPairs(emb, "vec_id", "embedding", n = 20)
      .select($"id_a", $"id_b", round($"sim", 6)).as[(Long, Long, Double)]
      .collect().toSet
    val bruteTop = Similarity.bruteForcePairs(emb, "vec_id", "embedding", -2.0)
      .orderBy(desc("sim"), $"id_a", $"id_b").limit(20)
      .select($"id_a", $"id_b", round($"sim", 6)).as[(Long, Long, Double)]
      .collect().toSet
    assert(fastTop == bruteTop,
      "floor fast path must return the exact all-pairs top-20")
    // the brute-force diagnostic, by contrast, IS a nested loop — the
    // rename is honest about it
    val brute = Similarity.bruteForcePairs(emb, "vec_id", "embedding", -2.0)
      .queryExecution.executedPlan.toString
    assert(brute.contains("BroadcastNestedLoopJoin") || brute.contains("CartesianProduct"))
  }

  test("int8 quantization: bounds, rounding, and near-1 cosine fidelity") {
    val out = Seq((0L, Array(1.0f, -0.5f, 0.25f)))
      .toDF("vec_id", "embedding")
      .select(Similarity.quantizeInt8($"embedding").as("z"))
      .select($"z.scale", $"z.q").as[(Double, Seq[Byte])].collect().head
    assert(math.abs(out._1 - 1.0 / 127) < 1e-15)
    // floor(v/scale + 0.5): 127, floor(-63.0)= -63, floor(32.25)=32
    assert(out._2 == Seq[Byte](127, -63, 32), out._2)
    // fidelity on real embeddings: dequantized cosine stays near 1
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dv = transform($"embedding", x => x.cast("double"))
    val qd = transform(Similarity.quantizeInt8($"embedding").getField("q"), x => x.cast("double"))
    val minCos = emb.select((Similarity.dot(dv, qd) /
        (sqrt(Similarity.dot(dv, dv)) * sqrt(Similarity.dot(qd, qd)))).as("c"))
      .agg(min($"c")).as[Double].collect().head
    assert(minCos > 0.999, s"quantization lost too much: $minCos")
  }

  test("graft_topk eval is non-destructive (window-aggregate safe)") {
    // running top-2 over an expanding window: every frame must rank from
    // the SAME buffer — a destructive eval truncates later frames
    val rows = Seq((1, 0.1, 10L), (1, 0.9, 11L), (1, 0.5, 12L))
      .toDF("g", "sim", "id")
    rows.createOrReplaceTempView("topk_win")
    graft.plans.GraftExpressions.register(spark)
    val out = spark.sql(
      """SELECT size(graft_topk(sim, id, 2) OVER
        |  (PARTITION BY g ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS n
        |FROM topk_win""".stripMargin)
      .as[Int].collect().sorted.toSeq
    assert(out == Seq(1, 2, 2), out)
  }
}

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("token counts, fingerprint, language id") {
    val df = Seq(
      (1L, "The quick brown fox, version 2.0!"),
      (2L, "der hund und die katze und der vogel ist nicht da"),
      (3L, "le chat et la maison est une belle chose"),
      (4L, "")).toDF("id", "text")
    val out = df.select($"id",
      TextFunctions.wsTokenCount($"text").as("ws"),
      TextFunctions.bpeTokenCount($"text").as("bpe"),
      TextFunctions.langId($"text").as("lang"),
      TextFunctions.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L)._1 == 6)
    // trained-BPE count must agree with the kernel applied word by word
    // (plumbing check: compiled tokenizer → expression → pinned literal)
    val expectedBpe = "The quick brown fox, version 2.0!".toLowerCase
      .split("\\s+").filter(_.nonEmpty)
      .map(w => graft.functions.Bpe.tokenCount(w, graft.functions.Bpe.pinnedMerges)).sum
    assert(out(1L)._2 == expectedBpe)
    assert(out(1L)._3 == "en")
    assert(out(2L)._3 == "de")
    assert(out(3L)._3 == "fr")
    assert(out(4L)._3 == "und")
    // fingerprint ignores case + extra spaces
    val fps = Seq((1L, "Hello  World"), (2L, "hello world"))
      .toDF("id", "text")
      .select(TextFunctions.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("chunking: token-bounded chunks, remainder tail, empty doc -> no chunks") {
    val df = Seq(
      (1L, "a b c d e f g"),   // 7 words, chunk=3 → 3 chunks (3,3,1)
      (2L, "x y"),             // fewer than chunk → 1 chunk
      (3L, "   ")).toDF("doc_id", "text")
    val chunks = df.select($"doc_id",
      TextFunctions.chunkText($"text", 3).as("cs"))
      .as[(Long, Seq[String])].collect().toMap
    assert(chunks(1L) == Seq("a b c", "d e f", "g"))
    assert(chunks(2L) == Seq("x y"))
    assert(chunks(3L) == Nil)
  }

  test("shingles: n-grams for long docs, whole-doc for short") {
    val out = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
      .select($"id", TextFunctions.shingleSet($"text", 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L).toSet == Set("a b c", "b c d"))
    assert(out(2L) == Seq("a b"))
  }

  test("fingerprint canonicalizes tab/newline edges, not just spaces") {
    val fps = Seq((1L, "foo bar"), (2L, "\nfoo\tbar "), (3L, "  FOO  BAR"), (4L, "foobar"))
      .toDF("id", "text")
      .select($"id", TextFunctions.fingerprint($"text").as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) == fps(3L))
    assert(fps(1L) != fps(4L))
  }

  test("rolling hash is order-sensitive where the shingle set is not") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("id", "text")
      .select($"id",
        TextFunctions.rollingHash($"text").as("rh"),
        TextFunctions.shingleSet($"text", 1).as("ss"))
    val rows = df.as[(Long, Long, Seq[String])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(rows(1L)._2 == rows(2L)._2)   // same token set
    assert(rows(1L)._1 != rows(2L)._1)   // different order → different hash
    // deterministic across evaluations
    val again = Seq((1L, "alpha beta gamma")).toDF("id", "text")
      .select(TextFunctions.rollingHash($"text")).as[Long].head()
    assert(again == rows(1L)._1)
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("real image decode: PNG and BMP round-trip dims, bands, pixel means") {
    // ids 0 (PNG) and 6 (PNG), 3 (BMP) and 9 (BMP): all id%3==0 → image
    val ids = Seq(0L, 3L, 6L, 9L).toDF("doc_id")
    val decoded = Multimodal.decode(Multimodal.synthesize(ids, "doc_id"))
    decoded.select("media_id", "width", "height", "channels", "features")
      .collect().foreach { r =>
        val id = r.getLong(0)
        val (w, h) = Multimodal.imageDims(id)
        val (red, green, blue) = Multimodal.imageColor(id)
        assert(r.getInt(1) == w && r.getInt(2) == h, s"dims for id=$id")
        assert(r.getInt(3) == 3, s"bands for id=$id")
        // solid color + lossless codec → band means are EXACT
        assert(r.getSeq[Float](4) == Seq(red.toFloat, green.toFloat, blue.toFloat),
          s"pixel means for id=$id must equal the fill color")
      }
    // the two ids hit different containers (png/bmp), proving both codecs
    val mimes = Multimodal.synthesize(ids, "doc_id")
      .select($"media_id", $"meta.mime").as[(Long, String)].collect().toMap
    assert(mimes(0L) == "image/png" && mimes(3L) == "image/bmp")
  }

  test("real WAV decode: rate, frame count, channel count, PCM mean/RMS") {
    val ids = Seq(1L, 4L, 103L).toDF("doc_id") // id%3==1 → audio
    val decoded = Multimodal.decode(Multimodal.synthesize(ids, "doc_id"))
    decoded.select("media_id", "channels", "sample_rate", "n_samples", "features")
      .collect().foreach { r =>
        val id = r.getLong(0)
        val (sr, n, amp) = Multimodal.audioParams(id)
        assert(r.getInt(1) == 1 && r.getInt(2) == sr, s"format for id=$id")
        assert(r.getLong(3) == n, s"frame count for id=$id")
        val feats = r.getSeq[Float](4)
        assert(feats(0) == amp.toFloat, s"PCM mean for id=$id must equal the amplitude")
        assert(math.abs(feats(1) - math.abs(amp)) < 0.5, s"RMS of a constant signal is |amp| (id=$id)")
      }
  }

  test("synthesized MJPEG video decodes REAL per-frame pixel statistics") {
    val ids = Seq(2L, 5L, 8L).toDF("doc_id") // doc_id % 3 == 2 → video
    val decoded = Multimodal.decode(Multimodal.synthesize(ids, "doc_id"))
    decoded.select($"media_id", $"features").as[(Long, Seq[Float])].collect()
      .foreach { case (id, feats) =>
        assert(feats.length == 8)
        // features = (mean, std) per frame: the mean must track each
        // frame's encoded solid gray within JPEG DC quantization, and
        // a solid frame has ~zero contrast
        (0 until Multimodal.VideoFrames).foreach { f =>
          val g = Multimodal.videoFrameGray(id, f)
          assert(math.abs(feats(2 * f) - g) <= 3.0f,
            s"media $id frame $f: decoded mean ${feats(2 * f)} vs encoded gray $g")
          assert(feats(2 * f + 1) <= 3.0f, s"media $id frame $f: solid frame has contrast")
        }
      }
  }

  test("non-MJPEG video bytes fall back to the documented stand-in; frame sampling + real image resize") {
    val docs = Seq((2L, "some media content here"), (5L, "other bytes")).toDF("doc_id", "text")
    val payloads = Multimodal.asPayloadTable(docs, "doc_id", "text") // video/mp4
    val metaFields = payloads.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields == Multimodal.MetaSchema.fields.map(f => (f.name, f.dataType)).toSeq)

    val decoded = Multimodal.decode(payloads, videoFeatureDim = 8)
    val r = decoded.filter($"media_id" === 2L)
      .select("width", "height", "channels", "sample_rate", "n_samples").collect()(0)
    assert((0 to 4).forall(r.isNullAt), "raw text bytes are no ISO-BMFF: no dims/rate")
    assert(decoded.select(size($"features")).as[Int].collect().forall(_ == 8))
    // deterministic: same payload → same features, run to run
    val f1 = decoded.filter($"media_id" === 2L).select("features").as[Seq[Float]].collect()(0)
    val f2 = Multimodal.decode(payloads, 8).filter($"media_id" === 2L)
      .select("features").as[Seq[Float]].collect()(0)
    assert(f1 == f2)

    val frames = Multimodal.sampleFrames(payloads, 4)
    assert(frames.count() == 8)
    assert(frames.groupBy("media_id").count().select("count").as[Long].collect().forall(_ == 4))

    // non-image payloads keep the bounded byte-range thumbnail
    val resized = Multimodal.resize(decoded, 32, 32)
    val t = resized.filter($"media_id" === 2L)
      .select("thumb_width", "thumb_height", "thumb").collect()(0)
    assert(t.getInt(0) == 32 && t.getInt(1) == 32)
    assert(t.getAs[Array[Byte]](2).length <= 32 * 32 / 64 + 1)

    // image payloads get a REAL rescale: the thumb decodes as a 32×32
    // PNG whose pixels keep the source's solid fill color
    val img = Multimodal.synthesize(Seq(6L).toDF("doc_id"), "doc_id")
    val thumb = Multimodal.resize(img, 32, 32)
      .select("thumb").collect()(0).getAs[Array[Byte]](0)
    val buf = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(thumb))
    assert(buf.getWidth == 32 && buf.getHeight == 32)
    val (red, green, blue) = Multimodal.imageColor(6L)
    val rgb = buf.getRGB(16, 16)
    assert(((rgb >> 16) & 0xFF) == red && ((rgb >> 8) & 0xFF) == green && (rgb & 0xFF) == blue)
  }
}

class ClustersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("clusters: chains close transitively, components stay separate") {
    // 1-2, 2-3, 3-4 is one chain (diameter 3); 10-11 separate; 20-21, 21-22
    // a vee; 30 never appears (callers map absent ids to themselves)
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (22L, 21L))
      .toDF("id_a", "id_b")
    val got = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("clusters: empty pair list yields empty labels; self-loop is benign") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.clusters(empty).count() == 0)
    val self = Seq((5L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.clusters(self).as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 6L -> 5L))
  }

  test("clusters equal driver-side union-find on random graphs") {
    // fixed-seed random graphs across the shapes that break naive
    // propagation: sparse chains (deep diameter), dense blobs (heavy
    // multi-edge), and many tiny components (convergence on round 1)
    val rnd = new scala.util.Random(4242)
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.map(x => x -> find(x)).toMap
    }
    for (trial <- 1 to 8) {
      val n = 20 + rnd.nextInt(60)
      val m = 1 + rnd.nextInt(3 * n)
      val edges = (1 to m).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val want = unionFind(n, edges)
        val got = Dedup.clusters(edges.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"trial $trial: n=$n m=$m")
      }
    }
  }

  test("clusters: maxIterations binds on an adversarial long chain") {
    // a 12-node path needs ~11 hash-min rounds; cap at 3 must fail loudly
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.clusters(chain, maxIterations = 3).collect()
    }
    assert(e.getMessage.contains("maxIterations"))
    // and the default cap resolves it to a single min-1 component
    val got = Dedup.clusters(chain).as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L) && got.size == 12)
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "alpha beta gamma delta", "a", 22),
    (2L, "epsilon zeta eta theta", "a", 22),
    (3L, "iota kappa lambda mu", "a", 20),
    (4L, "nu xi omicron pi", "b", 16),
    (5L, "rho sigma tau upsilon", "b", 21),
    (6L, "alpha beta gamma delta extra", "b", 28) // shares 3-grams with doc 1
  ).toDF("doc_id", "text", "source", "n_chars")

  test("hash split is deterministic and covers every row exactly once") {
    val s1 = Sampling.hashSplit(docs, "text").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val s2 = Sampling.hashSplit(docs, "text").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(s1 == s2)
    assert(s1.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(s1.values.forall(v => v == "train" || v == "val"))
    // identical text → identical split regardless of id
    val dup = Sampling.hashSplit(
      docs.withColumn("doc_id", $"doc_id" + 100), "text")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    s1.foreach { case (id, sp) => assert(dup(id + 100) == sp) }
  }

  test("stratified sample keeps exactly ceil(fraction*n) rows per stratum") {
    val out = Sampling.stratifiedSample(docs, "source", "text", "doc_id", 0.5)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // both strata have 3 docs → ceil(1.5) = 2 kept
    assert(out == Map("a" -> 2L, "b" -> 2L))
    // deterministic: same rows every run
    val ids1 = Sampling.stratifiedSample(docs, "source", "text", "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    val ids2 = Sampling.stratifiedSample(docs, "source", "text", "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
  }

  test("property: threshold selection == the window formulation it replaced") {
    // keepRankedPrefix must pick EXACTLY the rows a per-stratum
    // row_number() over (md5(text), id) would — random corpora with
    // skewed strata, duplicate texts (hash ties broken by id), null
    // text (ranks first), across several fractions incl. 0 and 1
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(909)
    val rows = (1L to 400L).map { i =>
      val src = s"s${rnd.nextInt(4)}"
      val text = if (rnd.nextInt(40) == 0) null
        else if (rnd.nextInt(10) == 0) "shared duplicate text"
        else s"doc ${rnd.nextInt(200)} ${rnd.nextString(5)}"
      (i, text, src, Option(text).map(_.length).getOrElse(0))
    }
    val df = rows.toDF("doc_id", "text", "source", "n_chars")
    for (f <- Seq(0.0, 0.13, 0.5, 1.0)) {
      val got = Sampling.stratifiedSample(df, "source", "text", "doc_id", f)
        .select("doc_id").as[Long].collect().toSet
      val wr = Window.partitionBy($"source")
        .orderBy(md5($"text".cast("binary")), $"doc_id")
      val wn = Window.partitionBy($"source")
      val want = df.withColumn("__rn", row_number().over(wr))
        .withColumn("__n", count(lit(1)).over(wn))
        .filter($"__rn" <= ceil($"__n" * f))
        .select("doc_id").as[Long].collect().toSet
      assert(got == want, s"fraction=$f: got ${got.size}, want ${want.size}, " +
        s"diff ±${(got -- want).take(5)} / ${(want -- got).take(5)}")
    }
  }

  test("source mixing: proportional targets, shortfall caps, unlisted sources dropped") {
    // weights a:2 b:1 over 6 rows budget → targets ceil(2/3·6)=4 (a has
    // only 3 → cap) and ceil(1/3·6)=2; source c is unlisted → dropped
    val extra = docs.union(Seq((7L, "unlisted source row", "c", 19))
      .toDF("doc_id", "text", "source", "n_chars"))
    val kept = Sampling.mixSources(extra, "source", "text", "doc_id",
        Map("a" -> 2.0, "b" -> 1.0), totalRows = 6)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept == Map("a" -> 3L, "b" -> 2L))
    // deterministic: same call → same rows
    val ids1 = Sampling.mixSources(extra, "source", "text", "doc_id",
      Map("a" -> 2.0, "b" -> 1.0), 6).select("doc_id").as[Long].collect().toSet
    val ids2 = Sampling.mixSources(extra, "source", "text", "doc_id",
      Map("a" -> 2.0, "b" -> 1.0), 6).select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
  }

  test("budget packing: no bin starts after the budget boundary it fills") {
    val out = Sampling.packBudget(docs, "source", "doc_id", "n_chars", 40L)
      .select("source", "doc_id", "bin").as[(String, Long, Long)].collect()
    // source a: cum-before = 0, 22, 44 → bins 0, 0, 1
    val a = out.filter(_._1 == "a").sortBy(_._2).map(_._3).toSeq
    assert(a == Seq(0L, 0L, 1L), a)
    // source b: cum-before = 0, 16, 37 → bins 0, 0, 0
    val b = out.filter(_._1 == "b").sortBy(_._2).map(_._3).toSeq
    assert(b == Seq(0L, 0L, 0L), b)
  }

  test("property: two-phase prefix sum == the per-stratum window formulation") {
    // random strata and token counts; the bucket-split running sum must
    // assign every row the exact bin the single-window formulation
    // would, at several bucket widths (incl. buckets > rows) and with a
    // null order key (nulls-first parity)
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(311)
    val rows = (1L to 500L).map { i =>
      (i, s"s${rnd.nextInt(3)}", 1 + rnd.nextInt(40))
    }
    val df = rows.toDF("doc_id", "source", "tok")
      .withColumn("doc_id", when($"doc_id" === 7L, lit(null)).otherwise($"doc_id"))
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("__cum", sum($"tok").over(w))
      .withColumn("bin", floor(($"__cum" - $"tok") / 100L))
      .select($"doc_id", $"bin").as[(Option[Long], Long)].collect().toSet
    for (b <- Seq(2, 8, 64, 1000)) {
      val got = Sampling.packBudget(df, "source", "doc_id", "tok", 100L, buckets = b)
        .select($"doc_id", $"bin").as[(Option[Long], Long)].collect().toSet
      assert(got == want, s"buckets=$b")
    }
  }

  test("sequence packing: hand-checked spans, conservation, full fills") {
    // source a tokens: 22, 22, 20 (stream 0..63); seqLen 16 →
    // doc1 spans seqs 0-1, doc2 spans 1-2, doc3 spans 2-3 (44..63)
    val out = Sampling.packSequences(docs, "source", "doc_id", "n_chars", 16L)
      .select("source", "seq_id", "n_docs", "n_starts", "tokens")
      .as[(String, Long, Long, Long, Long)].collect()
    val a = out.filter(_._1 == "a").sortBy(_._2)
    assert(a.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(a.map(_._3).toSeq == Seq(1L, 2L, 2L, 1L), a.toSeq)   // n_docs
    assert(a.map(_._4).toSeq == Seq(1L, 1L, 1L, 0L), a.toSeq)   // n_starts
    assert(a.map(_._5).toSeq == Seq(16L, 16L, 16L, 16L), a.toSeq)
    // conservation per stratum: filled tokens == token stream length;
    // every doc starts exactly once; all but the last seq are full
    val b = out.filter(_._1 == "b").sortBy(_._2)
    assert(b.map(_._5).sum == 16 + 21 + 28)
    assert(b.map(_._4).sum == 3)
    assert(b.dropRight(1).forall(_._5 == 16L) && b.last._5 <= 16L)
  }

  test("property: sequence packing == the naive window formulation") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(271)
    val rows = (1L to 400L).map { i =>
      (i, s"s${rnd.nextInt(3)}", 1 + rnd.nextInt(50))
    }
    val df = rows.toDF("doc_id", "source", "tok")
    val L = 64L
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("__cum", sum($"tok").over(w))
      .withColumn("__s", ($"__cum" - $"tok").cast("long"))
      .withColumn("__e", ($"__cum" - 1).cast("long"))
      .withColumn("seq_id", explode(sequence(expr(s"__s div ${L}L"), expr(s"__e div ${L}L"))))
      .groupBy($"source", $"seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(expr(s"__s div ${L}L") === $"seq_id", 1).otherwise(0)).cast("long").as("n_starts"),
        sum(least($"__e", ($"seq_id" + 1) * L - 1) - greatest($"__s", $"seq_id" * L) + 1)
          .cast("long").as("tokens"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    for (b <- Seq(2, 64, 1000)) {
      val got = Sampling.packSequences(df, "source", "doc_id", "tok", L, buckets = b)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got == want, s"buckets=$b")
    }
  }

  test("contamination finds exactly the corpus docs sharing an n-gram") {
    val test = docs.filter($"doc_id" === 1L)
    val corpus = docs.filter($"doc_id" =!= 1L)
    val cont = Sampling.contaminated(corpus, test, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(cont == Set(6L), cont) // only doc 6 shares "alpha beta gamma"
  }

  test("property: shard layout's bucketed positions == the per-shard window formulation") {
    // random corpus large enough that shards span multiple hash buckets
    // in aggregate; the bucketed offset+rank decomposition must equal a
    // plain per-shard row_number over (md5, id) exactly, and (shard,
    // pos) must be a permutation: every shard covers 1..n_shard densely
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 400).map { i =>
      // duplicate texts on purpose: the row-unique hash must scatter them
      val t = if (i % 17 == 0) "shared duplicate text" else s"doc ${rnd.nextInt(100000)} body $i"
      (i.toLong, t)
    }.toDF("doc_id", "text")
    val fast = Sampling.shardLayout(corpus, "text", "doc_id")
      .select($"doc_id", $"shard", $"pos").as[(Long, String, Long)]
      .collect().toSet
    val h = md5(concat(coalesce($"text", lit("")), lit(" "),
      $"doc_id".cast("string")).cast("binary"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(substring(h, 1, 1)).orderBy(h, $"doc_id")
    val ref = corpus.select($"doc_id", substring(h, 1, 1).as("shard"),
        row_number().over(w).cast("long").as("pos"))
      .as[(Long, String, Long)].collect().toSet
    assert(fast == ref, "bucketed shard positions differ from the window formulation")
    // permutation: per shard, positions are exactly 1..n
    fast.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3) == (1L to rows.size).toSet, s"shard $s positions not dense")
    }
    // determinism across runs
    val again = Sampling.shardLayout(corpus, "text", "doc_id")
      .select($"doc_id", $"shard", $"pos").as[(Long, String, Long)].collect().toSet
    assert(again == fast)
  }

  test("shard layout: null text still row-unique via id, duplicates scatter, wider nibbles honored") {
    val withNull = docs.unionByName(
      Seq((99L, null.asInstanceOf[String], "a", 0)).toDF("doc_id", "text", "source", "n_chars"))
    val out = Sampling.shardLayout(withNull, "text", "doc_id")
      .select($"doc_id", $"shard", $"pos").as[(Long, String, Long)].collect()
    // the null-text row participates (hash over '' + id), no row lost
    assert(out.map(_._1).toSet == withNull.select($"doc_id").as[Long].collect().toSet)
    // the hash is ROW-unique: many copies of one text must NOT collapse
    // into one (shard, bucket) — the hot-boilerplate shape (review
    // catch). With 64 copies and 16 shards, P(all in one shard) ≈ 16^-63.
    val dups = (0 until 64).map(i => (1000L + i, "the same boilerplate text"))
      .toDF("doc_id", "text")
    val shards = Sampling.shardLayout(dups, "text", "doc_id")
      .select($"shard").as[String].collect().toSet
    assert(shards.size > 1, s"duplicate texts collapsed into shard(s) $shards")
    val two = Sampling.shardLayout(docs, "text", "doc_id", nibbles = 2)
      .select($"shard").as[String].collect()
    assert(two.forall(_.length == 2))
    intercept[IllegalArgumentException](Sampling.shardLayout(docs, "text", "doc_id", 0))
  }
}

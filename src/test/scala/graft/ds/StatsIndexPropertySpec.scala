package graft.ds

import java.nio.file.Files
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Generative superset invariant for stats-index pruning, END TO END:
  * real parquet files, ranges built by [[StatsIndex.build]] from real
  * footers and round-tripped through the sidecar (write + load), then
  * for ANY predicate the grammar can produce (comparisons, IN-lists,
  * IS NULL/NOT NULL, AND/OR nesting, boundary/NaN/out-of-domain
  * literals): every file holding a row that SPARK says matches must
  * survive [[StatsIndex.prunedFiles]]. The oracle is Spark's own
  * predicate evaluation over `input_file_name()` — not this module's
  * reading of it — so a bug anywhere in the pipeline (footer stats
  * extraction, serialization, constraint extraction, overlap logic)
  * surfaces as a pruned-but-matching file. */
class StatsIndexPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- real dataset: 8 parquet files with overlapping ranges ---------
  private val NFiles = 8
  /** Tag alphabet crosses UTF-8 width classes (ASCII, 2/3/4-byte) plus
    * empty string and TSV-hostile tab/newline — the byte-order and
    * serialization edges. */
  private val TagPool: Vector[String] = Vector(
    "", "a", "apple", "banana", "k0042", "k9999", "zz",
    "é-accent", "中文字", "�fffd", "𐀀supp", "🚀rocket", "tab\tval", "nl\nval")
  private lazy val ds: GraftDataset = {
    val d = GraftDataset(Files.createTempDirectory("graft_stats_prop").toString + "/ds")
    val rng = new scala.util.Random(42)
    val groups = (0 until 400).map { _ =>
      (rng.nextInt(NFiles), rng.nextInt(1000).toLong,
        if (rng.nextInt(5) == 0) null else java.lang.Long.valueOf(rng.nextInt(100).toLong),
        rng.nextInt(10000) / 10.0,
        TagPool(rng.nextInt(TagPool.size)))
    }.groupBy(_._1)
    groups.toSeq.sortBy(_._1).foreach { case (_, rs) =>
      rs.map { case (_, id, opt, score, tag) => (id, opt, score, tag) }
        .toDF("id", "opt", "score", "tag")
        .coalesce(1).write.mode("append").parquet(d.path)
    }
    d
  }
  /** Built from REAL footers, then re-loaded — serialization included. */
  private lazy val idx: StatsIndex.Index = {
    StatsIndex.build(spark, ds, Seq("id", "opt", "score", "tag"))
    StatsIndex.load(ds.fs(spark), ds.path).get
  }
  private lazy val allFiles: Seq[String] = ds.dataFiles(spark)
  private lazy val df = {
    val d = spark.read.parquet(ds.path)
      .withColumn("file", element_at(split(input_file_name(), "/"), -1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    d.count(); d
  }
  private def basename(f: String): String = f.substring(f.lastIndexOf('/') + 1)

  // ---- predicate grammar ---------------------------------------------
  private val longLit: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(-50L, 1100L), Gen.oneOf(0L, 999L, 1000L, -1L))
  private val dblLit: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-10.0, 1100.0), Gen.oneOf(0.0, 999.9, Double.NaN, Double.PositiveInfinity))

  // string probes: in-domain values, prefixes, out-of-domain, boundary
  private val strLit: Gen[String] = Gen.oneOf(
    Gen.oneOf(TagPool.filter(_.nonEmpty)),
    Gen.oneOf("", "app", "k", "k5000", "zzz", "�", "𐀀", "中", "\t", "ZZZ", "🚀"))

  private val leaf: Gen[Column] = Gen.oneOf(
    longLit.map(v => col("id") > v), longLit.map(v => col("id") >= v),
    longLit.map(v => col("id") < v), longLit.map(v => col("id") <= v),
    longLit.map(v => col("id") === v), longLit.map(v => lit(v) > col("id")),
    Gen.listOfN(3, longLit).map(vs => col("id").isin(vs: _*)),
    Gen.listOfN(2, longLit).map(vs => col("opt").isin(vs: _*)),
    longLit.map(v => col("opt") <= v),
    Gen.const(col("opt").isNull), Gen.const(col("opt").isNotNull),
    dblLit.map(v => col("score") < v), dblLit.map(v => col("score") >= v),
    dblLit.map(v => col("score") === v),
    strLit.map(v => col("tag") > v), strLit.map(v => col("tag") >= v),
    strLit.map(v => col("tag") < v), strLit.map(v => col("tag") <= v),
    strLit.map(v => col("tag") === v), strLit.map(v => lit(v) >= col("tag")),
    Gen.listOfN(3, strLit).map(vs => col("tag").isin(vs: _*)))

  private val pred: Gen[Column] = for {
    a <- leaf; b <- leaf; c <- leaf
    shape <- Gen.choose(0, 4)
  } yield shape match {
    case 0 => a
    case 1 => a && b
    case 2 => a || b
    case 3 => (a && b) && c
    case 4 => (a || b) && c
  }

  test("pruning is a superset of Spark-matching files for random predicates") {
    val prop = Prop.forAll(pred) { p =>
      val matching = df.filter(p).select("file").distinct()
        .as[String].collect().toSet
      val kept = StatsIndex.prunedFiles(ds.fs(spark), ds.path, idx, allFiles, p)
        .map(basename).toSet
      val lost = matching -- kept
      if (lost.nonEmpty)
        println(s"LOST $lost for predicate $p (kept ${kept.size}/${allFiles.size})")
      lost.isEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, res.status.toString)
  }

  test("random spec-style truncation of string bounds keeps the superset invariant") {
    // Writers may compact binary bounds: min cut to ANY prefix (even a
    // spec-violating naive cut stays a valid lower bound), max cut to a
    // prefix with its last byte incremented (parquet-mr's rule; kept
    // whole when every byte is 0xFF). Pruning against randomly
    // truncated ranges must still keep every Spark-matching file.
    def truncMax(b: Array[Byte], cut: Int): Array[Byte] = {
      val p = b.take(math.max(1, cut))
      var i = p.length - 1
      while (i >= 0 && p(i) == -1) i -= 1
      if (i < 0) b
      else { val q = p.take(i + 1); q(i) = (q(i) + 1).toByte; q }
    }
    val seedGen = Gen.choose(0L, Long.MaxValue)
    val prop = Prop.forAll(pred, seedGen) { (p, seed) =>
      val rng = new scala.util.Random(seed)
      val cut = StatsIndex.Index(idx.cols, idx.files.map { case (f, byCol) =>
        f -> byCol.map {
          case (c, r) if r.kind == "s" && r.smax.nonEmpty =>
            c -> r.copy(
              smin = r.smin.take(rng.nextInt(r.smin.length + 1)),
              smax = truncMax(r.smax, 1 + rng.nextInt(r.smax.length)))
          case kv => kv
        }
      })
      val matching = df.filter(p).select("file").distinct().as[String].collect().toSet
      val kept = StatsIndex.prunedFiles(ds.fs(spark), ds.path, cut, allFiles, p)
        .map(basename).toSet
      val lost = matching -- kept
      if (lost.nonEmpty) println(s"TRUNC LOST $lost for predicate $p seed $seed")
      lost.isEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, res.status.toString)
  }

  test("pruning actually fires on selective predicates (not vacuously safe)") {
    // a narrow equality should drop most of the 8 overlapping files at
    // least for SOME probes
    val fired = (0 until 50).exists { i =>
      StatsIndex.prunedFiles(ds.fs(spark), ds.path, idx, allFiles, col("id") === i.toLong)
        .size < allFiles.size
    }
    assert(fired, "no probe pruned anything — the index or extraction is dead")
  }
}

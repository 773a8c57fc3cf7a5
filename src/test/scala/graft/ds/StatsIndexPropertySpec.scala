package graft.ds

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Generative superset invariant for stats-index pruning: for ANY
  * predicate the grammar can produce (comparisons, IN-lists, IS NULL,
  * AND/OR nesting, boundary/NaN/out-of-domain literals) and ANY
  * grouping of rows into files, every file holding a row that SPARK
  * says matches must survive [[StatsIndex.prunedFiles]]. The oracle is
  * Spark's own predicate evaluation — not this module's reading of it —
  * so extraction bugs (a mis-flipped operator, a wrongly-understood OR,
  * a kind confusion) surface as a pruned-but-matching file here. */
class StatsIndexPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- fixed random dataset: 8 "files" with overlapping ranges -------
  private val NFiles = 8
  private val rng = new scala.util.Random(42)
  // (file, id, opt, score) — tuples, not an inner case class (Spark
  // cannot synthesize encoders for test-class inner types)
  private lazy val rows: Seq[(String, Long, java.lang.Long, Double)] = (0 until 400).map { i =>
    val f = rng.nextInt(NFiles)
    (s"f$f.parquet", rng.nextInt(1000).toLong,
      if (rng.nextInt(5) == 0) null else java.lang.Long.valueOf(rng.nextInt(100).toLong),
      rng.nextInt(10000) / 10.0)
  }
  private lazy val df = {
    val d = rows.toDF("file", "id", "opt", "score")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    d.count(); d
  }

  /** The index exactly as footerRanges would record it: min/max over
    * non-null values per file, null counts, column omitted when the
    * file is all-null for it. */
  private lazy val idx: StatsIndex.Index = {
    val byFile = rows.groupBy(_._1)
    StatsIndex.Index(Seq("id", "opt", "score"), byFile.map { case (rel, rs) =>
      val ids = rs.map(_._2)
      val opts = rs.flatMap(r => Option(r._3).map(_.longValue()))
      val scores = rs.map(_._4)
      val cols = Seq(
        Some("id" -> StatsIndex.ColRange("l", BigDecimal(ids.min), BigDecimal(ids.max), 0L)),
        if (opts.isEmpty) None
        else Some("opt" -> StatsIndex.ColRange("l", BigDecimal(opts.min), BigDecimal(opts.max),
          rs.count(_._3 == null).toLong)),
        Some("score" -> StatsIndex.ColRange("d", BigDecimal(scores.min), BigDecimal(scores.max), 0L))
      ).flatten.toMap
      rel -> cols
    })
  }

  private val root = "/graft_prop_ds"
  private lazy val fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)
  private lazy val allFiles: Seq[String] = idx.files.keys.toSeq.sorted.map(r => s"$root/$r")

  // ---- predicate grammar ---------------------------------------------
  private val longLit: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(-50L, 1100L), Gen.oneOf(0L, 999L, 1000L, -1L))
  private val dblLit: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-10.0, 1100.0), Gen.oneOf(0.0, 999.9, Double.NaN, Double.PositiveInfinity))

  private val leaf: Gen[Column] = Gen.oneOf(
    longLit.map(v => col("id") > v), longLit.map(v => col("id") >= v),
    longLit.map(v => col("id") < v), longLit.map(v => col("id") <= v),
    longLit.map(v => col("id") === v), longLit.map(v => lit(v) > col("id")),
    Gen.listOfN(3, longLit).map(vs => col("id").isin(vs: _*)),
    Gen.listOfN(2, longLit).map(vs => col("opt").isin(vs: _*)),
    longLit.map(v => col("opt") <= v),
    Gen.const(col("opt").isNull), Gen.const(col("opt").isNotNull),
    dblLit.map(v => col("score") < v), dblLit.map(v => col("score") >= v),
    dblLit.map(v => col("score") === v))

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
      val kept = StatsIndex.prunedFiles(fs, root, idx, allFiles, p)
        .map(_.stripPrefix(s"$root/")).toSet
      val lost = matching -- kept
      if (lost.nonEmpty)
        println(s"LOST $lost for predicate $p (kept ${kept.size}/${allFiles.size})")
      lost.isEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(res.passed, res.status.toString)
  }

  test("pruning actually fires on selective predicates (not vacuously safe)") {
    // a narrow equality should drop most of the 8 overlapping files at
    // least for SOME probes; sample a few ids present in one file only
    val fired = (0 until 50).exists { i =>
      StatsIndex.prunedFiles(fs, root, idx, allFiles, col("id") === i.toLong)
        .size < allFiles.size
    }
    assert(fired, "no probe pruned anything — the index or extraction is dead")
  }
}

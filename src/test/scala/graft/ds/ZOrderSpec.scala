package graft.ds

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import scala.jdk.CollectionConverters._

/** Z-order vs linear clustering, measured on parquet footer stats: the
  * z-layout must prune range predicates on EITHER clustered dimension,
  * where lexicographic clusterBy(x) prunes only x. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** One footer pass per file, all requested columns per block — the
    * multi-column (box) checks need block-aligned ranges, and aligning
    * by zipping independent per-column listings would only be correct
    * while two listings happen to order identically. */
  private def rowGroupRangesAll(ds: GraftDataset, columns: Seq[String]): Seq[Seq[(Long, Long)]] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    ds.dataFiles(spark).flatMap { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), hconf))
      try r.getFooter.getBlocks.asScala.toSeq.map { b =>
        columns.map { column =>
          val s = b.getColumns.asScala.find(_.getPath.toDotString == column)
            .getOrElse(fail(s"no $column column chunk in $f")).getStatistics
          (s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            s.genericGetMax.asInstanceOf[java.lang.Long].longValue())
        }
      } finally r.close()
    }
  }

  private def rowGroupRanges(ds: GraftDataset, column: String): Seq[(Long, Long)] =
    rowGroupRangesAll(ds, Seq(column)).map(_.head)

  private def hitFraction(ranges: Seq[(Long, Long)], lo: Long, hi: Long): Double =
    ranges.count { case (mn, mx) => mx >= lo && mn <= hi }.toDouble / ranges.size

  test("interleave puts each column's bits at its stride") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b")), 3).as("z"))
      .as[Long].collect().toSeq
    // a bits at even positions, b at odd: (a,b)=(1,0)→1, (0,1)→2,
    // (3,3)→15, (5,2)→0b100+0b010011 = a bits {0,2}→{0,4}, b bit {1}→{3}
    assert(rows == Seq(0L, 1L, 2L, 15L, 0x19L))
  }

  test("z-order prunes BOTH dimensions; linear clustering prunes only its own") {
    val n = 250000L
    val side = 500L // x in [0,500), y in [0,500)
    val base = spark.range(n).select(
        ($"id" % side).as("x"), floor($"id" / side).cast("long").as("y"),
        concat(lit("pad_"), $"id").as("v"))
      .withColumn("h", xxhash64($"x", $"y")).repartition(4).sortWithinPartitions("h").drop("h")

    val dir = Files.createTempDirectory("graft_zorder").toString
    val linear = GraftDataset(s"$dir/linear")
    val zed = GraftDataset(s"$dir/zed")
    DatasetWriter(linear, rowGroupSize = Some(2000L)).withClusterBy("x").write(spark, base)
    DatasetWriter(zed, rowGroupSize = Some(2000L))
      .write(spark, ZOrder.arrange(base, Seq("x", "y"), bits = 10, numPartitions = Some(4)))

    val (xlo, xhi) = (100L, 120L) // 4% of the x domain
    val (ylo, yhi) = (200L, 220L) // 4% of the y domain
    val linX = hitFraction(rowGroupRanges(linear, "x"), xlo, xhi)
    val linY = hitFraction(rowGroupRanges(linear, "y"), ylo, yhi)
    val zX = hitFraction(rowGroupRanges(zed, "x"), xlo, xhi)
    val zY = hitFraction(rowGroupRanges(zed, "y"), ylo, yhi)
    info(f"hit fractions — linear: x $linX%.2f y $linY%.2f; zorder: x $zX%.2f y $zY%.2f")

    // linear clusterBy(x): selective on x, blind on y (the control that
    // makes the z comparison meaningful)
    assert(linX <= 0.30, f"clusterBy(x) must prune x ($linX%.2f)")
    assert(linY >= 0.90, f"clusterBy(x) must NOT prune y ($linY%.2f) — else the fixture is degenerate")
    // z-order: selective on BOTH single dimensions
    assert(zX <= 0.60, f"z-order must prune x alone ($zX%.2f)")
    assert(zY <= 0.60, f"z-order must prune y alone ($zY%.2f)")

    // the conjunctive box is what z-order is FOR: row groups where both
    // column ranges overlap are far fewer than either alone
    val zRanges = rowGroupRangesAll(zed, Seq("x", "y"))
    val boxHits = zRanges.count { case Seq((xmn, xmx), (ymn, ymx)) =>
      xmx >= xlo && xmn <= xhi && ymx >= ylo && ymn <= yhi
    }
    info(s"z-order box hit: $boxHits of ${zRanges.size}")
    assert(boxHits.toDouble / zRanges.size <= 0.15,
      s"box predicate must prune hard under z-order ($boxHits/${zRanges.size})")

    // layout-only: same rows in both datasets
    assert(spark.read.parquet(s"$dir/zed").count() == n)
    assert(spark.read.parquet(s"$dir/zed").agg(sum($"x" + $"y")).head.getLong(0) ==
      spark.read.parquet(s"$dir/linear").agg(sum($"x" + $"y")).head.getLong(0))
  }

  test("63-bit ids past 2^53 keep distinct monotone buckets (no double clumping)") {
    // 8192 adjacent snowflake-style ids just under Long.MaxValue: a
    // double roundtrip quantizes them to ulp(2^63)=1024 clumps (~9
    // distinct buckets); exact long bucketing must spread them over
    // ~2^12 buckets and stay monotone
    val base = Long.MaxValue - 8192L
    val df = spark.range(8192L).select(($"id" + base).as("id"))
    val z = df.select($"id", ZOrder.zValue(df, Seq("id"), bits = 12).as("z"))
      .orderBy("id").as[(Long, Long)].collect()
    val distinct = z.map(_._2).distinct.length
    assert(distinct > 1000, s"expected ~4096 distinct buckets past 2^53, got $distinct")
    assert(z.sliding(2).forall { case Array(a, b) => a._2 <= b._2 },
      "bucketing must stay monotone in the id")
    assert(z.forall { case (_, zv) => zv >= 0 && zv < (1L << 12) },
      "single-column z equals the bucket and must stay inside [0, 2^bits)")

    // full-domain span (hi-lo overflows signed long) falls back to the
    // double path without error
    val wide = Seq(Long.MinValue + 1, -1L, 0L, 1L, Long.MaxValue - 1).toDF("id")
    val wz = wide.select(ZOrder.zValue(wide, Seq("id"), bits = 12).as("z"))
      .as[Long].collect()
    assert(wz.forall(v => v >= 0 && v < (1L << 12)))
  }

  test("nulls and constant columns bucket to zero instead of failing") {
    val df = Seq((Some(1L), 7L), (None, 7L), (Some(5L), 7L)).toDF("a", "c")
    val arranged = ZOrder.arrange(df, Seq("a", "c"), bits = 4, numPartitions = Some(1))
    assert(arranged.count() == 3) // constant c (min==max) and null a both survive
  }

  test("DATE columns z-order through the exact day lattice (no numeric-cast crash)") {
    // Spark forbids date→double, so dates must ride the unix_date long
    // path; day-adjacent dates must land in order-preserving buckets
    val df = (0 until 64).map(i =>
      (java.sql.Date.valueOf(f"2024-${1 + i / 28}%02d-${1 + i % 28}%02d"), i.toLong))
      .toDF("d", "k")
    val arranged = ZOrder.arrange(df, Seq("d", "k"), bits = 6, numPartitions = Some(1))
    assert(arranged.count() == 64)
    // single-column z-value over the date alone is monotone in the date
    val z = df.select(col("d"), ZOrder.zValue(df, Seq("d"), bits = 6).as("z"))
      .orderBy("d").select("z").as[Long].collect()
    assert(z.zip(z.tail).forall { case (a, b) => a <= b }, "date buckets must be monotone")
    assert(z.distinct.length > 1, "distinct days must spread across buckets")
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement behind the round-16 dedup de-skew: `Dedup.exact`'s old
  * row_number-window formulation vs the `min_by` aggregate, on a corpus
  * where ONE text owns a configurable share of all rows — the
  * boilerplate/empty-document shape that turns a fingerprint-keyed
  * window into a single unbounded task. Both formulations produce the
  * identical kept set (asserted per run); only the execution shape
  * differs.
  *
  * Usage: runMain graft.tools.SkewDedupProbe <n> <hotShare>
  *          [window|agg|cnt|both]  — `cnt` runs the count-window vs
  *          groupBy-join pair (the dupClusters shapes); `both` runs
  *          all four
  * Env: SPARK_GRAFT_REPS (default 2), SPARK_GRAFT_CPUS (default 32).
  */
object SkewDedupProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SkewDedupProbe <n> <hotShare> [window|agg|cnt|both]")
    val n = args(0).toLong
    val hotShare = args(1).toDouble
    val mode = if (args.length > 2) args(2) else "both"
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .appName("graft-skewdedupprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // deterministic corpus: `hotShare` of rows carry the same ~200-char
    // boilerplate text (one fingerprint, ~n·hotShare duplicates); the
    // rest are unique. Parquet-materialized so generation stays outside
    // the timed region.
    // per-mille in the path: whole-percent truncation collided sub-1%
    // shares onto one cached corpus (review catch, round 16)
    require(hotShare >= 0.001 && hotShare <= 1.0,
      s"hotShare must be in [0.001, 1] (pmod(id, 1000) grid), got $hotShare")
    val path = s"target/scale/skewdedup_n${n}_h${(hotShare * 1000).round}"
    val done = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = done.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(done)) {
      System.err.println(s"[skewdedup] generating n=$n hotShare=$hotShare at $path")
      val boiler = ("lorem ipsum dolor sit amet " * 8).trim
      spark.range(0, n, 1, 32)
        .select(col("id").as("doc_id"),
          // .round like the cache key above — .toLong truncates
          // (0.3*1000 = 299.999… → 299‰) and desynchronizes the data
          // from the label/cache key by one per-mille bucket
          when(pmod(col("id"), lit(1000)) < lit((hotShare * 1000).round), lit(boiler))
            .otherwise(concat(lit("doc body "), col("id").cast("string"),
              lit(" payload "), md5(col("id").cast("string")))).as("text"))
        .write.mode("overwrite").parquet(path)
    }
    val corpus = spark.read.parquet(path)

    val fp = md5(col("text").cast("binary"))
    def windowForm(): DataFrame = {
      val w = Window.partitionBy(col("__fp")).orderBy(col("doc_id"))
      corpus.withColumn("__fp", fp)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn", "__fp")
    }
    def aggForm(): DataFrame = {
      val rowStruct = struct(corpus.columns.toIndexedSeq.map(col): _*)
      corpus.withColumn("__fp", fp)
        .groupBy(col("__fp"))
        .agg(min_by(rowStruct, col("doc_id")).as("__m"))
        .select(col("__m.*"))
    }
    // identical kept sets, asserted once before timing
    val kw = windowForm().agg(count(lit(1)), sum(col("doc_id"))).collect()(0)
    val ka = aggForm().agg(count(lit(1)), sum(col("doc_id"))).collect()(0)
    require(kw == ka, s"formulations disagree: window=$kw agg=$ka")

    // the shapes the round-16 fixes actually replaced: an UNFILTERED
    // per-key count window (dupClusters' cluster_size) vs the
    // groupBy-join — rank-1-filter windows get Spark's WindowGroupLimit
    // partial pushdown, but a count window (or an unfiltered rank flag)
    // does not: every hot-key row lands in ONE window task
    def cntWindowForm(): DataFrame = {
      val w = Window.partitionBy(col("__fp"))
      corpus.withColumn("__fp", fp)
        .withColumn("grp_size", count(lit(1)).over(w))
        .drop("__fp")
    }
    def cntAggForm(): DataFrame = {
      val keyed = corpus.withColumn("__fp", fp)
      val sizes = keyed.groupBy(col("__fp")).agg(count(lit(1)).as("grp_size"))
      keyed.join(sizes, Seq("__fp")).drop("__fp")
    }
    val paths: Seq[(String, () => DataFrame)] = Seq(
      "window" -> (() => windowForm()), "agg" -> (() => aggForm()),
      "cntwindow" -> (() => cntWindowForm()), "cntagg" -> (() => cntAggForm()))
      .filter { case (p, _) => mode == "both" || mode == p ||
        (mode == "cnt" && p.startsWith("cnt")) }
    for ((pname, build) <- paths) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        force(build())
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        sec
      }
      println(f"""{"skew_dedup":{"n":$n,"hot":$hotShare,"path":"$pname","sec":${times.min}%.3f,"reps":$reps}}""")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-growth rehearsal driver: times a fixed set of contract keys
  * across fixture directories of increasing scale and prints one JSON
  * line per (dir, key) with the min wall time over `reps` runs — the
  * raw numbers behind SCALE_CURVE.md. Same session shape as Bench
  * (local[32], 32 shuffle partitions) so curves compare against the
  * per-round bench lines.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.tools.ScaleCurve \
  *          <dir1> <dir2> ... -- <key1> <key2> ...
  */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val sep = args.indexOf("--")
    require(sep > 0 && sep < args.length - 1,
      "usage: ScaleCurve <dir...> -- <key...>")
    val dirs = args.take(sep)
    val keys = args.drop(sep + 1)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .appName("graft-scalecurve").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // JVM/codegen warmup on the smallest fixture, mirroring Bench
    force(graft.SparkEntry.entry(spark))
    for (dir <- dirs; key <- keys) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        force(graft.SparkEntry.queries(key)(spark, dir))
        val sec = (System.nanoTime() - t0) / 1e9
        // cache teardown between reps stays OUTSIDE the timed region —
        // it grows with what the query cached and would add
        // scale-correlated overhead to the curve being judged
        spark.catalog.clearCache()
        sec
      }
      println(f"""{"curve":{"dir":"$dir","key":"$key","sec":${times.min}%.3f,"reps":$reps}}""")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** One contract key, one fixture, configurable shuffle width — the
  * experiment tool behind the round-15 x_dedup_ngram finding: a FIXED
  * `spark.sql.shuffle.partitions` means per-partition shuffle volume
  * grows linearly with corpus scale, and once a sort/aggregate no
  * longer fits its task memory the stage tips into spill — wall time
  * goes super-linear with ZERO change in the plan or the candidate
  * volume. AQE can only coalesce DOWN from
  * `coalescePartitions.initialPartitionNum`, so the scale-correct
  * session shape is a high initial width with AQE picking the actual
  * width per stage from advisory sizes.
  *
  * Usage: WidthProbe <dir> <key> [reps]
  * Env: SPARK_GRAFT_PARTS (static width, default 32),
  *      SPARK_GRAFT_INIT_PARTS (AQE initialPartitionNum, optional).
  */
object WidthProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: WidthProbe <dir> <key> [reps]")
    val dir = args(0); val key = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "32")
    val init = sys.env.get("SPARK_GRAFT_INIT_PARTS")
    var b = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
    init.foreach { n =>
      b = b.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", n)
    }
    val spark = b.appName("graft-widthprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    force(graft.SparkEntry.entry(spark))
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      force(graft.SparkEntry.queries(key)(spark, dir))
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); System.gc()
      s
    }
    println(f"""{"width_probe":{"dir":"$dir","key":"$key","parts":$parts,"init":"${init.getOrElse("-")}","sec":${times.min}%.3f,"reps":$reps}}""")
    spark.stop()
  }
}

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
    // graft_q_* temp-dataset litter sweep, mirroring Bench: a full-set
    // batch run otherwise accumulates GBs of dead write/stream output
    // and the TAIL keys get measured against a polluted page cache —
    // worse, the pollution grows with fixture scale, which would read
    // as a super-linear curve on innocent keys
    val tmpRoot = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    def sweepTmp(): Unit =
      try {
        val it = java.nio.file.Files.list(tmpRoot)
        try {
          val iter = it.iterator()
          while (iter.hasNext) {
            val d = iter.next()
            if (d.getFileName.toString.startsWith("graft_q_"))
              try {
                val walk = java.nio.file.Files.walk(d)
                try {
                  val paths = new java.util.ArrayList[java.nio.file.Path]()
                  walk.forEach(p => { paths.add(p); () })
                  java.util.Collections.reverse(paths)
                  paths.forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
                } finally walk.close()
              } catch { case _: Throwable => () } // best-effort hygiene
          }
        } finally it.close()
      } catch { case _: Throwable => () }
    // JVM/codegen warmup on the smallest fixture, mirroring Bench
    force(graft.SparkEntry.entry(spark))
    for (dir <- dirs; key <- keys) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        force(graft.SparkEntry.queries(key)(spark, dir))
        val sec = (System.nanoTime() - t0) / 1e9
        // cache/litter teardown between reps stays OUTSIDE the timed
        // region — it grows with what the query cached/wrote and would
        // add scale-correlated overhead to the curve being judged
        spark.catalog.clearCache()
        sweepTmp()
        System.gc()
        sec
      }
      println(f"""{"curve":{"dir":"$dir","key":"$key","sec":${times.min}%.3f,"reps":$reps}}""")
    }
    spark.stop()
  }
}

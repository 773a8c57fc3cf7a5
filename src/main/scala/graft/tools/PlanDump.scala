package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: write each declared query's `explain("formatted")` to
  * `plans/<tag>/<key>_<suffix>.txt` so optimization rounds can commit
  * before/after plan evidence (Exchange count, join strategy,
  * PushedFilters/ReadSchema, codegen spans) next to the code.
  *
  * Usage: runMain graft.tools.PlanDump <tag> <suffix> [key ...]
  * (no keys = every key in SparkEntry.queries). Env knobs match
  * TimeOne so the captured plans are the ones the isolated lane runs:
  * SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS (8),
  * SPARK_GRAFT_SHUFFLE (8).
  *
  * NOTE: for keys whose builder performs eager work (writes,
  * streaming), the captured plan is the RETURNED DataFrame's — the
  * read-back side of the contract. Internal write-stage plans are
  * probed by the dedicated stage tools (DeltaStageProbe et al.).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <tag> <suffix> [key ...]")
    val tag = args(0); val suffix = args(1)
    val keys = if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(outDir)
    keys.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] $n ok")
      } catch { case e: Throwable =>
        println(s"[plandump] $n FAILED: $e")
      }
      spark.catalog.clearCache()
      Hygiene.sweepTmp()
    }
    spark.stop()
  }
}

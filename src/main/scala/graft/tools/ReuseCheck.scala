package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: execute a query and dump the FINAL (post-AQE) physical
  * plan, counting scans and reused stages — the ground truth for "did
  * the shared sub-plan actually execute once?" (static explain shows
  * the pre-AQE plan, where runtime stage reuse is invisible; the
  * round-17 span-dedup triage needed exactly this view). */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan
      var scans = 0; var reused = 0; var exchanges = 0
      plan.foreachUp {
        case p if p.getClass.getSimpleName.contains("ReusedExchange") => reused += 1
        case p if p.getClass.getSimpleName.contains("FileSourceScan") => scans += 1
        case p if p.getClass.getSimpleName.contains("ShuffleExchange") => exchanges += 1
        case _ =>
      }
      // AQE wraps reused stages differently — count those too
      val s = plan.toString
      val reusedStages = "ReusedQueryStage|ShuffleQueryStage [0-9]+ \\(reuses".r
        .findAllIn(s).length
      println(s"[reusecheck] $n scans=$scans exchanges=$exchanges " +
        s"reusedExchange=$reused reusedStageMentions=$reusedStages")
      println(s)
    }
    spark.stop()
  }
}

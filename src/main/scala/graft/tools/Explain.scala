package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted plans for the headline queries to audit
  * pushdown (PushedFilters), column pruning (ReadSchema), broadcast
  * choices, and whole-stage-codegen coverage. */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
      "q6_forecast_revenue", "x_sim_brute_topk")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}

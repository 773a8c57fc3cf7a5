package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev tool: execute a query and walk the FINAL (post-AQE) physical
  * plan, counting scans, exchanges and reused stages — the ground
  * truth for "did the shared sub-plan actually execute once?" (static
  * explain shows the pre-AQE plan, where runtime stage reuse is
  * invisible; the round-17 span-dedup triage needed exactly this
  * view, and the round-17 verdict ordered a whole-contract sweep).
  *
  * With no args, sweeps EVERY SparkEntry key and prints one summary
  * line per key; with args, checks those keys and (under
  * SPARK_GRAFT_REUSE_DUMP=1) dumps the final plan. The walk descends
  * into AdaptiveSparkPlanExec/QueryStageExec (plain `foreach` stops at
  * stage boundaries — counts under AQE would otherwise read 0) and
  * executes the query through its OWN QueryExecution (`toRdd.count`),
  * because a noop write spawns a separate one and never finalizes the
  * inspected plan's stages. */
object ReuseCheck {

  /** Depth-first walk crossing AQE/stage/subquery boundaries. */
  def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    kids.foreach(walk(_)(f))
    p.subqueries.foreach(walk(_)(f))
  }

  case class Counts(scans: Int, exchanges: Int, reused: Int,
      dupScanPaths: Seq[String])

  def count(plan: SparkPlan): Counts = {
    var scans = 0; var exchanges = 0; var reused = 0
    val scanPaths = scala.collection.mutable.ArrayBuffer.empty[String]
    walk(plan) { p =>
      val n = p.getClass.getSimpleName
      if (n.contains("ReusedExchange") || n.contains("ReusedSubquery")) reused += 1
      else p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          scans += 1
          // root path: enough to spot the same table scanned twice
          scanPaths += f.relation.location.rootPaths.mkString(",")
        case _ if n.contains("FileSourceScan") => scans += 1
        case _ if n.contains("ShuffleExchange") || n.contains("BroadcastExchange") =>
          exchanges += 1
        case _ =>
      }
    }
    val dup = scanPaths.groupBy(identity).filter(_._2.size > 1)
      .map { case (k, v) => s"$k x${v.size}" }.toSeq.sorted
    Counts(scans, exchanges, reused, dup)
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys =
      if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    keys.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, dir)
        // execute THIS QueryExecution so AQE finalizes its stages
        df.queryExecution.toRdd.count()
        val c = count(df.queryExecution.executedPlan)
        val dupNote = if (c.dupScanPaths.isEmpty) ""
          else s" dupScans=[${c.dupScanPaths.mkString("; ")}]"
        println(s"[reusecheck] $n scans=${c.scans} exchanges=${c.exchanges} " +
          s"reused=${c.reused}$dupNote")
        if (sys.env.contains("SPARK_GRAFT_REUSE_DUMP"))
          println(df.queryExecution.executedPlan.toString)
      } catch { case e: Throwable =>
        println(s"[reusecheck] $n FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      Hygiene.sweepTmp()
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Attribution probe for `x_quality_filter`'s post-fusion residual
  * (round-17 judge ask #2). The fused [[graft.plans.TextMarkerStats]]
  * kernel collapses to ONE call per row in a Project (whole-stage
  * codegen subexpression elimination), but the quality GATE evaluates
  * its predicate in FilterExec — and after PushPredicateThroughNonJoin
  * inlines the q/lang aliases into the filter condition, the two
  * conjuncts each carry their own kernel subtree. This probe counts
  * `.profile(`/`.gate(` call sites in the generated code of each
  * candidate shape and times them:
  *
  *  - `composed` — select(q, lang) then filter: the PRE-round-18
  *    shipping shape, kept for the A/B record (16 call sites)
  *  - `condagg`  — no Filter at all: the gate becomes a conditional
  *    SUM inside the aggregate, then HAVING n_docs > 0 (1 call —
  *    HashAggregate does CSE)
  *  - `current`  — whatever ExtQueries.qualityFilter ships, which
  *    since round 18 is the fused one-call TextQualityGate
  *  - `textstats` — the Project-CSE reference point
  */
object GateShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale/sf1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE off ONLY for the codegen inspection: under AQE the
      // WholeStageCodegen stages are inserted lazily per query stage,
      // and `df.write` runs a separate QueryExecution — the df's own
      // plan never materializes stages to count
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.debug._

    def shapes: Map[String, DataFrame] = Map(
      "current" -> graft.queries.ExtQueries.qualityFilter(spark, dir),
      "condagg" -> {
        val d = graft.Tables.load(spark, dir, "documents")
        d.groupBy("source")
          .agg(sum(when(TextFunctions.qualityScore(col("text")) >= 0.6 &&
            TextFunctions.langId(col("text")) === "en", 1L).otherwise(0L)).as("n_docs"))
          .filter(col("n_docs") > 0)
          .orderBy("source")
      },
      "composed" -> {
        // the pre-round-18 shipping shape, kept for the A/B record
        val d = graft.Tables.load(spark, dir, "documents")
        d.select(col("source"),
            TextFunctions.qualityScore(col("text")).as("q"),
            TextFunctions.langId(col("text")).as("lang_pred"))
          .filter(col("q") >= 0.6 && col("lang_pred") === "en")
          .groupBy("source").agg(count(lit(1)).as("n_docs"))
          .orderBy("source")
      },
      "textstats" -> graft.queries.ExtQueries.textStats(spark, dir))

    shapes.toSeq.sortBy(_._1).foreach { case (name, df) =>
      if (sys.env.contains("SPARK_GRAFT_PROBE_PLANS")) {
        println(s"==== $name optimized ====")
        println(df.queryExecution.optimizedPlan.toString.take(4000))
      }
      // run once first: under AQE the WholeStageCodegen subtrees only
      // exist in the FINAL plan, after execution materializes it —
      // and codegenString doesn't traverse INTO AdaptiveSparkPlanExec,
      // so unwrap to the final physical plan explicitly
      df.write.format("noop").mode("overwrite").save()
      val phys = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val gen = codegenString(phys)
      sys.env.get("SPARK_GRAFT_PROBE_DUMP").foreach { d =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$d/gen_$name.txt"),
          (phys.toString + "\n\n" + gen).getBytes("UTF-8"))
      }
      val calls = "\\.profile\\(".r.findAllIn(gen).size +
        "\\.gate\\(".r.findAllIn(gen).size
      val times = (1 to reps).map { _ =>
        val fresh = shapes(name)
        val t0 = System.nanoTime()
        fresh.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[gateshape] $name%-8s profileCalls=$calls%2d " +
        f"min=${times.min}%.2f runs=[${times.map(t => f"$t%.2f").mkString(",")}]")
    }
    spark.stop()
  }
}

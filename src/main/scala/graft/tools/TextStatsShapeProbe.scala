package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Attribution probe for x_text_stats' sf100 super-linear tail
  * (round 18: 6.54 → 86.8 s for a 10× decade while x_quality_filter /
  * x_seq_pack — same scan, same kernels, MORE aggregate work — stay
  * sub-linear). Times component shapes so the regression is attributed
  * to a column or to the global result sort, not guessed. */
object TextStatsShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale/sf10")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = graft.Tables.load(spark, dir, "documents")
    def base = docs.select(
      col("doc_id"),
      TextFunctions.wsTokenCount(col("text")).as("n_words"),
      TextFunctions.bpeTokenCount(col("text")).as("bpe_tokens"),
      length(col("text")).as("n_chars_measured"),
      TextFunctions.qualityScore(col("text")).as("quality"),
      TextFunctions.langId(col("text")).as("lang_pred"),
      TextFunctions.fingerprint(col("text")).as("fp"))

    val shapes: Seq[(String, () => DataFrame)] = Seq(
      "full_sorted" -> (() => base.orderBy("doc_id")),
      "no_sort" -> (() => base),
      "no_fp_sorted" -> (() => base.drop("fp").orderBy("doc_id")),
      "no_bpe_sorted" -> (() => base.drop("bpe_tokens").orderBy("doc_id")),
      "kernel_only" -> (() => docs.select(col("doc_id"),
        TextFunctions.wsTokenCount(col("text")).as("n_words"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.langId(col("text")).as("lang_pred"))),
      "bpe_only" -> (() => docs.select(col("doc_id"),
        TextFunctions.bpeTokenCount(col("text")).as("bpe_tokens"))),
      "fp_only" -> (() => docs.select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))),
      // fix candidates: stage the range exchange on the CHEAP side so
      // RangePartitioner's sampling pass does not re-execute the
      // expensive projection (the hypothesis for full_sorted ~= 2x
      // no_sort)
      "sort_input_first" -> (() => docs
        .repartitionByRange(8, col("doc_id")).sortWithinPartitions("doc_id")
        .select(
          col("doc_id"),
          TextFunctions.wsTokenCount(col("text")).as("n_words"),
          TextFunctions.bpeTokenCount(col("text")).as("bpe_tokens"),
          length(col("text")).as("n_chars_measured"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.langId(col("text")).as("lang_pred"),
          TextFunctions.fingerprint(col("text")).as("fp"))),
      "orderby_below" -> (() => docs.orderBy("doc_id").select(
          col("doc_id"),
          TextFunctions.wsTokenCount(col("text")).as("n_words"),
          TextFunctions.bpeTokenCount(col("text")).as("bpe_tokens"),
          length(col("text")).as("n_chars_measured"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.langId(col("text")).as("lang_pred"),
          TextFunctions.fingerprint(col("text")).as("fp"))))

    shapes.foreach { case (name, mk) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[textshape] $name%-14s min=${times.min}%7.2f runs=[${times.map(t => f"$t%.2f").mkString(",")}]")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}

package graft.ds

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-shuffled) tables: the co-located join path.
  *
  * A bucketed write hash-partitions rows into a fixed number of files
  * per partition by the bucket columns and records that layout in the
  * catalog. A later join or aggregation on the bucket columns reuses
  * the layout instead of shuffling: with both sides bucketed into the
  * same count on the join key, Catalyst plans a zero-Exchange
  * sort-merge join (verified in BucketingSpec by asserting no
  * ShuffleExchange in the physical plan).
  *
  * This is the write-once/join-many answer for 100 TB fact tables —
  * the shuffle is paid at ingest, every subsequent keyed query skips
  * it. The reference has no analog (single-process DuckDB never
  * shuffles); this is Spark-first design, not a port.
  */
object Bucketing {

  /** Write `df` as a catalog table bucketed (and bucket-sorted) by
    * `cols` into `nBuckets`. Sorting within buckets lets the join skip
    * its per-task sort as well. */
  def writeBucketed(
      df: DataFrame, table: String,
      cols: Seq[String], nBuckets: Int): Unit = {
    require(cols.nonEmpty, "bucket columns required")
    df.write.format("parquet")
      .bucketBy(nBuckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }

  /** True if the physical plan of `df` contains a shuffle exchange —
    * the property bucketed joins exist to avoid. Unwraps AQE (the
    * adaptive wrapper hides the initial plan from a plain traversal). */
  def hasShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def scan(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => scan(a.initialPlan)
      case s if s.isInstanceOf[ShuffleExchangeLike] => true
      case other => other.children.exists(scan)
    }
    scan(df.queryExecution.executedPlan)
  }
}

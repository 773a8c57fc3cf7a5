package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every `SparkEntry.queries` entry receives `(spark, sfDir)`; tables are one
  * parquet file per name under sfDir. At 100 TB these would be directories of
  * many files — `spark.read.parquet(path)` handles both transparently, so
  * nothing here is local-mode-specific.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // `events.ts` is parquet TIMESTAMP(NANOS) which Spark's vectorized
    // reader rejects; read nanos as long and truncate to micros — the same
    // truncation DuckDB applies (its timestamps are micro-resolution), so
    // oracle comparisons line up exactly.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register each table as a temp view so `spark.sql` queries mirror the
    * DuckDB oracle SQL text exactly (same bare table names). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

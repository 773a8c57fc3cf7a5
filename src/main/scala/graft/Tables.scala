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
    // `events.ts` has shipped as both parquet TIMESTAMP(NANOS) and
    // TIMESTAMP(MICROS, isAdjustedToUTC=false) across fixture vintages, so
    // the loader branches on the dtype Spark actually infers rather than
    // assuming one encoding. Either branch lands on micro-resolution
    // TimestampType — the same resolution DuckDB uses — so oracle
    // comparisons line up exactly and downstream consumers (unix_micros
    // time-batching, watermarks) see one stable dtype.
    if (name == "events") {
      // Keep nanosAsLong on so a NANOS-vintage file still loads (Spark's
      // vectorized reader rejects TIMESTAMP(NANOS) otherwise); it is a
      // no-op for MICROS files.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.expr
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      raw.schema("ts").dataType match {
        // NANOS vintage (loaded as long): truncate to micros, as DuckDB does.
        case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        // MICROS vintage (isAdjustedToUTC=false loads as timestamp_ntz):
        // the wall-clock values ARE UTC instants, so shift them into the
        // session zone BEFORE the cast (cast interprets NTZ wall clock in
        // the session zone) — identical micros in any session timezone,
        // not just a UTC one; a bare cast would skew every ts by the
        // session offset and diverge from the NANOS branch.
        case TimestampNTZType => raw.withColumn("ts",
          expr("cast(convert_timezone('UTC', current_timezone(), ts) as timestamp)"))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register each table as a temp view so `spark.sql` queries mirror the
    * DuckDB oracle SQL text exactly (same bare table names). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

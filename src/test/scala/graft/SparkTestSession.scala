package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all specs (forked test JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    // INT96 (the deprecated default) writes NO comparable column
    // stats — footer row-group skipping and the file-stats index
    // are blind to timestamps without this
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

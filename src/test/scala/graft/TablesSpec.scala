package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The events.ts loader must produce identical INSTANTS whatever the
  * session timezone: the parquet fixture has shipped as both
  * TIMESTAMP(NANOS) (loads as long under nanosAsLong) and
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (loads as timestamp_ntz),
  * and both branches must land the same micro-resolution UTC instants —
  * a bare NTZ→timestamp cast would silently skew by the session offset. */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("events.ts instants are session-timezone invariant") {
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    val utc = Tables.load(spark, dir, "events")
      .agg(sum(unix_micros(col("ts"))), count(lit(1))).head
    try {
      spark.conf.set(tzKey, "America/New_York")
      val ny = Tables.load(spark, dir, "events")
        .agg(sum(unix_micros(col("ts"))), count(lit(1))).head
      assert(ny.getLong(1) == utc.getLong(1))
      assert(ny.getLong(0) == utc.getLong(0),
        s"instants skewed by session timezone: utc=${utc.getLong(0)} ny=${ny.getLong(0)}")
    } finally spark.conf.set(tzKey, prev)
  }

  test("events.ts lands as micro-resolution TimestampType") {
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(df.limit(1).count() <= 1) // loadable
  }
}

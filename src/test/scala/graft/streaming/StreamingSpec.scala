package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.Tables

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("events stream: watermark + windowed agg + idempotent delta sink") {
    val tmp = Files.createTempDirectory("graft_stream_").toString
    val srcDir = s"$tmp/src"; val sinkDir = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"

    // stage the sf0.001 events as the stream source (micros timestamps);
    // one file = one trigger, so no cross-trigger late data
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .coalesce(1).write.parquet(srcDir)

    // watermark 0s: at stream end every closed window is flushed; only
    // the window containing max(ts) can remain open in append mode
    val agg = EventsStream.windowedAgg(EventsStream.readEvents(spark, srcDir),
      window_ = "1 hour", watermark = "0 seconds")
    val q = EventsStream.startDeltaSink(agg, sinkDir, ckpt)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(sinkDir)
    val batch = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val nStreamed = streamed.count(); val nBatch = batch.count()
    assert(nBatch - nStreamed <= 3 && nStreamed > 0,
      s"streamed=$nStreamed batch=$nBatch")
    // every emitted window must agree exactly with the batch twin
    val mismatched = streamed.alias("s")
      .join(batch.alias("b"), Seq("window_start", "event_type"), "left")
      .filter(col("s.n") =!= col("b.n") || col("b.n").isNull)
    assert(mismatched.count() == 0)

    // re-running the same stream over the same source must not duplicate
    // (delta sink idempotence) — fresh checkpoint forces full replay
    val q2 = EventsStream.startDeltaSink(
      EventsStream.windowedAgg(EventsStream.readEvents(spark, srcDir),
        window_ = "1 hour", watermark = "0 seconds"),
      sinkDir, s"$tmp/ckpt2")
    q2.awaitTermination(120000)
    assert(spark.read.parquet(sinkDir).count() == nStreamed)
  }

  test("streaming dedup drops replayed event ids within the watermark") {
    val tmp = Files.createTempDirectory("graft_sdedup_").toString
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events").limit(200)
    // duplicate every event id (one clean file, one replayed file)
    ev.coalesce(1).write.parquet(s"$tmp/src")
    ev.coalesce(1).write.mode("append").parquet(s"$tmp/src")
    val deduped = EventsStream.dedupStream(EventsStream.readEvents(spark, s"$tmp/src"))
    val q = deduped.writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", s"$tmp/out").start()
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() == 200, s"got ${out.count()}")
    assert(out.select("event_id").distinct().count() == 200)
  }

  test("flatMapGroupsWithState fires one threshold alert per user") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_alert_").toString
    // deterministic synthetic stream: 3 users, values sum past 100 for two
    Seq(
      (1L, "2024-01-01 00:00:00", 1L, "click", 60.0, "{}"),
      (2L, "2024-01-01 00:01:00", 1L, "click", 50.0, "{}"),   // user 1 crosses
      (3L, "2024-01-01 00:02:00", 2L, "click", 30.0, "{}"),
      (4L, "2024-01-01 00:03:00", 2L, "click", 30.0, "{}"),   // user 2 stays below
      (5L, "2024-01-01 00:04:00", 3L, "click", 150.0, "{}"),  // user 3 crosses
      (6L, "2024-01-01 00:05:00", 1L, "click", 999.0, "{}"))  // no second alert
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .coalesce(1).write.parquet(s"$tmp/src")
    val alerts = EventsStream.thresholdAlerts(spark,
      EventsStream.readEvents(spark, s"$tmp/src"), limit = 100.0)
    val q = alerts.writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", s"$tmp/out").start()
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$tmp/out")
      .select("user_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 3L), s"got $out")
  }

  test("session windows: gap-based sessions per user") {
    val tmp = Files.createTempDirectory("graft_sess_").toString
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .write.parquet(s"$tmp/src")
    val sess = EventsStream.sessionAgg(EventsStream.readEvents(spark, s"$tmp/src"))
    val q = sess.writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", s"$tmp/out").start()
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() > 0)
    // every session holds ≥1 event and ends after it starts
    assert(out.filter(col("n_events") < 1 || col("session_end") <= col("session_start")).count() == 0)
  }
}

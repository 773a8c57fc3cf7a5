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

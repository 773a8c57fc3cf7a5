package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-micro-batch duration attribution for the x_stream_* contract
  * shapes (guide §1: measure first). StreamOverhead measures the
  * AGGREGATE per-batch floor by differencing fine vs bulk triggers;
  * this probe reads each batch's own `StreamingQueryProgress.durationMs`
  * map (triggerExecution = total; addBatch = plan execution incl. sink;
  * queryPlanning; walCommit/commitOffsets = offset+commit log writes;
  * getBatch/latestOffset = source work) plus per-operator state-store
  * commit times, so the 0.7 s/batch floor gets attributed to a
  * component instead of to "Spark machinery".
  *
  * Usage: runMain graft.tools.StreamBatchProbe <sfDir> [shape]
  * shape: window (default) | attrib | dedup | ingest
  */
object StreamBatchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val shape = if (args.length > 1) args(1) else "window"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-streambatchprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft_sbp_").toString
    val staged = s"$base/src"
    graft.Tables.load(spark, dir, "events")
      .repartitionByRange(3, col("ts"), col("event_id"))
      .sortWithinPartitions(col("ts"), col("event_id"))
      .write.parquet(staged)
    val parts = new java.io.File(staged).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      require(f.setLastModified(1000000L * (i + 1))) }

    def mkStream() = {
      val ev = graft.streaming.EventsStream.readEvents(spark, staged)
      shape match {
        case "attrib" => graft.streaming.EventsStream.attributionJoin(ev)
        case "dedup"  => graft.streaming.EventsStream.dedupStream(ev)
        case _        => graft.streaming.EventsStream.windowedAgg(ev)
      }
    }

    def run(tag: String, sink: String): Unit = {
      val t0 = System.nanoTime()
      val q =
        if (sink == "delta")
          graft.streaming.EventsStream.startDeltaSink(
            mkStream(), s"$base/sink_$tag", s"$base/ckpt_$tag")
        else
          mkStream().writeStream.format("noop")
            .option("checkpointLocation", s"$base/ckpt_$tag")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"== $tag ($sink sink) wall=$wall%.2f s")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        def g(k: String) = Option(d.get(k)).map(_.longValue).getOrElse(-1L)
        val st = p.stateOperators.map(s =>
          s"commit=${s.commitTimeMs}ms rows=${s.numRowsTotal}").mkString("; ")
        println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${g("triggerExecution")} addBatch=${g("addBatch")} " +
          s"plan=${g("queryPlanning")} wal=${g("walCommit")} " +
          s"offs=${g("commitOffsets")} getBatch=${g("getBatch")} " +
          s"latestOffset=${g("latestOffset")} state[$st]")
      }
    }

    // warmup (JVM + streaming machinery), then measured runs
    run("warm", "noop")
    run("noop1", "noop")
    run("noop2", "noop")
    if (shape == "window") { run("delta1", "delta"); run("delta2", "delta") }
    spark.stop()
  }
}

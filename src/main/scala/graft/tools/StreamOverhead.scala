package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures micro-batch ORCHESTRATION overhead for the streaming
  * contract queries: the same event-time-sliced source is run through
  * the same windowed aggregate + delta sink once file-at-a-time
  * (`filesPerTrigger=1`, the replay-proof shape the contract queries
  * use) and once all-files-one-batch (the realistic-ingest shape).
  * Both runs emit identical rows (spec-pinned in StreamingSpec
  * "filesPerTrigger batches N files..."), so the wall-time difference
  * divided by the extra batch count IS the per-micro-batch cost —
  * checkpoint fsyncs, state-store snapshot/commit, trigger planning —
  * independent of data volume. The numbers land in SCALE.md §"Streaming
  * at scale".
  *
  * Usage: runMain graft.tools.StreamOverhead <sfDir> <nSlices>
  */
object StreamOverhead {
  def main(args: Array[String]): Unit = {
    val Array(dir, nStr) = args
    val n = nStr.toInt
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      // state width 8 = the contract queries' withStateWidth(8), so the
      // per-batch number explains the x_stream_* bench lines directly
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-streamoverhead").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft_soh_").toString
    val srcDir = s"$base/src"
    // contiguous event-time slices with ascending mtimes — the
    // x_stream_e2e staging contract, so file-grained processing never
    // sees cross-batch late data and the comparison isolates BATCHING
    graft.Tables.load(spark, dir, "events")
      .repartitionByRange(n, col("ts"), col("event_id"))
      .sortWithinPartitions(col("ts"), col("event_id"))
      .write.parquet(srcDir)
    val parts = new java.io.File(srcDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      require(f.setLastModified(1000000L * (i + 1))) }

    def run(fpt: Int, tag: String): (Double, Int) = {
      val t0 = System.nanoTime()
      val q = graft.streaming.EventsStream.startDeltaSink(
        graft.streaming.EventsStream.windowedAgg(
          graft.streaming.EventsStream.readEvents(spark, srcDir, filesPerTrigger = fpt)),
        s"$base/sink_$tag", s"$base/ckpt_$tag")
      q.awaitTermination()
      ((System.nanoTime() - t0) / 1e9, q.recentProgress.count(_.numInputRows > 0))
    }
    // warmup: JVM/codegen + streaming machinery, discarded
    run(n, "warm")
    val (bulkSec, bulkBatches) = run(n, "bulk")
    val (fineSec, fineBatches) = run(1, "fine")
    val perBatch = (fineSec - bulkSec) / math.max(1, fineBatches - bulkBatches)
    println(f"""{"stream_overhead":{"slices":$n,"fine_sec":$fineSec%.2f,"fine_batches":$fineBatches,"bulk_sec":$bulkSec%.2f,"bulk_batches":$bulkBatches,"per_batch_sec":$perBatch%.3f}}""")
    spark.stop()
  }
}

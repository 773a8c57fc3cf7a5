package graft.tools
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      // INT96 (the deprecated default) writes NO comparable column
      // stats — footer row-group skipping and the file-stats index
      // are blind to timestamps without this
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L*1024*1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    force(graft.SparkEntry.entry(spark))
    args.foreach { n =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        force(graft.SparkEntry.queries(n)(spark, dir))
        println(f"[timeone] $n run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}

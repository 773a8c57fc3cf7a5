package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 optimization scratch probe: stage-times the pieces of a key
  * under investigation so a change targets the measured cost, not a
  * guess (guide §1). Edited per investigation; the committed version
  * documents the last probe run. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.OptProbe w14"
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warmup write+read paths
    locally {
      val wtmp = java.nio.file.Files.createTempDirectory("graft_q_warm").toString + "/ds"
      val wds = graft.ds.GraftDataset(wtmp)
      graft.ds.DatasetWriter(wds, graft.ds.WriteMode.Overwrite)
        .write(spark, spark.range(0, 10000).selectExpr("id", "cast(id as double) v"))
      force(spark.read.parquet(wtmp))
    }

    args.headOption.getOrElse("w14") match {
      case "w14" =>
        import graft.ds._
        val li = t("load lineitem")(graft.Tables.load(spark, dir, "lineitem"))
        for (rgs <- Seq(200L, 2000L, 10000L)) {
          val out = java.nio.file.Files.createTempDirectory("graft_q_w14probe").toString + "/ds"
          val ds = GraftDataset(out)
          t(s"write rowGroupSize=$rgs") {
            DatasetWriter(ds, WriteMode.Overwrite, rowGroupSize = Some(rgs))
              .withClusterBy("l_shipdate")
              .write(spark, li.repartition(4, col("l_orderkey")))
          }
          val files = ds.dataFiles(spark)
          val ranges = t(s"footerBlocks rgs=$rgs") {
            graft.sources.ParquetMeta.footerBlocks(spark, files) { b =>
              val c = graft.sources.ParquetMeta.blockColumn(b, "l_shipdate")
              val s = c.getStatistics
              (String.valueOf(s.genericGetMin), String.valueOf(s.genericGetMax))
            }
          }
          println(s"[probe] rgs=$rgs files=${files.size} rowGroups=${ranges.size}")
          t(s"final agg rgs=$rgs") {
            force(spark.read.parquet(out)
              .filter(col("l_shipdate").between("1995-01-01", "1995-03-31"))
              .agg(count(lit(1)).as("n_rows"),
                sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty")))
          }
          graft.tools.Hygiene.sweepTmp()
        }
      case other => sys.error(s"unknown probe $other")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ds.{DatasetWriter, GraftDataset, WriteMode}

/** Per-stage attribution of w6_delta_write (round-17 judge ask #7):
  * the key is five operations — initial write of 2/3 of orders, a
  * delta that appends the missing 1/3, an idempotent delta (pure diff,
  * zero rows written), a keyed delta (keyed diff, zero rows), and the
  * final count — so timing each one separately splits the anti-join
  * cost from the parquet write/commit floor without instrumenting the
  * writer. The idempotent stages are PURE diff cost (their write
  * commits nothing); write floor = stage time − its diff twin. */
object DeltaStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale/sf1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val orders = graft.Tables.load(spark, dir, "orders")
    val base = orders.filter(col("o_orderkey") % 3 =!= 0)
    // write-path warmup (committer init + FileFormatWriter JIT), same
    // rationale as Bench's
    locally {
      val w = java.nio.file.Files.createTempDirectory("graft_q_dwarm").toString + "/ds"
      DatasetWriter(GraftDataset(w), WriteMode.Overwrite)
        .write(spark, spark.range(0, 10000).selectExpr("id", "id % 7 as k"))
    }

    (1 to reps).foreach { rep =>
      val out = java.nio.file.Files.createTempDirectory("graft_q_dsp").toString + "/ds"
      val ds = GraftDataset(out)
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[deltastage] rep$rep $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        r
      }
      t("initial_write_2/3")(DatasetWriter(ds, WriteMode.Delta).write(spark, base))
      t("delta_append_1/3")(DatasetWriter(ds, WriteMode.Delta).write(spark, orders))
      t("delta_idempotent_diff")(DatasetWriter(ds, WriteMode.Delta).write(spark, orders))
      t("keyed_delta_diff")(DatasetWriter(ds, WriteMode.Delta)
        .withDeltaSubset("o_orderkey")
        .write(spark, orders.withColumn("o_totalprice", col("o_totalprice") + 1)))
      t("final_count")(ds.df(spark).count())
      Hygiene.sweepTmp()
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}

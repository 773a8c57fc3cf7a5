package graft.sources

import java.nio.file.Files
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Metadata row counts: exact where legal, unavailable (never wrong)
  * where the plan can change multiplicity, zero scan jobs on the
  * driver-side path. */
class ParquetMetaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val path: String = {
    val p = Files.createTempDirectory("graft_pqmeta").toString + "/t"
    (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(7).write.parquet(p)
    p
  }

  test("footer count equals count() and runs zero jobs below 64 files") {
    val df = spark.read.parquet(path)
    var jobs = 0
    val l = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val n = ParquetMeta.metadataRowCount(df)
      // listener bus is async — give any (unexpected) job time to land
      Thread.sleep(500)
      assert(n.contains(1000L))
      assert(jobs == 0, s"metadata count must not schedule scan jobs, saw $jobs")
    } finally spark.sparkContext.removeSparkListener(l)
    assert(df.count() == 1000L)
  }

  test("row-preserving plans answer; multiplicity-changing plans decline") {
    val df = spark.read.parquet(path)
    assert(ParquetMeta.metadataRowCount(df.select("id")).contains(1000L))
    assert(ParquetMeta.metadataRowCount(
      df.withColumn("x", col("id") * 2).orderBy("v")).contains(1000L))
    assert(ParquetMeta.metadataRowCount(df.repartition(3)).contains(1000L))
    assert(ParquetMeta.metadataRowCount(df.unionByName(df)).contains(2000L))

    assert(ParquetMeta.metadataRowCount(df.filter(col("id") > 10)).isEmpty)
    assert(ParquetMeta.metadataRowCount(df.limit(5)).isEmpty)
    assert(ParquetMeta.metadataRowCount(df.groupBy("v").count()).isEmpty)
    assert(ParquetMeta.metadataRowCount(df.sample(0.5)).isEmpty)
    assert(ParquetMeta.metadataRowCount(df.as("a").join(df.as("b"), "id")).isEmpty)
    assert(ParquetMeta.metadataRowCount(Seq(1, 2).toDF("x")).isEmpty,
      "non-parquet leaves must decline")
  }
}

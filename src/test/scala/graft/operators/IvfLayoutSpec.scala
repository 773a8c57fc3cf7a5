package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Proves the SCALE.md claim behind IVF at 100 TB: persist the corpus
  * hive-partitioned by its cluster id and a probe's search touches only
  * its `nprobe` partition DIRECTORIES — partition pruning happens at the
  * scan, before any file is opened. */
class IvfLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cluster-partitioned corpus prunes to nprobe directories at scan") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"embedding".as("cv"))
    val assigned = Similarity.assignClusters(emb, "vec_id", "embedding", centroids)
      .select($"corpus_id", $"cid", $"xv".as("embedding"))

    val dir = Files.createTempDirectory("graft_ivf_").toString + "/corpus"
    assigned.write.partitionBy("cid").parquet(dir)

    // all 8 cluster directories exist (every centroid id is its own
    // nearest centroid, so no cluster is empty)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dirs.map(_.takeWhile(_ != '=')).forall(_ == "cid"))
    assert(dirs.size == 8, dirs)

    // probing 2 clusters: the scan must carry a partition filter and
    // read files from exactly those 2 directories
    val probed = spark.read.parquet(dir).filter($"cid".isin(3, 5))
    val scan = probed.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty, "no partition filters pushed")
    val readDirs = scan.inputRDDs().head.partitions.length // non-empty only after pruning
    val files = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).map(_.getPath.toString)
    assert(files.nonEmpty)
    assert(files.forall(p => p.contains("cid=3") || p.contains("cid=5")), files.take(3))

    // and the pruned read returns exactly the rows of those clusters
    val expected = assigned.filter($"cid".isin(3, 5)).count()
    assert(probed.count() == expected)
    assert(readDirs >= 1)
  }
}

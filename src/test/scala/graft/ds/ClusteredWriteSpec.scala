package graft.ds

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import scala.jdk.CollectionConverters._

/** Proves write-time clustering PAYS: the same rows written with and
  * without `clusterBy` produce parquet row-group min/max stats where a
  * range predicate overlaps a small fraction of clustered row groups
  * vs essentially ALL unclustered ones — the stats the parquet reader
  * uses for row-group skipping, which after partition pruning is the
  * biggest scan-cost lever at 100 TB. Counts are recorded in SCALE.md. */
class ClusteredWriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** (min,max) of column `id` for every row group under the dataset. */
  private def rowGroupRanges(ds: GraftDataset): Seq[(Long, Long)] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    ds.dataFiles(spark).flatMap { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), hconf))
      try r.getFooter.getBlocks.asScala.toSeq.map { b =>
        val s = b.getColumns.asScala.find(_.getPath.toDotString == "id")
          .getOrElse(fail(s"no id column chunk in $f")).getStatistics
        (s.genericGetMin.asInstanceOf[Long], s.genericGetMax.asInstanceOf[Long])
      } finally r.close()
    }
  }

  private def overlapping(ranges: Seq[(Long, Long)], lo: Long, hi: Long): Int =
    ranges.count { case (mn, mx) => mx >= lo && mn <= hi }

  test("clusterBy shrinks the row groups a range predicate must scan") {
    val n = 200000L
    // deterministic worst-case arrival order: rows shuffled by hash, so
    // without clustering every row group spans ~the whole id domain
    val shuffled = spark.range(n)
      .withColumn("v", concat(lit("payload_"), $"id"))
      .withColumn("h", xxhash64($"id"))
      .repartition(4)
      .sortWithinPartitions("h")
      .drop("h")

    val dir = Files.createTempDirectory("graft_cluster").toString
    val unclustered = GraftDataset(s"$dir/plain")
    val clustered = GraftDataset(s"$dir/sorted")
    // small row groups (~256 KiB) so a 200k-row fixture yields enough
    // groups for the overlap fractions to be meaningful
    DatasetWriter(unclustered, rowGroupSize = Some(2000L)).write(spark, shuffled)
    DatasetWriter(clustered, rowGroupSize = Some(2000L)).withClusterBy("id")
      .write(spark, shuffled)

    val plainRanges = rowGroupRanges(unclustered)
    val sortedRanges = rowGroupRanges(clustered)
    assert(plainRanges.size >= 8, s"fixture too small: ${plainRanges.size} row groups")
    assert(sortedRanges.size >= 8, s"fixture too small: ${sortedRanges.size} row groups")

    // a 1%-of-domain range predicate: id BETWEEN 100k and 102k
    val (lo, hi) = (100000L, 102000L)
    val plainHit = overlapping(plainRanges, lo, hi)
    val sortedHit = overlapping(sortedRanges, lo, hi)
    info(s"row groups: unclustered ${plainRanges.size} (hit $plainHit), " +
      s"clustered ${sortedRanges.size} (hit $sortedHit)")
    // hash order: every group's [min,max] spans the domain → all hit
    assert(plainHit == plainRanges.size,
      "unclustered control must be unselective (else the comparison proves nothing)")
    // clustered: within each of the 4 write tasks the ids are sorted, so
    // at most ~1 group per task overlaps a 1% range (+1 for boundaries)
    assert(sortedHit <= 8, s"clustered layout must localize the range, hit $sortedHit")
    assert(sortedHit.toDouble / sortedRanges.size <= 0.25,
      "range predicate must overlap a small fraction of clustered row groups")

    // identical data either way — clustering is layout-only
    assert(spark.read.parquet(s"$dir/sorted").count() == n)
    assert(spark.read.parquet(s"$dir/plain").agg(sum("id")).head.getLong(0) ==
      spark.read.parquet(s"$dir/sorted").agg(sum("id")).head.getLong(0))
  }

  test("compaction preserves the dataset's clustering contract") {
    // regression: compact's salted rewrite is hash-ordered — without
    // re-applying the cluster sort, every maintenance sweep would undo
    // the row-group selectivity the writes paid for
    val dir = Files.createTempDirectory("graft_cluster_compact").toString
    val ds = GraftDataset(s"$dir/t").withClusterBy("id")
    val base = spark.range(200000L)
      .select($"id", concat(lit("payload_"), $"id").as("v"))
      .withColumn("h", xxhash64($"id")).repartition(4).sortWithinPartitions("h").drop("h")
    // fragment with several clustered appends
    (0 until 4).foreach { k =>
      DatasetWriter(ds, rowGroupSize = Some(2000L)).write(spark, base.filter($"id" % 4 === k))
    }
    val before = rowGroupRanges(ds)
    val hitBefore = overlapping(before, 100000L, 102000L)
    assert(hitBefore.toDouble / before.size <= 0.5, "clustered appends start selective")

    // keep row groups small through the compaction rewrite too, else
    // the merged file is ONE 128 MiB group and there is nothing to
    // measure (at scale the default block size yields many groups/file)
    val hconf = spark.sparkContext.hadoopConfiguration
    val prevBlock = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 256 * 1024)
    val stats =
      try Repartition.compact(spark, ds, targetFileBytes = 16L * 1024 * 1024)
      finally {
        if (prevBlock == null) hconf.unset("parquet.block.size")
        else hconf.set("parquet.block.size", prevBlock)
      }
    assert(stats.filesAfter < stats.filesBefore, s"compaction must have run: $stats")
    val after = rowGroupRanges(ds)
    val hitAfter = overlapping(after, 100000L, 102000L)
    info(s"row groups before ${before.size} (hit $hitBefore) → after ${after.size} (hit $hitAfter)")
    assert(after.size >= 8, s"post-compaction fixture too small: ${after.size}")
    assert(hitAfter.toDouble / after.size <= 0.3,
      s"compaction destroyed clustering: $hitAfter of ${after.size} row groups hit")
    assert(ds.df(spark).count() == 200000L)
  }

  test("clusterBy composes with hive partitioning (per-partition runs)") {
    val dir = Files.createTempDirectory("graft_cluster_part").toString
    val ds = GraftDataset(s"$dir/t", partitioning = Seq("p"))
    val rows = spark.range(120000L)
      .select($"id", ($"id" % 4).cast("int").as("p"),
        concat(lit("payload_string_for_row_group_volume_"), $"id").as("v"))
      .withColumn("h", xxhash64($"id")).repartition(2).sortWithinPartitions("h").drop("h")
    DatasetWriter(ds, rowGroupSize = Some(500L)).withClusterBy("id").write(spark, rows)
    // hive dirs exist and, within each file, row groups are id-ordered:
    // a range predicate overlaps a small fraction of groups despite
    // every partition's id set interleaving across the whole domain
    val ranges = rowGroupRanges(ds)
    assert(ranges.size >= 16, s"fixture too small: ${ranges.size} row groups")
    val hit = overlapping(ranges, 20000L, 20800L)
    info(s"partitioned row groups ${ranges.size}, hit $hit")
    assert(hit.toDouble / ranges.size <= 0.5, s"hit $hit of ${ranges.size}")
    assert(ds.df(spark).count() == 120000L)
  }
}

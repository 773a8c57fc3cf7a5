package graft.ds

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.execution.{ExplainMode, FormattedMode}
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Plan-locks the MUTATING operators PlanGuardSpec deliberately skips:
  * their interesting plans (delta anti-join, upsert merge + pruned
  * kept-scan, compact's partition-pruned rewrite) only exist while the
  * operator executes, so this spec captures the actually-executed plans
  * through a QueryExecutionListener and asserts the same pathology
  * rules — no CartesianProduct, no BroadcastNestedLoopJoin — plus each
  * operator's load-bearing scale property (anti-join present, partition
  * filters reaching the pruned scans). Without this, a mutating
  * operator could regress to a cartesian/NLJ or a full-dataset scan
  * and every correctness oracle would still pass. */
class WritePlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Run `body`, returning the formatted plans of every query executed
    * inside it. Listener callbacks are async — poll until the capture
    * count is stable. */
  private def capturePlans(body: => Unit): Seq[String] = {
    val captured = new ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        captured.add(qe.explainString(FormattedMode))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      body
      // drain: wait until no new plans arrive for 2 consecutive polls
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 100) {
        Thread.sleep(100)
        val now = captured.size
        if (now == last) stable += 1 else stable = 0
        last = now; waited += 1
      }
    } finally spark.listenerManager.unregister(listener)
    import scala.jdk.CollectionConverters._
    captured.asScala.toSeq
  }

  private def assertNoPathologies(plans: Seq[String], op: String): Unit = {
    assert(plans.nonEmpty, s"$op: listener captured no plans")
    assert(!plans.exists(_.contains("CartesianProduct")),
      s"$op planned a CartesianProduct")
    assert(!plans.exists(_.contains("BroadcastNestedLoopJoin")),
      s"$op planned a BroadcastNestedLoopJoin")
  }

  private val partitionFiltersNonEmpty = raw"PartitionFilters: \[(?!\])".r

  test("delta write executes as an anti-join, never a cartesian") {
    val dir = tmpDir("graft_audit_delta")
    val ds = GraftDataset(s"$dir/t")
    DatasetWriter(ds).write(spark, (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val batch = (400 to 700).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val plans = capturePlans {
      DatasetWriter(ds, WriteMode.Delta).withDeltaSubset("id").write(spark, batch)
    }
    assertNoPathologies(plans, "delta")
    assert(plans.exists(_.contains("LeftAnti")),
      "delta diff must execute as a left-anti join against the existing keys")
  }

  test("partition-scoped upsert prunes the kept-scan and joins with keys") {
    val dir = tmpDir("graft_audit_upsert")
    val ds = GraftDataset(s"$dir/t", partitioning = Seq("p"))
    val seed = (1 to 400).map(i => (i.toLong, s"seed_$i", i % 8)).toDF("id", "v", "p")
    DatasetWriter(ds).write(spark, seed)
    // batch touches partitions 0 and 1 only — the kept-scan must carry
    // partition filters (O(touched partitions), not O(dataset))
    val batch = Seq((8L, "u8", 0), (16L, "u16", 0), (9L, "u9", 1), (500L, "n", 1))
      .toDF("id", "v", "p")
    val plans = capturePlans {
      DatasetWriter(ds, WriteMode.Upsert).withDeltaSubset("id").write(spark, batch)
    }
    assertNoPathologies(plans, "upsert")
    assert(plans.exists(_.contains("LeftAnti")),
      "upsert must drop replaced rows via a left-anti key join")
    assert(plans.exists(p => p.contains("LeftAnti") && partitionFiltersNonEmpty.findFirstIn(p).nonEmpty),
      "the upsert kept-scan must prune to affected partitions (PartitionFilters at the scan)")
    // and it really was partition-scoped: untouched partitions kept their files
    assert(ds.df(spark).count() == 401)
  }

  test("partition-scoped delete prunes the kept-scan to affected partitions") {
    val dir = tmpDir("graft_audit_delete")
    val ds = GraftDataset(s"$dir/t", partitioning = Seq("p"))
    val seed = (1 to 400).map(i => (i.toLong, s"seed_$i", i % 8)).toDF("id", "v", "p")
    DatasetWriter(ds).write(spark, seed)
    // doomed rows live in partitions 0 and 1 only — the staged kept-
    // rewrite must prune to them (O(touched partitions), not O(dataset))
    val plans = capturePlans {
      assert(DatasetDelete.deleteWhere(spark, ds,
        col("p") <= 1 && col("id") <= 100) == 25)
    }
    assertNoPathologies(plans, "delete")
    assert(plans.exists(p => partitionFiltersNonEmpty.findFirstIn(p).nonEmpty),
      "the delete kept-scan must prune to affected partitions (PartitionFilters at the scan)")
    assert(ds.df(spark).count() == 375)

    // keyed purge: the doomed-location scan + anti-join carry keys
    val plans2 = capturePlans {
      assert(DatasetDelete.deleteByKeys(spark, ds,
        Seq(200L, 300L).toDF("id"), Seq("id")) == 2)
    }
    assertNoPathologies(plans2, "deleteByKeys")
    assert(plans2.exists(_.contains("LeftAnti")),
      "keyed delete must keep surviving rows via a left-anti key join")
    assert(ds.df(spark).count() == 373)
  }

  test("bloom-probed no-overlap purge reads zero data files") {
    val dir = tmpDir("graft_audit_bloomdel")
    val ds = GraftDataset(s"$dir/t")
    DatasetWriter(ds).withDeltaSubset("id").withBloomIndex
      .write(spark, (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val fs = ds.fs(spark)
    val before = ds.dataFiles(spark)
      .map(f => f -> fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getModificationTime)
      .toMap
    // a GDPR-shaped sweep whose ids are all absent: the doomed keys die
    // at the bloom probe, so the delete must plan ZERO queries against
    // the dataset — only the LIMIT-1 emptiness check over the key list
    val plans = capturePlans {
      assert(DatasetDelete.deleteByKeys(spark, ds,
        (100001L to 101000L).toDF("id"), Seq("id")) == 0)
    }
    assert(plans.nonEmpty, "the emptiness gate itself must execute")
    assert(!plans.exists(_.contains(dir)),
      s"no executed plan may scan the dataset:\n${plans.filter(_.contains(dir)).mkString("\n")}")
    val after = ds.dataFiles(spark)
      .map(f => f -> fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getModificationTime)
      .toMap
    assert(after == before, "no data file may be rewritten by a no-overlap purge")
    // overlap still resolves exactly through the same probe path (false
    // positives and true hits fall through to the semi/anti joins)
    assert(DatasetDelete.deleteByKeys(spark, ds,
      Seq(42L, 999999L).toDF("id"), Seq("id")) == 1)
    assert(ds.df(spark).count() == 499)
  }

  test("compact's rewrite scan prunes to fragmented partitions only") {
    val dir = tmpDir("graft_audit_compact")
    val ds = GraftDataset(s"$dir/t", partitioning = Seq("p"))
    val rows = (1 to 300).map(i => (i.toLong, s"v$i", i % 3)).toDF("id", "v", "p")
    // fragment partitions p=0,1 with many small appends; p=2 written once
    (0 until 6).foreach { k =>
      DatasetWriter(ds).write(spark,
        rows.filter(col("p") < 2 && col("id") % 6 === k).repartition(3))
    }
    DatasetWriter(ds).write(spark, rows.filter(col("p") === 2).coalesce(1))
    val plans = capturePlans {
      val stats = Repartition.compact(spark, ds)
      assert(stats.partitionsCompacted == 2, s"expected p=0,p=1 compacted: $stats")
    }
    assertNoPathologies(plans, "compact")
    assert(plans.exists(p => partitionFiltersNonEmpty.findFirstIn(p).nonEmpty),
      "compact's single rewrite job must scan ONLY qualifying partitions " +
        "(PartitionFilters at the scan) — a full-dataset scan is the 100 TB regression")
    assert(ds.df(spark).count() == 300)
  }

  test("in-place repartition and unify rewrite stay pathology-free") {
    val dir = tmpDir("graft_audit_rewrite")
    val ds = GraftDataset(s"$dir/t")
    DatasetWriter(ds, batchRows = Some(50L))
      .write(spark, (1 to 300).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val plans = capturePlans {
      Repartition.run(spark, ds, ds.copy(sortBy = SortSpec.asc("id")))
      DatasetWriter.unifySchemaRewrite(spark, ds)
    }
    assertNoPathologies(plans, "repartition/unify")
    assert(ds.df(spark).count() == 300)
  }
}

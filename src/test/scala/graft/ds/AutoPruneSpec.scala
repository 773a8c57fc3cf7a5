package graft.ds

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Automatic stats-index file skipping on PLAIN reads: the optimizer
  * rule wraps sidecar-bearing relations, the wrapped FileIndex prunes
  * from the pushed data filters, SQL passthrough gets the skip with
  * zero graft API calls — and answers never change (superset safety
  * through the engine seam, not just the graft call site). */
class AutoPruneSpec extends AnyFunSuite {
  // a CHILD session: ExperimentalMethods are per-session state, so the
  // rule installed here never leaks into the other suites' plans
  lazy val spark: SparkSession = {
    val s = SparkTestSession.spark.newSession()
    AutoPrune.enable(s)
    s
  }
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/ds"

  /** 8 contiguous id-range files + a built sidecar on (id, score). */
  private def indexedDataset(): GraftDataset = {
    val ds = GraftDataset(tmpDir("graft_autoprune"))
    val df = (0 until 800).map(i => (i.toLong, i.toDouble / 10, s"v$i"))
      .toDF("id", "score", "v")
    DatasetWriter(ds, WriteMode.Overwrite)
      .write(spark, df.repartitionByRange(8, col("id")))
    StatsIndex.build(spark, ds, Seq("id", "score"))
    ds
  }

  /** Files the executed scan actually read (AQE-unwrapped). */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // metrics are filled by execution
    def scan(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
        // AQE query stages are LEAVES wrapping their materialized plan
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => scan(s.plan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(scan)
      }
    scan(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  test("plain spark.read scan prunes files from pushed filters, same answer") {
    val ds = indexedDataset()
    val plain = spark.read.parquet(ds.path)
    val q = plain.filter(col("id") >= 100L && col("id") < 300L)
    val n = scannedFiles(q)
    assert(n > 0 && n < 8, s"expected a pruned file count, scanned $n of 8")
    // identical answer to an unpruned session's scan
    val bare = SparkTestSession.spark.read.parquet(ds.path)
      .filter(col("id") >= 100L && col("id") < 300L)
    assert(q.agg(sum("id")).head.getLong(0) == bare.agg(sum("id")).head.getLong(0))
    assert(q.count() == bare.count())
  }

  test("SQL passthrough over a registered view prunes too") {
    val ds = indexedDataset()
    spark.read.parquet(ds.path).createOrReplaceTempView("autoprune_t")
    val q = spark.sql(
      "SELECT SUM(id) AS s, COUNT(*) AS n FROM autoprune_t WHERE id < 10 OR id > 790")
    assert(scannedFiles(q) == 2, "disjunctive predicate must keep only the two edge files")
    val row = q.head
    val bare = SparkTestSession.spark.read.parquet(ds.path)
      .filter(col("id") < 10L || col("id") > 790L)
    assert(row.getLong(0) == bare.agg(sum("id")).head.getLong(0))
    assert(row.getLong(1) == bare.count())
  }

  test("no sidecar -> relation untouched; filter on unindexed column -> no pruning") {
    // dataset WITHOUT an index: rule must leave the relation alone
    val bare = GraftDataset(tmpDir("graft_autoprune_bare"))
    DatasetWriter(bare, WriteMode.Overwrite)
      .write(spark, (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .repartitionByRange(4, col("id")))
    val q0 = spark.read.parquet(bare.path).filter(col("id") < 10L)
    val loc0 = q0.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation].location
    }
    assert(loc0.forall(!_.isInstanceOf[StatsPrunedFileIndex]),
      "sidecar-less relation must not be wrapped")
    assert(scannedFiles(q0) == 4, "no sidecar -> all files scanned")

    // indexed dataset, but the predicate names an unindexed column:
    // wrapped, yet zero pruning — and the answer is full-scan exact
    val ds = indexedDataset()
    val q1 = spark.read.parquet(ds.path).filter(col("v") === "v5")
    assert(scannedFiles(q1) == 8, "unindexed-column filter must scan everything")
    assert(q1.count() == 1)
  }

  test("files the index has never seen are never pruned") {
    val ds = indexedDataset()
    // land an extra file OUTSIDE the maintained writer (a graft write
    // would refresh the sidecar) — plain Spark append, no index entry
    Seq((150L, 1.5, "late")).toDF("id", "score", "v")
      .write.mode("append").parquet(ds.path)
    val q = spark.read.parquet(ds.path)
      .filter(col("id") >= 100L && col("id") < 300L)
    assert(q.count() == 201, "unindexed appended file must survive pruning")
  }

  test("partition pruning and stats pruning compose on a hive layout") {
    // 4 hive partitions x 4 range files each; the index covers the DATA
    // column — a query constraining both must scan only the files that
    // survive BOTH prunes (underlying listFiles applies the partition
    // filter first, the wrapper prunes on id after)
    val root = tmpDir("graft_autoprune_hive")
    (0 until 800).map(i => (i.toLong, i % 4, s"v$i")).toDF("id", "part", "v")
      .repartitionByRange(4, col("id"))
      .sortWithinPartitions("id")
      .write.partitionBy("part").parquet(root)
    val ds = GraftDataset(root)
    StatsIndex.build(spark, ds, Seq("id"))
    val total = ds.dataFiles(spark).size
    assert(total >= 8, s"fixture too small: $total files")
    val q = spark.read.parquet(root)
      .filter(col("part") === 1 && col("id") < 200L)
    val n = scannedFiles(q)
    // partition filter alone keeps total/4; the id range then keeps a
    // strict subset of those
    assert(n > 0 && n < total / 4,
      s"expected both prunes to apply, scanned $n of $total (partition share ${total / 4})")
    val bare = SparkTestSession.spark.read.parquet(root)
      .filter(col("part") === 1 && col("id") < 200L)
    assert(q.count() == bare.count())
  }

  test("unified multi-root reads prune too: schema-group unions through spark.sql") {
    // two schema VINTAGES in one dataset dir — the dfUnified retry
    // shape: group A (id, v), group B adds a column. Each file holds a
    // narrow contiguous id range so the sidecar can discriminate.
    val ds = GraftDataset(tmpDir("graft_autoprune_uni"))
    (0 until 400).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartitionByRange(4, col("id"))
      .write.parquet(ds.path)
    (400 until 800).map(i => (i.toLong, s"v$i", i * 2.0)).toDF("id", "v", "extra")
      .repartitionByRange(4, col("id"))
      .write.mode("append").parquet(ds.path)
    StatsIndex.build(spark, ds, Seq("id"))
    assert(ds.dataFiles(spark).size == 8)

    // unified read = one multi-root relation per schema group; register
    // and query through plain SQL so the rule (not the graft call site)
    // must do the pruning
    ds.dfUnified(spark).createOrReplaceTempView("autoprune_uni")
    val q = spark.sql("SELECT SUM(id) AS s, COUNT(*) AS n FROM autoprune_uni WHERE id < 100")
    val n = scannedFiles(q)
    assert(n < 8, s"unified read must prune schema-group file lists, scanned $n of 8")
    val row = q.head
    assert(row.getLong(0) == (0 until 100).map(_.toLong).sum && row.getLong(1) == 100)

    // and a predicate straddling both groups still answers exactly
    val q2 = spark.sql("SELECT COUNT(*) AS n FROM autoprune_uni WHERE id >= 350 AND id < 450")
    assert(q2.head.getLong(0) == 100)
  }

  test("a single-FILE root resolves to its parent dataset dir and prunes") {
    // a one-file schema group from dfUnified (or a direct
    // spark.read.parquet(file)) has rootPaths = [that file]; the
    // dataset dir carrying the sidecar is the PARENT — without the
    // file-root fallback this shape silently scans unpruned while its
    // multi-file siblings prune
    val ds = indexedDataset()
    val fs = ds.fs(spark)
    val one = fs.listStatus(new org.apache.hadoop.fs.Path(ds.path))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted.head
    val q = spark.read.parquet(one).filter(col("id") >= 700L)
    q.collect() // execute; answer correctness is covered by superset safety
    val wrapped = q.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.isInstanceOf[StatsPrunedFileIndex]
    }
    assert(wrapped.nonEmpty && wrapped.forall(identity),
      "single-file root was not wrapped with the pruning index")
  }

  test("wrapped relations keep cache identity: second read hits df.cache()") {
    val ds = indexedDataset()
    val hconf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(ds.path)

    // unit level: wrappers over path-equal underlying indexes are equal
    def inMem() = new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
      spark, Seq(root), Map.empty, None)
    val a = new StatsPrunedFileIndex(inMem(), root, hconf)
    val b = new StatsPrunedFileIndex(inMem(), root, hconf)
    assert(a == b && a.hashCode == b.hashCode,
      "wrapper equality must delegate to the underlying index")

    // end-to-end through the analyzer-injection path (the cluster
    // deploy shape): with GraftExtensions the ANALYZED plan carries the
    // wrapper, so cache lookup equality runs through it
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s2 = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions().apply(_)).getOrCreate()
    val df1 = s2.read.parquet(ds.path)
    try {
      val wrapped = df1.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
            if l.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
              .location.isInstanceOf[StatsPrunedFileIndex] => l
      }
      assert(wrapped.nonEmpty, "extensions session must wrap the analyzed relation")
      df1.persist()
      df1.count()
      val df2 = s2.read.parquet(ds.path).filter(col("id") < 100L)
      val hit = df2.queryExecution.withCachedData.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }
      assert(hit.nonEmpty, "second read of the cached path must hit the cache")
      assert(df2.count() == 100)
    } finally {
      df1.unpersist()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }

  test("enable is idempotent; extensions class wires without error") {
    AutoPrune.enable(spark); AutoPrune.enable(spark)
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[StatsPruneRule]) == 1)
    new graft.plans.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}

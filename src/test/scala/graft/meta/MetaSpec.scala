package graft.meta

import java.nio.file.Files
import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ds.{DatasetWriter, GraftDataset, WriteMode}

class TimeFlySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_meta_").toString

  test("init creates layout + adopts stray files (timefly.py:130-174)") {
    val root = tmp() + "/ds"
    // stray data file in the root
    val pre = GraftDataset(root)
    DatasetWriter(pre, WriteMode.Overwrite).write(spark, Seq(1, 2).toDF("k"))
    val tf = new TimeFly(spark, root)
    tf.init("mydata", "a test dataset")
    val f = pre.fs(spark)
    assert(f.exists(tf.currentPath))
    assert(f.exists(tf.configPath))
    assert(tf.currentDataset().df(spark).count() == 2) // adopted
  }

  test("snapshot add / resolve / load / delete (timefly.py:245-387)") {
    val root = tmp() + "/snap"
    val tf = new TimeFly(spark, root)
    tf.init("snapped")
    val cur = tf.currentDataset()
    DatasetWriter(cur, WriteMode.Overwrite).write(spark, Seq(1, 2).toDF("k"))
    val id1 = tf.addSnapshot(Instant.parse("2024-01-01T00:00:00Z"))
    DatasetWriter(cur, WriteMode.Append).write(spark, Seq(3).toDF("k"))
    val id2 = tf.addSnapshot(Instant.parse("2024-06-01T00:00:00Z"))
    assert(tf.availableSnapshots() == Seq(id1, id2))

    // probe before id1 resolves to id1 (2 rows); after id2 → current (3 rows)
    assert(tf.read(Some(Instant.parse("2023-12-01T00:00:00Z"))).df(spark).count() == 2)
    assert(tf.read(Some(Instant.parse("2024-03-01T00:00:00Z"))).df(spark).count() == 3)
    assert(tf.read(Some(Instant.parse("2025-01-01T00:00:00Z"))).df(spark).count() == 3)
    assert(tf.read(None).df(spark).count() == 3)

    // restore id1 over current
    tf.loadSnapshot(id1)
    assert(tf.read(None).df(spark).count() == 2)

    tf.deleteSnapshot(id1)
    assert(tf.availableSnapshots() == Seq(id2))
    val cfg = tf.readConfig()
    assert(graft.core.Toml.getArr(graft.core.Toml.getTbl(cfg, "snapshot").get, "deleted") == Seq(id1))
  }

  test("stats-index sidecar travels with snapshots: time-travel reads and restores prune") {
    import org.apache.spark.sql.functions.col
    import graft.ds.StatsIndex
    val root = tmp() + "/statsnap"
    val tf = new TimeFly(spark, root)
    tf.init("indexed")
    val cur = tf.currentDataset()
    val df = (0 until 800).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    DatasetWriter(cur, WriteMode.Overwrite)
      .write(spark, df.repartitionByRange(8, col("id")))
    StatsIndex.build(spark, cur, Seq("id"))
    val pred = col("id") < 100L
    val prunedBefore = cur.pruned(spark, pred).files.size
    assert(prunedBefore > 0 && prunedBefore < cur.dataFiles(spark).size,
      "fixture must prune before any snapshot exists")

    val id = tf.addSnapshot(Instant.parse("2024-01-01T00:00:00Z")) // copy incl. sidecar

    // current marches on — the maintained sidecar learns the new file
    DatasetWriter(cur, WriteMode.Append).write(spark,
      (10000 until 10100).map(i => (i.toLong, "x")).toDF("id", "v"))
    val filesAfterAppend = cur.dataFiles(spark).size

    // time-travel read AT the snapshot: the copied sidecar prunes that
    // point-in-time view (rel paths survive the copy unchanged)
    val snapDs = tf.read(Some(Instant.parse("2023-12-01T00:00:00Z")))
    val snapPruned = snapDs.pruned(spark, pred)
    assert(snapPruned.files.nonEmpty &&
      snapPruned.files.size < snapDs.dataFiles(spark).size,
      "snapshot read must prune via the snapshot's own sidecar")
    assert(snapPruned.df(spark).filter(pred).count() == 100)

    // restore: current/ gets the snapshot-era files AND sidecar back —
    // the pruned file count must match the pre-snapshot layout exactly
    tf.loadSnapshot(id)
    val restored = tf.currentDataset()
    assert(restored.dataFiles(spark).size < filesAfterAppend,
      "restore must drop the post-snapshot append")
    val rp = restored.pruned(spark, pred)
    assert(rp.files.size == prunedBefore,
      s"restored sidecar must prune to the snapshot-era count ($prunedBefore), got ${rp.files.size}")
    assert(rp.df(spark).filter(pred).count() == 100)
  }

  test("manifest snapshot: O(metadata) create, time-travel read, restore") {
    val root = tmp() + "/manifest"
    val tf = new TimeFly(spark, root)
    tf.init("manifested")
    val cur = tf.currentDataset()
    DatasetWriter(cur, WriteMode.Overwrite).write(spark, Seq(1, 2).toDF("k"))
    val id1 = tf.addSnapshot(Instant.parse("2024-01-01T00:00:00Z"), manifest = true)

    // no bytes copied: the snapshot dir holds ONLY the manifest
    val f = cur.fs(spark)
    val snapDir = new org.apache.hadoop.fs.Path(tf.snapshotRoot, id1)
    val contents = f.listStatus(snapDir).map(_.getPath.getName).toSeq
    assert(contents == Seq("_manifest.txt"), contents)
    assert(tf.manifestFiles(id1).get.size == cur.dataFiles(spark).size)

    // append after the snapshot: probe before id1 sees the 2-row state,
    // current sees 3 — same semantics as a copy snapshot
    DatasetWriter(cur, WriteMode.Append).write(spark, Seq(3).toDF("k"))
    assert(tf.read(Some(Instant.parse("2023-12-01T00:00:00Z"))).df(spark).count() == 2)
    assert(tf.read(None).df(spark).count() == 3)

    // restore re-materializes the manifest's file set over current/
    tf.loadSnapshot(id1)
    assert(tf.read(None).df(spark).count() == 2)
    assert(tf.read(None).df(spark).as[Int].collect().toSet == Set(1, 2))
  }

  test("manifest snapshot round-trips a hive-partitioned dataset") {
    val root = tmp() + "/manpart"
    val tf = new TimeFly(spark, root)
    tf.init("partitioned")
    val cur = GraftDataset(tf.currentPath.toString, partitioning = Seq("p"))
    DatasetWriter(cur, WriteMode.Overwrite)
      .write(spark, Seq((1, "a"), (2, "b"), (3, "a")).toDF("k", "p"))
    val id = tf.addSnapshot(Instant.parse("2024-01-01T00:00:00Z"), manifest = true)

    // time-travel read keeps the partition column (basePath discovery)
    val back = tf.read(Some(Instant.parse("2023-12-01T00:00:00Z"))).df(spark)
    assert(back.columns.toSet == Set("k", "p"), back.columns.toSeq)
    assert(back.select("k", "p").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b"), (3, "a")))

    // restore preserves the partition DIRECTORIES, not flattened files
    DatasetWriter(cur, WriteMode.Append).write(spark, Seq((4, "c")).toDF("k", "p"))
    tf.loadSnapshot(id)
    val f = cur.fs(spark)
    assert(f.exists(new org.apache.hadoop.fs.Path(tf.currentPath, "p=a")))
    assert(f.exists(new org.apache.hadoop.fs.Path(tf.currentPath, "p=b")))
    val restored = spark.read.parquet(tf.currentPath.toString)
    assert(restored.columns.toSet == Set("k", "p"))
    assert(restored.select("k", "p").as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b"), (3, "a")))
  }

  test("manifest read keeps the partition column when one partition value exists") {
    // regression: the deepest-common-dir basePath fallback would sit
    // INSIDE p=only, silently dropping the partition column
    val root = tmp() + "/manone"
    val tf = new TimeFly(spark, root)
    tf.init("onepart")
    val cur = GraftDataset(tf.currentPath.toString, partitioning = Seq("p"))
    DatasetWriter(cur, WriteMode.Overwrite)
      .write(spark, Seq((1, "only"), (2, "only")).toDF("k", "p"))
    tf.addSnapshot(Instant.parse("2024-01-01T00:00:00Z"), manifest = true)
    val back = tf.read(Some(Instant.parse("2023-12-01T00:00:00Z"))).df(spark)
    assert(back.columns.toSet == Set("k", "p"), back.columns.toSeq)
    assert(back.select("p").distinct().as[String].collect().toSeq == Seq("only"))
  }

  test("manifest restore moves zero data bytes: kept files keep identity and mtime") {
    val root = tmp() + "/manzero"
    val tf = new TimeFly(spark, root)
    tf.init("zerocopy")
    val cur = tf.currentDataset()
    DatasetWriter(cur, WriteMode.Overwrite, batchRows = Some(2L))
      .write(spark, (1 to 10).map(i => (i, s"v$i")).toDF("k", "v"))
    val id = tf.addSnapshot(Instant.parse("2024-01-01T00:00:00Z"), manifest = true)

    val f = cur.fs(spark)
    def stamps(): Map[String, Long] = cur.dataFileStatuses(spark).map { case (p, _) =>
      p -> f.getFileStatus(new org.apache.hadoop.fs.Path(p)).getModificationTime
    }.toMap
    val snapshotStamps = stamps()

    // appends after the snapshot are the only thing restore may touch
    DatasetWriter(cur, WriteMode.Append).write(spark, Seq((11, "x"), (12, "y")).toDF("k", "v"))
    tf.loadSnapshot(id)
    assert(stamps() == snapshotStamps,
      "restore must delete only post-snapshot files; kept files keep path AND mtime (zero bytes copied)")
    assert(tf.read(None).df(spark).count() == 10)

    // restoring an UNCHANGED dataset is a pure metadata no-op
    tf.loadSnapshot(id)
    assert(stamps() == snapshotStamps)
    assert(tf.read(None).df(spark).count() == 10)
  }

  test("manifest restore refuses when a referenced file was rewritten in place") {
    val root = tmp() + "/manreject"
    val tf = new TimeFly(spark, root)
    tf.init("reject")
    val cur = tf.currentDataset()
    DatasetWriter(cur, WriteMode.Overwrite).write(spark, Seq(1, 2).toDF("k"))
    val id = tf.addSnapshot(Instant.parse("2024-01-01T00:00:00Z"), manifest = true)
    // corrupt a referenced file's size — the manifest contract is broken
    val victim = new java.io.File(new java.net.URI(
      cur.dataFiles(spark).head.replaceFirst("^file:/+", "file:///")))
    val out = new java.io.FileOutputStream(victim, true)
    out.write(Array.fill[Byte](16)(0)); out.close()
    val e = intercept[IllegalArgumentException] { tf.loadSnapshot(id) }
    assert(e.getMessage.contains("changed size"), e.getMessage)
  }

  test("manifest and copy snapshots coexist in the resolution order") {
    val root = tmp() + "/mixed"
    val tf = new TimeFly(spark, root)
    tf.init("mixed")
    val cur = tf.currentDataset()
    DatasetWriter(cur, WriteMode.Overwrite).write(spark, Seq(1).toDF("k"))
    val idCopy = tf.addSnapshot(Instant.parse("2024-01-01T00:00:00Z"))
    DatasetWriter(cur, WriteMode.Append).write(spark, Seq(2).toDF("k"))
    val idMan = tf.addSnapshot(Instant.parse("2024-06-01T00:00:00Z"), manifest = true)
    DatasetWriter(cur, WriteMode.Append).write(spark, Seq(3).toDF("k"))
    assert(tf.availableSnapshots() == Seq(idCopy, idMan))
    assert(tf.read(Some(Instant.parse("2023-01-01T00:00:00Z"))).df(spark).count() == 1)
    assert(tf.read(Some(Instant.parse("2024-03-01T00:00:00Z"))).df(spark).count() == 2)
    assert(tf.read(Some(Instant.parse("2025-01-01T00:00:00Z"))).df(spark).count() == 3)
  }
}

class ManagerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("catalog add/remove/discover/query (manager.py:16-209)") {
    val lake = Files.createTempDirectory("graft_lake_").toString
    val m = new Manager(spark, lake)
    m.init("testlake")

    // one TimeFly-managed dataset + one plain directory dataset
    val tf = new TimeFly(spark, lake + "/sales")
    tf.init("sales")
    DatasetWriter(tf.currentDataset(), WriteMode.Overwrite)
      .write(spark, Seq((1, 10.0), (2, 20.0)).toDF("id", "amt"))
    DatasetWriter(GraftDataset(lake + "/plain"), WriteMode.Overwrite)
      .write(spark, Seq(1, 2, 3).toDF("x"))

    val discovered = m.discover()
    assert(discovered.contains("sales"))
    m.addDataset("plain", lake + "/plain")
    assert(m.datasets().keySet == Set("sales", "plain"))

    val views = m.registerAll()
    assert(views == Seq("plain", "sales"))
    assert(spark.sql("SELECT SUM(amt) FROM sales").collect()(0).getDouble(0) == 30.0)
    assert(spark.sql("SELECT COUNT(*) FROM plain").collect()(0).getLong(0) == 3)

    m.removeDataset("plain")
    assert(m.datasets().keySet == Set("sales"))
  }

  test("same-second snapshots get distinct ids; discover never wipes registered metadata") {
    val lake = Files.createTempDirectory("graft_lake2_").toString
    val tf = new TimeFly(spark, lake + "/ds")
    tf.init("ds")
    DatasetWriter(tf.currentDataset(), WriteMode.Overwrite)
      .write(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    // two snapshots at the SAME instant: FileUtil.copy into an existing
    // dir would nest the second under <id>/current and double the rows
    val now = java.time.Instant.parse("2025-03-01T10:00:00Z")
    val id1 = tf.addSnapshot(now)
    val id2 = tf.addSnapshot(now)
    assert(id1 != id2, "second-resolution ids must not collide")
    Seq(id1, id2).foreach { id =>
      val read = tf.read(Some(graft.core.Naming.parseSnapshotId(id).minusSeconds(1)))
      assert(read.df(spark).count() == 2, s"snapshot $id must read exactly the original rows")
    }

    val m = new Manager(spark, lake)
    m.init("lake2")
    m.addDataset("ds", lake + "/ds", clusterBy = Seq("id"))
    m.discover()
    assert(m.datasetClusterBy("ds") == Seq("id"),
      "discover must keep the registered clustering contract")
  }

  test("compactAll sweeps the catalog: fragmented datasets shrink, layouts inferred") {
    val lake = Files.createTempDirectory("graft_lake2_").toString
    val m = new Manager(spark, lake)
    m.init("sweeplake")
    // plain fragmented dataset
    DatasetWriter(GraftDataset(lake + "/flat"), WriteMode.Overwrite, batchRows = Some(3L))
      .write(spark, (1 to 30).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    // hive-partitioned fragmented dataset — compactAll must infer the
    // partition column from the dir layout, not be told
    DatasetWriter(GraftDataset(lake + "/parts", partitioning = Seq("p")),
        WriteMode.Overwrite, batchRows = Some(2L))
      .write(spark, (1 to 20).map(i => (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("id", "p"))
    m.addDataset("flat", lake + "/flat")
    m.addDataset("parts", lake + "/parts")

    def files(d: String): Int = {
      val dir = new java.io.File(d)
      Option(dir.listFiles()).getOrElse(Array.empty)
        .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    }
    assert(files(lake + "/flat") >= 5 && files(lake + "/parts/p=a") >= 3)

    val stats = m.compactAll().toMap
    assert(stats.keySet == Set("flat", "parts"))
    assert(stats("flat").filesAfter < stats("flat").filesBefore)
    assert(stats("parts").partitionsCompacted == 2)
    assert(files(lake + "/flat") == 1)
    assert(files(lake + "/parts/p=a") == 1 && files(lake + "/parts/p=b") == 1)
    assert(spark.read.parquet(lake + "/flat").count() == 30)
    assert(spark.read.parquet(lake + "/parts").count() == 20)

    // sweep stats persist into [maintenance] and round-trip through the
    // on-disk toml (fresh Manager → fresh parse); per-dataset stats sit
    // under the `dataset` sub-table so names can't collide with summary
    // keys like last_sweep
    val maint = new Manager(spark, lake).maintenanceInfo()
    assert(graft.core.Toml.getStr(maint, "last_sweep").nonEmpty)
    val maintDs = graft.core.Toml.getTbl(maint, "dataset").get
    val flat = graft.core.Toml.getTbl(maintDs, "flat").get
    assert(flat.v("files_before") == graft.core.Toml.Int64(stats("flat").filesBefore))
    assert(flat.v("files_after") == graft.core.Toml.Int64(stats("flat").filesAfter))
    val parts = graft.core.Toml.getTbl(maintDs, "parts").get
    assert(parts.v("partitions_compacted") == graft.core.Toml.Int64(2L))
    assert(graft.core.Toml.getStr(flat, "swept_at") ==
      graft.core.Toml.getStr(maint, "last_sweep"))

    // lock-pressure counters persist: the sweep itself held each
    // dataset's lock, so acquires >= 1; a no-contention lake shows
    // zero steals/timeouts. Counters round-trip the on-disk toml and
    // match the in-JVM registry they were sampled from.
    val lkFlat = graft.ds.DatasetLock.statsFor(
      new org.apache.hadoop.fs.Path(m.load("flat").path))
    assert(lkFlat.acquires >= 1, "compact must have taken the lock")
    assert(flat.v("lock_acquires").asInstanceOf[graft.core.Toml.Int64].v >= 1L)
    assert(flat.v("lock_steals") == graft.core.Toml.Int64(lkFlat.steals))
    assert(flat.v("lock_timeouts") == graft.core.Toml.Int64(0L))
    assert(flat.v("lock_waited_ms").isInstanceOf[graft.core.Toml.Int64])

    // a second sweep finds healthy datasets: zero work, stats overwrite
    val stats2 = m.compactAll().toMap
    assert(stats2.values.forall(_.partitionsCompacted == 0))
    val maint2 = new Manager(spark, lake).maintenanceInfo()
    val flat2 = graft.core.Toml.getTbl(graft.core.Toml.getTbl(maint2, "dataset").get, "flat").get
    assert(flat2.v("partitions_compacted") == graft.core.Toml.Int64(0L))
    // counters are cumulative: the second sweep's acquire count grows
    assert(flat2.v("lock_acquires").asInstanceOf[graft.core.Toml.Int64].v >=
      flat.v("lock_acquires").asInstanceOf[graft.core.Toml.Int64].v)
  }
}

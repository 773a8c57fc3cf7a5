package graft.ds

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[GraftTestFs]] variant whose setTimes is a silent no-op — the shape
  * of several object-store connectors; exercises the lock heartbeat's
  * content-rewrite fallback. */
class GraftNoTouchFs extends GraftTestFs {
  override def getScheme: String = "graftnt"
  override def getUri: java.net.URI = java.net.URI.create("graftnt:///")
  override def setTimes(p: org.apache.hadoop.fs.Path, mtime: Long, atime: Long): Unit = ()
}

/** Two concurrent writers on ONE dataset must serialize through
  * [[DatasetLock]] with zero lost rows — the 100 TB lake failure mode
  * this guards is a `Manager.compactAll` maintenance sweep running
  * beside live ingest: without the lock, interleaved staged renames
  * silently drop one writer's output. */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Run both thunks at the same time (latch-released), propagate the
    * first failure. */
  private def inParallel(a: => Unit, b: => Unit): Unit = {
    val pool = Executors.newFixedThreadPool(2)
    val go = new CountDownLatch(1)
    try {
      val fa = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = { go.await(); a } })
      val fb = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = { go.await(); b } })
      go.countDown()
      fa.get(300, TimeUnit.SECONDS)
      fb.get(300, TimeUnit.SECONDS)
    } finally pool.shutdownNow()
  }

  test("upsert vs upsert: both batches land, zero lost rows") {
    val dir = tmpDir("graft_lock_uu")
    val ds = GraftDataset(s"$dir/t", partitioning = Seq("p"))
    val seed = (1 to 200).map(i => (i.toLong, s"seed_$i", i % 4)).toDF("id", "v", "p")
    DatasetWriter(ds).write(spark, seed)

    // disjoint key ranges: batch A updates 1..50 + inserts 201..250,
    // batch B updates 51..100 + inserts 251..300 — every row of both
    // must survive if and only if the upserts serialized
    val batchA = ((1 to 50) ++ (201 to 250)).map(i => (i.toLong, s"A_$i", i % 4)).toDF("id", "v", "p")
    val batchB = ((51 to 100) ++ (251 to 300)).map(i => (i.toLong, s"B_$i", i % 4)).toDF("id", "v", "p")
    val wA = DatasetWriter(ds, WriteMode.Upsert).withDeltaSubset("id")
    val wB = DatasetWriter(ds, WriteMode.Upsert).withDeltaSubset("id")
    inParallel(wA.write(spark, batchA), wB.write(spark, batchB))

    val out = ds.df(spark).select("id", "v").as[(Long, String)].collect().toMap
    assert(out.size == 300, s"expected 300 distinct ids, got ${out.size} — rows lost")
    (1 to 50).foreach(i => assert(out(i.toLong) == s"A_$i"))
    (51 to 100).foreach(i => assert(out(i.toLong) == s"B_$i"))
    (101 to 200).foreach(i => assert(out(i.toLong) == s"seed_$i"))
    (201 to 250).foreach(i => assert(out(i.toLong) == s"A_$i"))
    (251 to 300).foreach(i => assert(out(i.toLong) == s"B_$i"))
  }

  test("upsert vs compact: the sweep-beside-ingest race keeps every row") {
    val dir = tmpDir("graft_lock_uc")
    val ds = GraftDataset(s"$dir/t", partitioning = Seq("p"))
    // fragment the dataset so compact has real work in every partition
    val seed = (1 to 400).map(i => (i.toLong, s"seed_$i", i % 4)).toDF("id", "v", "p")
    (0 until 8).foreach { k =>
      DatasetWriter(ds).write(spark, seed.filter(col("id") % 8 === k).repartition(4))
    }
    assert(ds.dataFiles(spark).size > 20, "fixture must start fragmented")

    val batch = ((1 to 100) ++ (401 to 450)).map(i => (i.toLong, s"U_$i", i % 4)).toDF("id", "v", "p")
    val w = DatasetWriter(ds, WriteMode.Upsert).withDeltaSubset("id")
    inParallel(
      w.write(spark, batch),
      { Repartition.compact(spark, ds); () })

    val out = ds.df(spark).select("id", "v").as[(Long, String)].collect().toMap
    assert(out.size == 450, s"expected 450 distinct ids, got ${out.size} — rows lost")
    (1 to 100).foreach(i => assert(out(i.toLong) == s"U_$i"))
    (101 to 400).foreach(i => assert(out(i.toLong) == s"seed_$i"))
    (401 to 450).foreach(i => assert(out(i.toLong) == s"U_$i"))
    // and compacting again afterwards still converges with no loss
    Repartition.compact(spark, ds)
    assert(ds.df(spark).count() == 450)
  }

  test("delete vs upsert: purge-beside-ingest serializes, zero lost or resurrected rows") {
    val dir = tmpDir("graft_lock_du")
    val ds = GraftDataset(s"$dir/t", partitioning = Seq("p"))
    val seed = (1 to 200).map(i => (i.toLong, s"seed_$i", i % 4)).toDF("id", "v", "p")
    DatasetWriter(ds).write(spark, seed)

    // disjoint scopes make the outcome order-independent IFF the two
    // mutations serialize: the delete purges 1..50, the upsert updates
    // 101..150 and inserts 201..250. An interleaved pair of staged
    // partition swaps would lose one side's rewrite.
    val batch = ((101 to 150) ++ (201 to 250)).map(i => (i.toLong, s"U_$i", i % 4)).toDF("id", "v", "p")
    val w = DatasetWriter(ds, WriteMode.Upsert).withDeltaSubset("id")
    var deleted = -1L
    inParallel(
      { deleted = DatasetDelete.deleteWhere(spark, ds, col("id") <= 50) },
      w.write(spark, batch))

    assert(deleted == 50, s"delete reported $deleted of 50")
    val out = ds.df(spark).select("id", "v").as[(Long, String)].collect().toMap
    assert(out.size == 200, s"expected 200 distinct ids, got ${out.size}")
    assert(!out.contains(1L) && !out.contains(50L), "purged ids must stay gone")
    (51 to 100).foreach(i => assert(out(i.toLong) == s"seed_$i"))
    (101 to 150).foreach(i => assert(out(i.toLong) == s"U_$i"))
    (201 to 250).foreach(i => assert(out(i.toLong) == s"U_$i"))
  }

  test("lock: second acquirer times out while held, then proceeds on release") {
    val dir = tmpDir("graft_lock_to")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataset = new Path(dir, "t")
    val held = new CountDownLatch(1)
    val releaseIt = new CountDownLatch(1)
    val holder = new Thread(() => DatasetLock.withLock(fs, dataset) {
      held.countDown(); releaseIt.await()
    })
    holder.start()
    assert(held.await(10, TimeUnit.SECONDS))
    val e = intercept[IllegalStateException] {
      DatasetLock.withLock(fs, dataset, acquireTimeoutMs = 500)(fail("must not acquire"))
    }
    assert(e.getMessage.contains("timed out"))
    releaseIt.countDown()
    holder.join(10000)
    // released → acquires immediately
    var ran = false
    DatasetLock.withLock(fs, dataset, acquireTimeoutMs = 500) { ran = true }
    assert(ran)
  }

  test("lock: a dead holder's lock is stolen after its ttl") {
    val dir = tmpDir("graft_lock_steal")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataset = new Path(dir, "t")
    val lock = DatasetLock.lockPath(dataset).get
    // simulate a crashed holder: a lock file whose heartbeat stopped
    val out = fs.create(lock, false)
    out.write("dead-host:1:00000000-dead".getBytes); out.close()
    fs.setTimes(lock, System.currentTimeMillis() - 60000, -1)
    var ran = false
    DatasetLock.withLock(fs, dataset, ttlMs = 1000, acquireTimeoutMs = 10000) { ran = true }
    assert(ran, "stale lock must be stolen")
    assert(!fs.exists(lock), "stolen-then-released lock must be cleaned up")
  }

  test("lock: heartbeat keeps a LIVE holder from being stolen") {
    val dir = tmpDir("graft_lock_hb")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataset = new Path(dir, "t")
    // holder with a 4 s ttl works for 6 s; a waiter with the same ttl
    // must NOT steal it mid-work (heartbeats every ~1.3 s keep it
    // fresh — the ttl is wide enough that even a heavily loaded host
    // can't starve the heartbeat thread past it). The holder provably
    // acquires FIRST (latch inside its lock body) — otherwise the two
    // sides race for first acquisition and the test measures nothing.
    val holderDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val waiterEntered = new java.util.concurrent.atomic.AtomicLong(0)
    val holderHasLock = new CountDownLatch(1)
    val holder = new Thread(() => DatasetLock.withLock(fs, dataset, ttlMs = 4000) {
      holderHasLock.countDown()
      Thread.sleep(6000); holderDone.set(true)
    })
    holder.start()
    assert(holderHasLock.await(10, TimeUnit.SECONDS), "holder never acquired")
    DatasetLock.withLock(fs, dataset, ttlMs = 4000, acquireTimeoutMs = 30000) {
      waiterEntered.set(System.nanoTime())
      assert(holderDone.get(), "waiter entered while the live holder still worked — stolen despite heartbeat")
    }
    holder.join(15000)
    assert(holderDone.get() && waiterEntered.get() != 0)
  }

  test("non-file scheme with no-op setTimes: heartbeat falls back to content rewrite") {
    // object-store stand-in: non-file scheme (create-exclusive goes
    // through FileSystem.create, not NIO) AND setTimes silently does
    // nothing — the heartbeat must detect the stuck mtime and refresh
    // by rewriting its own token, or a live holder gets stolen
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftnt.impl", classOf[GraftNoTouchFs].getName)
    val dir = tmpDir("graft_lock_nt")
    val dataset = new Path(s"graftnt://$dir/t")
    val fs = dataset.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.getUri.getScheme == "graftnt")

    val holderDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val holderHasLock = new CountDownLatch(1)
    val holder = new Thread(() => DatasetLock.withLock(fs, dataset, ttlMs = 2000) {
      holderHasLock.countDown()
      Thread.sleep(4500); holderDone.set(true) // ~3 ttl-thirds of work
    })
    holder.start()
    assert(holderHasLock.await(10, TimeUnit.SECONDS), "holder never acquired")
    DatasetLock.withLock(fs, dataset, ttlMs = 2000, acquireTimeoutMs = 30000) {
      assert(holderDone.get(),
        "waiter entered while the live holder still worked — content-rewrite heartbeat failed")
    }
    holder.join(15000)
    assert(holderDone.get())

    // and a genuinely dead holder is still stolen on this scheme: plant
    // a lock, let its (frozen) mtime age past the ttl, reacquire
    val dataset2 = new Path(s"graftnt://$dir/t2")
    val lock2 = DatasetLock.lockPath(dataset2).get
    val out = fs.create(lock2, false)
    out.write("dead:1:x".getBytes); out.close()
    Thread.sleep(1300)
    var ran = false
    DatasetLock.withLock(fs, dataset2, ttlMs = 1000, acquireTimeoutMs = 15000) { ran = true }
    assert(ran, "stale lock on non-file scheme must be stolen")
    assert(!fs.exists(lock2))
  }

  test("lock stats combine across writer processes via the sidecar") {
    val root = new Path(tmpDir("graft_lockstats") + "/ds")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val lock = DatasetLock.lockPath(root).get

    // this process: a locked mutation flushes its delta on release
    val before = DatasetLock.combinedStats(fs, root)
    DatasetLock.withLock(fs, root)(())
    val local = DatasetLock.combinedStats(fs, root)
    assert(local.acquires == before.acquires + 1,
      "a released lock must flush its acquire into the sidecar view")
    assert(DatasetLock.statsFor(root).acquires >= 1)

    // a SECOND writer process's release runs exactly this merge while
    // holding the lock — stood in for directly here (same code path a
    // separate JVM executes)
    DatasetLock.mergeIntoSidecar(fs, lock,
      DatasetLock.LockStats(acquires = 3, contended = 2, waitedMs = 1234, steals = 1, timeouts = 1))
    val combined = DatasetLock.combinedStats(fs, root)
    assert(combined.acquires == local.acquires + 3,
      "combined view must include foreign-process acquires")
    assert(combined.contended == local.contended + 2)
    assert(combined.waitedMs == local.waitedMs + 1234)
    assert(combined.steals == local.steals + 1)
    assert(combined.timeouts == local.timeouts + 1)
    // scopes stay explicit: the process-local registry never absorbs
    // foreign counters
    assert(DatasetLock.statsFor(root).acquires < combined.acquires)

    // and this process's NEXT release only flushes its new delta —
    // foreign history is never double-counted or clobbered
    DatasetLock.withLock(fs, root)(())
    val again = DatasetLock.combinedStats(fs, root)
    assert(again.acquires == combined.acquires + 1)
    assert(again.steals == combined.steals)

    // crash recovery: a flush that died between delete(dst) and rename
    // leaves the FULL merged history only in the __tmp orphan — the
    // next locked merge must promote it, not restart the accumulator
    val sidecar = DatasetLock.statsSidecar(lock)
    val orphan = Sidecars.tmpFor(sidecar)
    assert(fs.rename(sidecar, orphan), "stage the crash state")
    assert(!fs.exists(sidecar))
    DatasetLock.mergeIntoSidecar(fs, lock, DatasetLock.LockStats(acquires = 1))
    val recovered = DatasetLock.combinedStats(fs, root)
    assert(recovered.acquires == again.acquires + 1,
      s"history lost in crash recovery: ${recovered.acquires} vs ${again.acquires} + 1")
    assert(recovered.waitedMs == again.waitedMs)
    assert(!fs.exists(orphan), "orphan promoted, not left behind")
  }

  test("vacuum cleans crashed-steal residue but never the live lock") {
    val dir = tmpDir("graft_lock_vac")
    val ds = GraftDataset(s"$dir/t")
    DatasetWriter(ds).write(spark, Seq((1, "a")).toDF("id", "v"))
    val fs = ds.fs(spark)
    val residue = new Path(dir, ".t__lock.stale12345")
    val out = fs.create(residue, false); out.write("x".getBytes); out.close()
    val deleted = ds.vacuum(spark)
    assert(deleted.exists(_.endsWith(".t__lock.stale12345")))
    assert(!fs.exists(residue))
    assert(ds.df(spark).count() == 1)
  }
}

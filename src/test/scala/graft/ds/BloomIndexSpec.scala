package graft.ds

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Bloom key index: delta semantics must be IDENTICAL with and without
  * the sidecar (false positives fall through to the exact anti-join),
  * while an all-new batch must skip the existing-side scan entirely —
  * asserted on the actually-executed plans. */
class BloomIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/ds"

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
      var last = -1; var stable = 0; var waited = 0
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

  test("bloom-indexed delta: identical semantics, superset maintained across writes") {
    val dir = tmpDir("graft_bloom_sem")
    val ds = GraftDataset(dir)
    val w = DatasetWriter(ds).withDeltaSubset("id").withBloomIndex
    w.write(spark, (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    assert(BloomIndex.load(ds.fs(spark), dir).exists(_.cols == Seq("id")),
      "first write must create the sidecar")

    // overlapping delta batch: only unseen keys land
    val n1 = w.withMode(WriteMode.Delta)
      .write(spark, (400 to 700).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    assert(n1 == 200, s"expected 200 new rows, wrote $n1")
    assert(ds.df(spark).count() == 700)

    // re-running the SAME batch is a no-op (keys merged into sidecar)
    val n2 = w.withMode(WriteMode.Delta)
      .write(spark, (400 to 700).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    assert(n2 == 0, s"delta must be idempotent, wrote $n2")
    assert(ds.df(spark).count() == 700)

    // plain appends keep the sidecar superset too (no flags needed)
    DatasetWriter(ds).write(spark, Seq((701L, "x")).toDF("id", "v"))
    val n3 = DatasetWriter(ds, WriteMode.Delta).withDeltaSubset("id")
      .write(spark, Seq((701L, "x"), (702L, "y")).toDF("id", "v"))
    assert(n3 == 1, s"append-then-delta must see the appended key, wrote $n3")
    assert(ds.df(spark).select("id").distinct().count() == 702)
  }

  test("all-new batch skips the existing-side anti-join (the 100 TB fast path)") {
    val dir = tmpDir("graft_bloom_fast")
    val ds = GraftDataset(dir)
    val w = DatasetWriter(ds).withDeltaSubset("id").withBloomIndex
    w.write(spark, (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v"))

    val allNew = (100001 to 100200).map(i => (i.toLong, s"n$i")).toDF("id", "v")
    val plans = capturePlans {
      val n = w.withMode(WriteMode.Delta).write(spark, allNew)
      assert(n == 200)
    }
    assert(plans.nonEmpty)
    assert(!plans.exists(_.contains("LeftAnti")),
      "an all-new batch must not execute the anti-join at all:\n" +
        plans.filter(_.contains("LeftAnti")).mkString("\n---\n"))
    // control: an overlapping batch DOES run the anti-join (the probe
    // is a filter, not a correctness shortcut)
    val overlap = (999 to 1050).map(i => (i.toLong, s"o$i")).toDF("id", "v")
    val plans2 = capturePlans {
      val n = w.withMode(WriteMode.Delta).write(spark, overlap)
      assert(n == 50)
    }
    assert(plans2.exists(_.contains("LeftAnti")),
      "overlapping keys must still verify through the exact anti-join")
    assert(ds.df(spark).count() == 1250)
  }

  test("upsert carries the sidecar through both rewrite paths") {
    // root-path upsert (unpartitioned): sidecar dies in the swap and
    // must be restored with the batch keys absorbed
    val flat = GraftDataset(tmpDir("graft_bloom_uflat"))
    val wf = DatasetWriter(flat).withDeltaSubset("id").withBloomIndex
    wf.write(spark, (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    wf.withMode(WriteMode.Upsert)
      .write(spark, Seq((1L, "u1"), (200L, "n200")).toDF("id", "v"))
    assert(BloomIndex.load(flat.fs(spark), flat.path).nonEmpty,
      "root-swap upsert must restore the sidecar")
    val nf = wf.withMode(WriteMode.Delta)
      .write(spark, Seq((200L, "n200"), (201L, "n201")).toDF("id", "v"))
    assert(nf == 1, s"upserted key must be in the filter, wrote $nf")

    // partition-scoped upsert: sidecar survives in the root, keys merge
    val part = GraftDataset(tmpDir("graft_bloom_upart"), partitioning = Seq("p"))
    val wp = DatasetWriter(part).withDeltaSubset("id").withBloomIndex
    wp.write(spark, (1 to 100).map(i => (i.toLong, s"v$i", i % 4)).toDF("id", "v", "p"))
    wp.withMode(WriteMode.Upsert)
      .write(spark, Seq((300L, "n300", 1)).toDF("id", "v", "p"))
    val np = wp.withMode(WriteMode.Delta)
      .write(spark, Seq((300L, "n300", 1), (301L, "n301", 2)).toDF("id", "v", "p"))
    assert(np == 1, s"partition-upserted key must be in the filter, wrote $np")
  }

  test("overwrite rebuilds; a foreign false positive still resolves exactly") {
    val dir = tmpDir("graft_bloom_ow")
    val ds = GraftDataset(dir)
    val w = DatasetWriter(ds).withDeltaSubset("id").withBloomIndex
    w.write(spark, (1 to 300).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val bytesBefore = BloomIndex.load(ds.fs(spark), dir).get.bytes.toSeq
    w.withMode(WriteMode.Overwrite)
      .write(spark, (1000 to 1100).map(i => (i.toLong, s"w$i")).toDF("id", "v"))
    val after = BloomIndex.load(ds.fs(spark), dir).get
    assert(after.bytes.toSeq != bytesBefore, "overwrite must rebuild the filter")
    // old keys are NOT in the rebuilt filter → an old-key batch is
    // all-new again; and a batch matching live keys still dedups
    assert(DatasetWriter(ds, WriteMode.Delta).withDeltaSubset("id")
      .write(spark, Seq((1L, "v1")).toDF("id", "v")) == 1)
    assert(DatasetWriter(ds, WriteMode.Delta).withDeltaSubset("id")
      .write(spark, Seq((1000L, "w1000")).toDF("id", "v")) == 0)
  }

  test("expression: bloomContains agrees with filter membership, handles nulls") {
    val keys = (1L to 1000L).toDF("id")
    val bf = BloomIndex.fromBatch(keys, Seq("id"), 10000, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val probe = Seq[java.lang.Long](5L, 999L, 50000L, null).toDF("id")
      .select(graft.plans.GraftExpressions.bloomContains(spark,
        BloomIndex.keyHash(Seq("id")), bos.toByteArray).as("m"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(probe(0).contains(true) && probe(1).contains(true),
      "present keys must probe true (no false negatives)")
    // xxhash64 hashes null deterministically → non-null probe result
    assert(probe(3).isDefined)
  }
}

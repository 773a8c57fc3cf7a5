package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Distributed object-ops parity with the reference's s5cmd surface
  * (`filesystem/s5cmd.py`): ls/du/cp/sync/rm/mv/cat semantics, run over
  * both the default `file:` scheme and the custom `graftfs:` scheme (the
  * offline object-store stand-in, same class UriAgnosticSpec uses). */
class FsOpsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    s.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[graft.ds.GraftTestFs].getName)
    s
  }

  private def tmp(): String = Files.createTempDirectory("graft_fsops_").toString

  private def put(dir: String, rel: String, content: String): Unit = {
    val p = Paths.get(dir, rel)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
  }

  private val schemes: Seq[(String, String => String)] = Seq(
    "file" -> identity[String],
    "graftfs" -> ((p: String) => s"graftfs://$p"))

  for ((name, u) <- schemes) {
    test(s"[$name] ls + du see the recursive tree") {
      val root = tmp()
      put(root, "a.txt", "alpha")
      put(root, "sub/b.txt", "bravo!")
      put(root, "sub/deep/c.txt", "c")
      val entries = FsOps.ls(spark, u(root))
      assert(entries.map(_.rel).sorted == Seq("a.txt", "sub/b.txt", "sub/deep/c.txt"))
      val (n, bytes) = FsOps.du(spark, u(root))
      assert(n == 3 && bytes == 5 + 6 + 1)
      // single-object listing
      val one = FsOps.ls(spark, u(s"$root/sub/b.txt"))
      assert(one.size == 1 && one.head.size == 6)
    }

    test(s"[$name] cp replicates a tree with identical bytes; file-cp hits the exact path") {
      val src = tmp(); val dest = tmp() + "/mirror"
      put(src, "x/one.bin", "1" * 1000)
      put(src, "two.bin", "22")
      val stats = FsOps.cp(spark, u(src), u(dest))
      assert(stats.files == 2 && stats.bytes == 1002)
      assert(new String(Files.readAllBytes(Paths.get(dest, "x/one.bin"))) == "1" * 1000)
      assert(new String(FsOps.cat(spark, u(s"$dest/two.bin")), StandardCharsets.UTF_8) == "22")
      // no temp litter left behind
      assert(FsOps.ls(spark, u(dest)).forall(!_.rel.contains("_graft_fsops_")))
      // single-file cp → dest IS the target path
      val fdest = tmp() + "/renamed.bin"
      FsOps.cp(spark, u(s"$src/two.bin"), u(fdest))
      assert(new String(Files.readAllBytes(Paths.get(fdest))) == "22")
    }

    test(s"[$name] sync copies only missing/changed, delete=true prunes extraneous") {
      val src = tmp(); val dest = tmp()
      put(src, "k1", "aaaa")
      put(src, "d/k2", "bb")
      val first = FsOps.sync(spark, u(src), u(dest))
      assert(first.files == 2 && first.skipped == 0)
      // second sync: nothing newer → all skipped
      val second = FsOps.sync(spark, u(src), u(dest))
      assert(second.files == 0 && second.skipped == 2)
      // size change → exactly one re-copy
      put(src, "k1", "aaaaAAAA")
      val third = FsOps.sync(spark, u(src), u(dest))
      assert(third.files == 1 && third.skipped == 1)
      assert(new String(Files.readAllBytes(Paths.get(dest, "k1"))) == "aaaaAAAA")
      // extraneous dest object removed only under delete=true
      put(dest, "stale", "zzz")
      val keep = FsOps.sync(spark, u(src), u(dest))
      assert(keep.deleted == 0 && Files.exists(Paths.get(dest, "stale")))
      val pruned = FsOps.sync(spark, u(src), u(dest), delete = true)
      assert(pruned.deleted == 1 && !Files.exists(Paths.get(dest, "stale")))
    }

    test(s"[$name] mv + rm leave no source objects behind") {
      val src = tmp(); val dest = tmp() + "/moved"
      put(src, "m1", "q")
      put(src, "n/m2", "rr")
      val stats = FsOps.mv(spark, u(src), u(dest))
      assert(stats.files == 2)
      assert(FsOps.ls(spark, u(src)).isEmpty)
      assert(FsOps.ls(spark, u(dest)).map(_.rel).sorted == Seq("m1", "n/m2"))
      assert(FsOps.rm(spark, u(dest)) == 2)
      assert(FsOps.ls(spark, u(dest)).isEmpty)
    }
  }

  test("parquet round-trip through a distributed copy is lossless") {
    import spark.implicits._
    val src = tmp() + "/ds"; val dest = tmp() + "/mirror"
    val df = (1 to 5000).map(i => (i.toLong, s"row$i", i * 1.5)).toDF("id", "s", "v")
    df.repartition(4).write.parquet(src)
    FsOps.cp(spark, src, dest)
    val back = spark.read.parquet(dest)
    assert(back.count() == 5000)
    assert(back.agg(org.apache.spark.sql.functions.sum("v")).head.getDouble(0)
      == df.agg(org.apache.spark.sql.functions.sum("v")).head.getDouble(0))
  }

  test("large-object manifest is spread across slices, not piled on one task") {
    val src = tmp(); val dest = tmp() + "/m"
    put(src, "big1", "x" * 2000000)
    put(src, "big2", "y" * 1900000)
    (1 to 20).foreach(i => put(src, s"small$i", "z" * 10))
    val stats = FsOps.cp(spark, src, dest)
    assert(stats.files == 22 && stats.bytes == 2000000 + 1900000 + 200)
    val (n, bytes) = FsOps.du(spark, dest)
    assert(n == 22 && bytes == stats.bytes)
  }

  test("planSlices: every slice non-empty, giants split, one task each") {
    // the distribution itself, not a byte-total proxy: a hash
    // repartition of slice ids would leave ~1/e of partitions empty and
    // could serialize both giants behind one task
    def e(name: String, size: Long) = FsOps.Entry(s"/x/$name", name, size, 0L)
    val entries = Seq(e("big1", 2000000), e("big2", 1900000)) ++
      (1 to 20).map(i => e(s"small$i", 10))
    val n = 8
    val plan = FsOps.planSlices(entries, n)
    assert(plan.size == n, s"expected $n slices, got ${plan.size}")
    assert(plan.forall(_.nonEmpty), "round-robin must leave no slice empty")
    val sliceOf = plan.zipWithIndex.flatMap { case (s, i) => s.map(_._1 -> i) }.toMap
    assert(sliceOf("/x/big1") != sliceOf("/x/big2"),
      "the two largest objects must land on different tasks")
    assert(plan.flatten.size == entries.size)
  }
}

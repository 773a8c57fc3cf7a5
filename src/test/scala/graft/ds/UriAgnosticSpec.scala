package graft.ds

import java.nio.file.Files
import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.meta.TimeFly

/** A Hadoop FileSystem with a NON-file scheme, backed by the local disk —
  * the offline stand-in for `s3a://`/`gs://`: if every path in the
  * library threads through `Path.getFileSystem` (instead of assuming
  * `file:`), the same code must work unchanged under this scheme.
  * Hadoop instantiates it by name from `fs.graftfs.impl`. */
class GraftTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.{FileStatus, Path => HPath}
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")

  // RawLocalFileSystem's statuses load permissions lazily via
  // `new java.io.File(status.getPath.toUri)`, which rejects any scheme
  // but file: — materialize plain statuses with explicit permissions so
  // the lazy path never runs under the graftfs: scheme
  private def clean(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getDefault,
      null, null, st.getPath)
  override def listStatus(f: HPath): Array[FileStatus] =
    super.listStatus(f).map(clean)
  override def getFileStatus(f: HPath): FileStatus =
    clean(super.getFileStatus(f))
}

/** Same local-disk stand-in under a SECOND scheme that is registered as
  * flat-namespace, so every listing the suite performs routes through
  * [[graft.core.FsListing]]'s object-store branch (one recursive
  * `listFiles` LIST with post-hoc ancestor filtering) instead of the
  * hierarchical per-directory walk — the exact path an `s3a://`
  * deployment takes. */
class GraftFlatTestFs extends GraftTestFs {
  override def getScheme: String = "graftflat"
  override def getUri: java.net.URI = java.net.URI.create("graftflat:///")
}

/** Reference parity for the filesystem/ subsystem (`filesystem/base.py:
  * 13-188`, `fs.py:7-139`): pydala abstracts object stores behind
  * fsspec; graft abstracts them behind Hadoop FS URIs. This suite proves
  * the abstraction by running the write/snapshot/partition surfaces over
  * three schemes — the default `file:`, the custom `graftfs:`, and
  * `graftflat:` (same stand-in, registered flat-namespace, so the whole
  * suite additionally exercises the object-store LISTING strategy
  * end-to-end) — with identical assertions. */
class UriAgnosticSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    s.sparkContext.hadoopConfiguration.set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    s.sparkContext.hadoopConfiguration.set("fs.graftflat.impl", classOf[GraftFlatTestFs].getName)
    graft.core.FsListing.registerFlatNamespaceScheme("graftflat")
    s
  }

  private def tmp(): String = Files.createTempDirectory("graft_uri_").toString

  // "file" = plain local path (the default everywhere else);
  // "graftfs" = same absolute path addressed through the custom scheme;
  // "graftflat" = ditto, but listed via the flat object-store strategy
  private val schemes: Seq[(String, String => String)] = Seq(
    "file" -> identity[String],
    "graftfs" -> ((p: String) => s"graftfs://$p"),
    "graftflat" -> ((p: String) => s"graftflat://$p"))

  test("graftflat routes through the flat-namespace listing branch") {
    spark // force registration
    val fs = new org.apache.hadoop.fs.Path("graftflat:///x")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(graft.core.FsListing.isFlatNamespace(fs),
      "registered scheme must take the object-store LIST strategy")
    val local = new org.apache.hadoop.fs.Path("/x")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!graft.core.FsListing.isFlatNamespace(local),
      "file: must keep the hierarchical walk")
  }

  for ((name, u) <- schemes) {
    import spark.implicits._

    test(s"[$name] writer modes + delta diff work through the FS abstraction") {
      val dir = u(tmp() + "/ds")
      val ds = GraftDataset(dir)
      assert(DatasetWriter(ds, WriteMode.Overwrite)
        .write(spark, Seq((1, "a"), (2, "b")).toDF("k", "v")) == 2)
      // delta: only the unseen key lands
      val n = DatasetWriter(ds, WriteMode.Delta)
        .write(spark, Seq((2, "b"), (3, "c")).toDF("k", "v"))
      assert(n == 1, s"delta appended $n rows under $name")
      assert(ds.df(spark).count() == 3)
    }

    test(s"[$name] TimeFly snapshot cycle (copy + manifest) is scheme-independent") {
      val root = u(tmp() + "/tf")
      val tf = new TimeFly(spark, root)
      tf.init("uri_test")
      val cur = tf.currentDataset()
      DatasetWriter(cur, WriteMode.Overwrite).write(spark, Seq(1, 2).toDF("k"))
      val idCopy = tf.addSnapshot(Instant.parse("2024-01-01T00:00:00Z"))
      val idMan = tf.addSnapshot(Instant.parse("2024-02-01T00:00:00Z"), manifest = true)
      DatasetWriter(cur, WriteMode.Append).write(spark, Seq(3).toDF("k"))
      assert(tf.availableSnapshots() == Seq(idCopy, idMan))
      assert(tf.read(Some(Instant.parse("2023-12-01T00:00:00Z"))).df(spark).count() == 2)
      assert(tf.read(Some(Instant.parse("2024-01-15T00:00:00Z"))).df(spark).count() == 2)
      assert(tf.read(None).df(spark).count() == 3)
      tf.loadSnapshot(idMan) // manifest restore: staging + swap, same FS api
      assert(tf.read(None).df(spark).count() == 2)
    }

    test(s"[$name] directory-flavor partition write/read round-trips") {
      val dir = u(tmp() + "/dp")
      val df = Seq((1, "x", "2024"), (2, "y", "2024"), (3, "x", "2025"))
        .toDF("k", "cat", "year")
      DirectoryPartitioning.write(spark, df, dir, Seq("year", "cat"))
      val back = DirectoryPartitioning.read(spark, dir, Seq("year", "cat"))
      assert(back.count() == 3)
      assert(back.select("year", "cat").distinct().as[(String, String)].collect().toSet ==
        Set(("2024", "x"), ("2024", "y"), ("2025", "x")))
    }

    test(s"[$name] schema-unify rewrite works through the FS abstraction") {
      val dir = u(tmp() + "/unify")
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.Row
      spark.createDataFrame(java.util.List.of(Row(1), Row(2)),
        StructType(Seq(StructField("a", IntegerType)))).write.parquet(dir)
      spark.createDataFrame(java.util.List.of(Row(9L)),
        StructType(Seq(StructField("a", LongType)))).write.mode("append").parquet(dir)
      val ds = GraftDataset(dir)
      assert(DatasetWriter.unifySchemaRewrite(spark, ds))
      assert(spark.read.parquet(dir).schema("a").dataType == LongType)
      assert(spark.read.parquet(dir).count() == 3)
    }
  }

  test("[graftflat] lake catalog + maintenance run through the object-store listing path") {
    import spark.implicits._
    val lake = s"graftflat://${tmp()}/lake"
    val m = new graft.meta.Manager(spark, lake)
    m.init("flatlake")
    // a fragmented plain dataset (4 one-row-ish files) + a TimeFly one;
    // discover() scans the lake root for _dataset.toml markers via
    // FsListing.iterFiles — under graftflat that is the flat recursive
    // LIST an s3a:// lake would issue
    DatasetWriter(GraftDataset(s"$lake/frag"), WriteMode.Overwrite, batchRows = Some(2L))
      .write(spark, (1 to 8).map(i => (i, s"v$i")).toDF("k", "v"))
    val tf = new graft.meta.TimeFly(spark, s"$lake/sales")
    tf.init("sales")
    DatasetWriter(tf.currentDataset(), WriteMode.Overwrite)
      .write(spark, Seq((1, 10.0), (2, 20.0)).toDF("id", "amt"))
    val discovered = m.discover()
    assert(discovered.contains("sales"),
      s"flat-scheme discovery missed the marked dataset: $discovered")
    m.addDataset("frag", s"$lake/frag") // plain dirs have no toml marker
    m.registerAll()
    assert(spark.sql("SELECT SUM(amt) FROM sales").collect()(0).getDouble(0) == 30.0)
    // compactAll plans from flat-LIST metadata and must preserve rows
    m.compactAll()
    assert(GraftDataset(s"$lake/frag").df(spark).count() == 8)
    // s5cmd-style object ops over the flat scheme
    val entries = graft.sources.FsOps.ls(spark, s"$lake/frag")
    assert(entries.nonEmpty, "ls must see the compacted objects")
    val (nObj, nBytes) = graft.sources.FsOps.du(spark, s"$lake/frag")
    assert(nObj > 0 && nBytes > 0)
    val copied = graft.sources.FsOps.cp(spark, s"$lake/frag", s"$lake/frag_copy")
    assert(copied.files == nObj && copied.bytes == nBytes,
      s"cp must move every object: $copied vs ($nObj, $nBytes)")
    assert(spark.read.parquet(s"$lake/frag_copy").count() == 8)
    assert(graft.sources.FsOps.rm(spark, s"$lake/frag_copy") == nObj)
  }

  test("repartition routing: same relative path on DIFFERENT filesystems is a copy, not in-place") {
    spark // force init so fs.graftfs.impl is registered
    val real = tmp() + "/ds/foo"
    val local = GraftDataset(real)
    // same path string through another scheme = a cross-lake copy
    // target; a bare-path comparison would misroute it in-place and
    // every source.fs call on dest paths would throw "Wrong FS"
    assert(!Repartition.samePlace(spark, local, GraftDataset(s"graftfs://$real")),
      "different schemes must route to the copy branch")
    assert(Repartition.samePlace(spark, local, GraftDataset(real)),
      "identical location must stay in-place")
    // qualification, not string equality: trailing-slash spellings of
    // one location still compare equal
    assert(Repartition.samePlace(spark, local, GraftDataset(real + "/")),
      "equivalent spellings of one location must stay in-place")
  }
}

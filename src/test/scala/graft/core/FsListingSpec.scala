package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The two [[FsListing]] strategies — flat `listFiles(recursive)` with
  * post-hoc ancestor filtering (object stores) and the per-directory
  * `listStatus` walk (hierarchical filesystems) — must return the SAME
  * file set for the same tree and `descend` predicate; a divergence
  * would make dataset existence/delta detection depend on the storage
  * scheme. Pinned here on a local fixture tree exercising nesting,
  * hidden dirs at several depths, hive partition dirs, and files
  * directly under the root.
  */
class FsListingSpec extends AnyFunSuite {

  private def mkTree(): Path = {
    val root = java.nio.file.Files.createTempDirectory("fslisting").toFile
    def touch(rel: String): Unit = {
      val f = new java.io.File(root, rel)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, Array[Byte](1))
    }
    touch("a.parquet")
    touch("p=1/b.parquet")
    touch("p=1/q=2/c.parquet")
    touch("_staging/hidden1.parquet")          // underscore dir, no '='
    touch(".backup/hidden2.parquet")           // dot dir
    touch("p=1/.swap_old/hidden3.parquet")     // hidden at depth
    touch("__bucket=x/d.parquet")              // underscore WITH '=' → data
    touch("p=1/_SUCCESS")                      // hidden FILE name (caller filters)
    new Path(root.toString)
  }

  private def hiddenName(n: String): Boolean =
    n.startsWith(".") || (n.startsWith("_") && !n.contains("="))

  test("flatList and statusWalk agree, including hidden-subtree pruning") {
    val root = mkTree()
    val fs = root.getFileSystem(new Configuration())
    val rootQ = fs.makeQualified(root)
    def names(s: Seq[org.apache.hadoop.fs.FileStatus]): Set[String] =
      s.map(_.getPath.toString.stripPrefix(rootQ.toString + "/")).toSet
    val walk = names(FsListing.statusWalk(fs, rootQ, n => !hiddenName(n)))
    val flat = names(FsListing.flatList(fs, rootQ, n => !hiddenName(n)))
    assert(walk == flat, s"strategies diverged: walk=$walk flat=$flat")
    // and the set is the right one: hidden SUBTREES gone, hive-style
    // underscore dirs kept, hidden FILE names still present (that
    // filter belongs to the caller — GraftDataset applies its own)
    assert(walk == Set("a.parquet", "p=1/b.parquet", "p=1/q=2/c.parquet",
      "__bucket=x/d.parquet", "p=1/_SUCCESS"))
    // unfiltered: both see everything
    assert(names(FsListing.statusWalk(fs, rootQ, _ => true)) ==
      names(FsListing.flatList(fs, rootQ, _ => true)))
    fs.delete(rootQ, true)
  }

  test("iterFiles streams the same set walkFiles materializes") {
    val root = mkTree()
    val fs = root.getFileSystem(new Configuration())
    val rootQ = fs.makeQualified(root)
    def names(s: Iterable[org.apache.hadoop.fs.FileStatus]): Set[String] =
      s.map(_.getPath.toString.stripPrefix(rootQ.toString + "/")).toSet
    // the streaming variant is the SAME per-FS-kind strategy, produced
    // lazily — set equality with the materializing entry point, with
    // and without the hidden-subtree filter
    assert(names(FsListing.iterFiles(fs, rootQ, n => !hiddenName(n)).toSeq) ==
      names(FsListing.walkFiles(fs, rootQ, n => !hiddenName(n))))
    assert(names(FsListing.iterFiles(fs, rootQ).toSeq) ==
      names(FsListing.walkFiles(fs, rootQ)))
    // Iterator contract: exhausting then calling next() throws, and
    // hasNext is idempotent (Manager's while-loop calls it repeatedly)
    val it = FsListing.iterFiles(fs, rootQ)
    while (it.hasNext) it.next()
    assert(!it.hasNext && !it.hasNext)
    intercept[NoSuchElementException](it.next())
    fs.delete(rootQ, true)
  }
}

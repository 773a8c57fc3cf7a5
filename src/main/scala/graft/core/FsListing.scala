package graft.core

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Recursive file listing that picks the right strategy per filesystem
  * KIND — measured, not assumed:
  *
  *  - **Flat-namespace object stores** (S3A & friends): Hadoop's
  *    `listFiles(path, recursive = true)` is THE efficient call — one
  *    paged flat LIST over the key prefix, the same request s5cmd
  *    issues, never one RPC per directory. Keep it.
  *  - **Hierarchical filesystems** (file://, HDFS, custom schemes): the
  *    default `FileSystem.listFiles(recursive)` implementation re-stats
  *    every file behind its RemoteIterator (block locations), and on
  *    LocalFileSystem that per-file work grows with the SIBLING count —
  *    measured super-linear on the w7 read-back (600 files: 1.9 s,
  *    1800 files: 8.2 s, while plain `listStatus` takes 0.02/0.08 s).
  *    A count-batched write at 100 TB produces millions of bounded
  *    files; a listing that is quadratic in directory size is a
  *    scale-killer. Here: an explicit directory stack with ONE
  *    `listStatus` per directory — linear in entries, and hidden
  *    subtrees are pruned BEFORE descending (the flat branch can only
  *    filter after the fact — there is no tree to prune).
  *
  * `descend` gates recursion per directory NAME (segment): a directory
  * whose name fails the predicate is not entered (hierarchical) /
  * files under it are filtered out (flat) — the two branches agree on
  * the result set.
  */
object FsListing {

  /** Schemes whose `listFiles(recursive)` is a single paged flat LIST
    * (object stores with no real directory tree). Everything else gets
    * the listStatus walk. */
  private val flatNamespaceSchemes =
    Set("s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss", "cos", "swift")

  def isFlatNamespace(fs: FileSystem): Boolean =
    flatNamespaceSchemes.contains(
      Option(fs.getUri.getScheme).map(_.toLowerCase).getOrElse(""))

  /** All FILE statuses under `root` (which must exist), recursively.
    * Directories whose NAME fails `descend` are excluded — subtree and
    * all. Order is unspecified. */
  def walkFiles(fs: FileSystem, root: Path,
      descend: String => Boolean = _ => true): Seq[FileStatus] = {
    val rootQ = fs.makeQualified(root)
    if (isFlatNamespace(fs)) flatList(fs, rootQ, descend)
    else statusWalk(fs, rootQ, descend)
  }

  /** Flat paged LIST via `listFiles(recursive)` with a post-hoc
    * ancestor filter (no tree to prune on an object store). Correct on
    * any filesystem — FsListingSpec runs it against [[statusWalk]] on
    * the same local tree to pin their equivalence — but only EFFICIENT
    * where the scheme implements it as one prefix listing. */
  private[core] def flatList(fs: FileSystem, rootQ: Path,
      descend: String => Boolean): Seq[FileStatus] = {
    val rootPrefix = rootQ.toString.stripSuffix("/") + "/"
    def ancestorsOk(p: Path): Boolean = {
      val rel = p.toString.stripPrefix(rootPrefix)
      val segs = rel.split('/')
      segs.iterator.take(math.max(0, segs.length - 1)).forall(descend)
    }
    val it = fs.listFiles(rootQ, true)
    val buf = Seq.newBuilder[FileStatus]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && ancestorsOk(st.getPath)) buf += st
    }
    buf.result()
  }

  /** Explicit directory stack, one `listStatus` per directory, hidden
    * subtrees pruned BEFORE descent. */
  private[core] def statusWalk(fs: FileSystem, rootQ: Path,
      descend: String => Boolean): Seq[FileStatus] = {
    val buf = Seq.newBuilder[FileStatus]
    val stack = scala.collection.mutable.Stack[Path](rootQ)
    while (stack.nonEmpty) {
      val d = stack.pop()
      for (st <- fs.listStatus(d)) {
        if (st.isDirectory) {
          if (descend(st.getPath.getName)) stack.push(st.getPath)
        } else if (st.isFile) buf += st
      }
    }
    buf.result()
  }
}

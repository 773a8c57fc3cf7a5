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

  /** User-registered additions to [[flatNamespaceSchemes]] — for custom
    * object-store connectors (a MinIO/Ceph gateway mounted under its
    * own scheme) whose recursive listing is also one paged prefix LIST.
    * Also how the test suite routes a local-disk scheme through the
    * flat branch, so every dataset operation exercises the exact
    * listing path an s3a:// deployment would take. */
  private val extraFlatSchemes =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def registerFlatNamespaceScheme(scheme: String): Unit =
    extraFlatSchemes.add(scheme.toLowerCase)

  def isFlatNamespace(fs: FileSystem): Boolean = {
    val s = Option(fs.getUri.getScheme).map(_.toLowerCase).getOrElse("")
    flatNamespaceSchemes.contains(s) || extraFlatSchemes.contains(s)
  }

  /** All FILE statuses under `root` (which must exist), recursively.
    * Directories whose NAME fails `descend` are excluded — subtree and
    * all. Order is unspecified. */
  def walkFiles(fs: FileSystem, root: Path,
      descend: String => Boolean = _ => true): Seq[FileStatus] =
    iterFiles(fs, root, descend).toSeq

  /** Streaming variant of [[walkFiles]]: the same per-FS-kind strategy,
    * but the statuses are produced lazily — a consumer scanning a
    * million-file lake for a handful of marker files (Manager.discover)
    * holds one directory's batch (hierarchical) or one LIST page (flat)
    * in memory, never the full listing. */
  def iterFiles(fs: FileSystem, root: Path,
      descend: String => Boolean = _ => true): Iterator[FileStatus] = {
    val rootQ = fs.makeQualified(root)
    if (isFlatNamespace(fs)) flatIter(fs, rootQ, descend)
    else statusWalkIter(fs, rootQ, descend)
  }

  /** Flat paged LIST via `listFiles(recursive)` with a post-hoc
    * ancestor filter (no tree to prune on an object store). Correct on
    * any filesystem — FsListingSpec runs it against [[statusWalk]] on
    * the same local tree to pin their equivalence — but only EFFICIENT
    * where the scheme implements it as one prefix listing. */
  private[core] def flatList(fs: FileSystem, rootQ: Path,
      descend: String => Boolean): Seq[FileStatus] =
    flatIter(fs, rootQ, descend).toSeq

  private def flatIter(fs: FileSystem, rootQ: Path,
      descend: String => Boolean): Iterator[FileStatus] = {
    val rootPrefix = rootQ.toString.stripSuffix("/") + "/"
    def ancestorsOk(p: Path): Boolean = {
      val rel = p.toString.stripPrefix(rootPrefix)
      val segs = rel.split('/')
      segs.iterator.take(math.max(0, segs.length - 1)).forall(descend)
    }
    val it = fs.listFiles(rootQ, true)
    new Iterator[FileStatus] {
      def hasNext: Boolean = it.hasNext
      def next(): FileStatus = it.next()
    }.filter(st => st.isFile && ancestorsOk(st.getPath))
  }

  /** Explicit directory stack, one `listStatus` per directory, hidden
    * subtrees pruned BEFORE descent. */
  private[core] def statusWalk(fs: FileSystem, rootQ: Path,
      descend: String => Boolean): Seq[FileStatus] =
    statusWalkIter(fs, rootQ, descend).toSeq

  /** Lazy stack walk: one `listStatus` batch is buffered at a time;
    * subdirectories queue as PATHS (cheap) until their turn. */
  private def statusWalkIter(fs: FileSystem, rootQ: Path,
      descend: String => Boolean): Iterator[FileStatus] = {
    val stack = scala.collection.mutable.Stack[Path](rootQ)
    new Iterator[FileStatus] {
      private var batch: Array[FileStatus] = Array.empty
      private var i = 0
      private def advance(): Unit =
        while (i >= batch.length && stack.nonEmpty) {
          batch = fs.listStatus(stack.pop()); i = 0
          var j = 0
          while (j < batch.length) {
            val st = batch(j)
            if (st.isDirectory && descend(st.getPath.getName)) stack.push(st.getPath)
            j += 1
          }
          while (i < batch.length && !batch(i).isFile) i += 1
        }
      def hasNext: Boolean = { advance(); i < batch.length }
      def next(): FileStatus = {
        if (!hasNext) throw new NoSuchElementException
        val st = batch(i)
        i += 1
        while (i < batch.length && !batch(i).isFile) i += 1
        st
      }
    }
  }
}

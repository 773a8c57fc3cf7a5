package graft.ds

import org.apache.hadoop.fs.{FileSystem, Path}

/** THE sidecar promotion protocol, in one place: stage the new bytes
  * beside the destination under a hidden `.name__tmp`, then
  * delete + rename. An unlocked reader never sees a torn file (the
  * rename is atomic on every Hadoop FS graft targets), and a crash
  * mid-write costs at most the staged copy. Previously each sidecar
  * (bloom index, stats index root + segments, rowgroup-bloom contract,
  * lock stats) hand-rolled this with drifting details — a durability
  * fix had five places to miss; now they all call here.
  *
  * The tmp name is dot-hidden so directory-listing readers (Spark's
  * file index, the stats segment scan) skip it by convention.
  * [[tmpFor]] is exposed because the lock-stats accumulator recovers
  * crash-orphaned tmps (its content cannot be rebuilt from data — see
  * DatasetLock.mergeIntoSidecar). */
object Sidecars {

  def tmpFor(dst: Path): Path = new Path(dst.getParent, s".${dst.getName}__tmp")

  /** Stage + promote; throws (IllegalArgumentException) when the
    * rename is refused — silent loss of a sidecar update is how stale
    * supersets stop being supersets. */
  def atomicWrite(fs: FileSystem, dst: Path, bytes: Array[Byte], what: String): Unit = {
    val tmp = tmpFor(dst)
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    fs.delete(dst, false)
    require(fs.rename(tmp, dst), s"$what: cannot promote $tmp to $dst")
  }
}

package graft.core

import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** File and snapshot naming (reference: data-file stamps
  * `writer.py:141` + `utils/base.py:58-60`; snapshot ids
  * `timefly.py:67-78`). All timestamps UTC. */
object Naming {
  private val FileStamp = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmssSSS")
  private val SnapId = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
  private val Alnum = "abcdefghijklmnopqrstuvwxyz0123456789"

  def randomId(n: Int = 8, rng: scala.util.Random = scala.util.Random): String =
    Seq.fill(n)(Alnum(rng.nextInt(Alnum.length))).mkString

  /** `{base}-{YYYYMMDD_HHMMSSmmm}-{rand8}.{ext}` */
  def dataFileName(base: String, ext: String, now: Instant = Instant.now()): String = {
    val ts = LocalDateTime.ofInstant(now, ZoneOffset.UTC).format(FileStamp)
    s"$base-$ts-${randomId()}.$ext"
  }

  /** Snapshot id `YYYYMMDD_HHMMSS` at second resolution, UTC. */
  def snapshotId(now: Instant = Instant.now()): String =
    LocalDateTime.ofInstant(now, ZoneOffset.UTC).format(SnapId)

  def parseSnapshotId(id: String): Instant =
    LocalDateTime.parse(id, SnapId).toInstant(ZoneOffset.UTC)

  /** Time-travel resolution (reference `timefly.py:337-352`): pick the
    * FIRST snapshot strictly newer than the probe; None = use current. */
  def resolveSnapshot(available: Seq[String], probe: Instant): Option[String] =
    available.sorted.find(id => parseSnapshotId(id).isAfter(probe))
}

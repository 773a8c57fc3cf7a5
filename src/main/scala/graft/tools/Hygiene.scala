package graft.tools

import scala.jdk.CollectionConverters._

/** Temp-dir hygiene shared by the timing mains: ops queries mint
  * `graft_q_*` temp datasets (plus streaming checkpoints) and never
  * delete them — a long run leaves 100s of dirs / GBs in
  * java.io.tmpdir, and later queries then run against a page cache and
  * tmpfs full of dead data. Each invocation creates fresh dirs, so
  * nothing live is ever deleted; only this naming pattern is touched. */
object Hygiene {
  private val tmpRoot = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
  def sweepTmp(): Unit =
    try {
      val it = java.nio.file.Files.list(tmpRoot)
      try it.iterator().asScala
        .filter(_.getFileName.toString.startsWith("graft_q_"))
        .foreach { d =>
          try {
            java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverseIterator
              .foreach(p => java.nio.file.Files.deleteIfExists(p))
          } catch { case _: Throwable => () } // best-effort hygiene
        }
      finally it.close()
    } catch { case _: Throwable => () }
}

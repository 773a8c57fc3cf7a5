package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Byte-size reporting helpers (reference F5: `utils/base.py:63-75`
  * B→PB conversion, surfaced by `disk_usage`/`buffer_size`,
  * `dataset/reader.py:556-581`). */
object SizeUnits {
  private val Units = Seq("B", "KB", "MB", "GB", "TB", "PB")

  /** `1536 → "1.5 KB"` — decimal thousand steps like the reference.
    * The 1-decimal rounding is an explicit floor(x·10 + 0.5)/10 BEFORE
    * formatting: printf %.1f rounds HALF_UP on the JVM but half-even in
    * fmtlib-based engines (DuckDB), so formatting an unrounded .x5
    * value would diverge across engines. */
  def humanize(bytes: Long): String = {
    var v = bytes.toDouble
    var u = 0
    while (v >= 1000.0 && u < Units.length - 1) { v /= 1000.0; u += 1 }
    if (u == 0) s"${bytes} B"
    else f"${math.floor(v * 10 + 0.5) / 10}%.1f ${Units(u)}"
  }

  /** Column-expression twin of [[humanize]] so humanization can run
    * distributed inside a plan instead of per-row on the driver. Rounds
    * with the same explicit floor(x·10 + 0.5)/10 as the scalar version
    * — see there for why %.1f alone is not engine-portable. */
  def humanizeCol(bytes: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val b = bytes.cast("long")
    def r1(c: org.apache.spark.sql.Column) = floor(c * 10 + 0.5) / 10
    when(b < 1000L, concat(b.cast("string"), lit(" B")))
      .when(b < 1000000L, format_string("%.1f KB", r1(b / 1000.0)))
      .when(b < 1000000000L, format_string("%.1f MB", r1(b / 1e6)))
      .when(b < 1000000000000L, format_string("%.1f GB", r1(b / 1e9)))
      .when(b < 1000000000000000L, format_string("%.1f TB", r1(b / 1e12)))
      .otherwise(format_string("%.1f PB", r1(b / 1e15)))
  }

  /** Recursive directory byte size via Hadoop FS content summary. */
  def diskUsage(conf: Configuration, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
  }

  def diskUsageHuman(conf: Configuration, path: String): String =
    humanize(diskUsage(conf, path))
}

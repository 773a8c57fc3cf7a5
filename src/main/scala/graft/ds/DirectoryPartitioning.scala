package graft.ds

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** "Directory"-flavor partitioning: bare-value path segments
  * (`.../FURNITURE/part-0.parquet`) instead of hive's
  * `col=value` (reference `dataset/writer.py:136-137` writes it,
  * `dataset/timefly.py:105-112` infers it). Spark has no native reader
  * for valueless layouts, so:
  *
  *  - write: one executor-parallel hive write, then a driver-side
  *    rename pass strips the `col=` prefixes (O(directories) FS calls,
  *    no data movement);
  *  - read: ONE vectorized scan over all leaf files — partition values
  *    are recovered from `input_file_name()` path segments as string
  *    columns (the reference's DirectoryPartitioning is string-typed by
  *    default too). No per-partition union, so the plan scales with
  *    files, not partitions.
  */
object DirectoryPartitioning {

  /** Write `df` under `path` partitioned by `cols`, bare-value layout. */
  def write(spark: SparkSession, df: DataFrame, path: String,
      cols: Seq[String], compression: String = "zstd"): Unit = {
    require(cols.nonEmpty, "partition columns required")
    df.write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .partitionBy(cols: _*).parquet(path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // strip "col=" prefixes level by level
    def strip(dir: Path, level: Int): Unit = {
      if (level >= cols.length) return
      fs.listStatus(dir).filter(_.isDirectory).foreach { st =>
        val name = st.getPath.getName
        val bare = name.indexOf('=') match {
          case -1 => name
          case i => name.substring(i + 1)
        }
        val target = if (bare == name) st.getPath else {
          val t = new Path(dir, bare)
          // a silent rename failure would leave a col=value directory
          // that read() later decodes as the partition VALUE
          require(fs.rename(st.getPath, t),
            s"directory-partitioning rename failed: ${st.getPath} -> $t")
          t
        }
        strip(target, level + 1)
      }
    }
    strip(new Path(path), 0)
  }

  /** Read a directory-partitioned dataset in one scan; `cols` name the
    * partition levels outside-in and come back as string columns. */
  def read(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val glob = path + "/*" * cols.length
    val base = spark.read.parquet(glob)
    // leaf file URI: .../<v_0>/<v_1>/.../<file>; value for level i sits
    // cols.length - i segments before the file name. Up to two escape
    // layers wrap the original value: hive's %XX path escaping (when
    // this module's write() produced the layout) under the URI encoding
    // of input_file_name(). url_decode is a FORM decoder ('+' → space),
    // so literal '+' is shielded before each pass; the hive layer is
    // only decoded when the segment is fully %XX-well-formed, so bare
    // layouts from external writers (stray '%' in values) pass through
    // unchanged instead of crashing. (A raw external value that *looks*
    // hive-escaped, e.g. 'a%20b', is inherently ambiguous on disk.)
    def shield(c: Column): Column = regexp_replace(c, "\\+", "%2B")
    val wellFormed = "^(?:[^%]|%[0-9A-Fa-f]{2})*$"
    def decodeHiveLayer(c: Column): Column =
      when(c.rlike(wellFormed), url_decode(shield(c))).otherwise(c)
    val segs = split(input_file_name(), "/")
    val n = size(segs)
    cols.zipWithIndex.foldLeft(base) { case (df, (c, i)) =>
      val uriDecoded = url_decode(shield(element_at(segs, n - (cols.length - i))))
      df.withColumn(c, decodeHiveLayer(uriDecoded))
    }
  }

  /** Infer the partition flavor of an existing dataset directory:
    * `=` in a child dir → "hive", nested dirs → "directory", flat
    * files → "none" (reference `timefly.py:105-112`). */
  def inferFlavor(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return "none"
    val dirs = fs.listStatus(p).filter(s =>
      s.isDirectory && !s.getPath.getName.startsWith("_"))
    if (dirs.isEmpty) "none"
    else if (dirs.exists(_.getPath.getName.contains("="))) "hive"
    else "directory"
  }
}

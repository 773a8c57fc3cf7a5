package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Row counts from parquet FOOTERS instead of count() jobs.
  *
  * A `df.count()` over parquet schedules a full scan job — cheap per
  * row, but at 100 TB it is a cluster-wide pass just to learn a number
  * the footers already record exactly. Policy knobs that only need the
  * corpus size (LSH bit widths, sampling rates, partition targets)
  * should read it as metadata: O(files) footer fetches, distributed
  * above the same 64-file threshold the stats index uses, zero data IO.
  *
  * Correctness rule: footer counts equal `count()` ONLY while the plan
  * between scan and root preserves row multiplicity. [[metadataRowCount]]
  * therefore walks the OPTIMIZED plan and answers only for
  * project/alias/sort/repartition chains over parquet relations (unions
  * sum); any filter, join, aggregate, limit, sample, or generator makes
  * it return None — callers fall back to a real count. Estimators never
  * get to be wrong, they only get to be unavailable. */
object ParquetMeta {

  /** Exact row count recorded in the footers of `files`. */
  def footerRowCount(spark: org.apache.spark.sql.SparkSession, files: Seq[String]): Long = {
    def one(f: String, conf: org.apache.hadoop.conf.Configuration): Long = {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(f), conf))
      try r.getRecordCount finally r.close()
    }
    if (files.size <= 64) {
      val conf = spark.sparkContext.hadoopConfiguration
      files.map(one(_, conf)).sum
    } else {
      val conf = new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      spark.sparkContext.parallelize(files, math.min(files.size, 256))
        .map(one(_, conf.value)).sum().toLong
    }
  }

  /** One footer pass over `files`: apply `f` to every row-group block's
    * metadata (reader lifecycle owned here — the three former inline
    * copies of this walk each had to get open/close right on their
    * own). Driver-side by design: callers are evidence probes over a
    * handful of files, not data-path scans. */
  def footerBlocks[A](spark: org.apache.spark.sql.SparkSession, files: Seq[String])(
      f: org.apache.parquet.hadoop.metadata.BlockMetaData => A): Seq[A] = {
    val conf = spark.sparkContext.hadoopConfiguration
    files.flatMap { file =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(file), conf))
      try {
        import scala.jdk.CollectionConverters._
        r.getFooter.getBlocks.asScala.toSeq.map(f)
      } finally r.close()
    }
  }

  /** The column-chunk metadata of `column` in a block (dotted path
    * match), or an error naming the column — the shared lookup under
    * every footer-stats evidence probe. */
  def blockColumn(b: org.apache.parquet.hadoop.metadata.BlockMetaData,
      column: String): org.apache.parquet.hadoop.metadata.ColumnChunkMetaData = {
    import scala.jdk.CollectionConverters._
    b.getColumns.asScala.find(_.getPath.toDotString == column).getOrElse(
      throw new IllegalStateException(s"no column chunk '$column' in footer block"))
  }

  /** Exact row count of `df` from parquet metadata alone, or None when
    * the plan can change row multiplicity (then only a real count can
    * answer). Runs zero Spark jobs below 64 files. */
  def metadataRowCount(df: DataFrame): Option[Long] = {
    val spark = df.sparkSession
    def walk(p: LogicalPlan): Option[Long] = p match {
      case Project(_, c) => walk(c)
      case SubqueryAlias(_, c) => walk(c)
      case s: Sort => walk(s.child)
      case r: RepartitionOperation => walk(r.child)
      case u: Union =>
        u.children.map(walk).reduce((a, b) => for { x <- a; y <- b } yield x + y)
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation
            if fs.fileFormat.isInstanceOf[
              org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] =>
          Some(footerRowCount(spark, fs.location.inputFiles.toSeq))
        case _ => None
      }
      case _ => None // filter/join/agg/limit/sample/generate: not row-preserving
    }
    try walk(df.queryExecution.optimizedPlan)
    catch { case scala.util.control.NonFatal(_) => None }
  }
}

package graft.ds

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Repartition pipeline (reference `dataset/repartition.py:7-194`):
  * read a dataset → rewrite it with new sort/distinct/drop/partitioning/
  * compression/format/batching. The reference guards in-place overwrite
  * by requiring a cache first (`repartition.py:72-80`); here the guard is
  * write-to-temp-then-atomic-swap, which is both safer and cluster-
  * friendly (no driver-side materialization of the whole dataset).
  */
object Repartition {

  def run(
      spark: SparkSession,
      source: GraftDataset,
      dest: GraftDataset,
      mode: WriteMode = WriteMode.Overwrite,
      batchRows: Option[Long] = None,
      timeBatch: Option[(String, String)] = None,
      deleteSource: Boolean = false): Long = {

    val inPlace = new Path(source.path).toUri.getPath == new Path(dest.path).toUri.getPath
    val df = source.df(spark)

    if (inPlace) {
      // In-place rewrite: stage into a sibling temp dir, then swap.
      val fs = source.fs(spark)
      val tmpPath = new Path(new Path(dest.path).getParent,
        s".${new Path(dest.path).getName}__repartition_tmp")
      fs.delete(tmpPath, true)
      val staged = dest.copy(path = tmpPath.toString)
      val n = DatasetWriter(staged, WriteMode.Overwrite, batchRows = batchRows,
        timeBatch = timeBatch).write(spark, df)
      DatasetWriter.swapInPlace(fs, tmpPath, new Path(dest.path))
      n
    } else {
      val n = DatasetWriter(dest, mode, batchRows = batchRows, timeBatch = timeBatch)
        .write(spark, df)
      if (deleteSource) source.fs(spark).delete(new Path(source.path), true)
      n
    }
  }
}

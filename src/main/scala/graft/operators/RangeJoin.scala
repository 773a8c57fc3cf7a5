package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: left rows with a point timestamp
  * against right rows carrying [start, end) intervals, matched within a
  * key. The naive formulation is an inequality join — Spark plans it as
  * a broadcast-nested-loop (or worse, a cartesian) and it collapses at
  * scale.
  *
  * The scalable rewrite: quantize time into fixed buckets, explode each
  * right interval over every bucket it overlaps, and equi-join on
  * (key, bucket) before re-applying the exact predicate. A matching
  * pair meets in exactly one bucket (the left point's), so no dedup
  * pass is needed; the explode factor is interval_length/bucket + 1,
  * the caller's knob. This turns the O(L·R)-per-key nested loop into a
  * hash join with candidate volume proportional to true matches.
  */
object RangeJoin {

  /** Inner-join left point rows to right interval rows on `keys` with
    * `leftTs ∈ [start, end)`. `bucket` is the quantization width
    * (e.g. `expr("INTERVAL 1 HOUR")` equivalent in seconds). */
  def pointInInterval(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String,
      start: String, end: String,
      bucketSeconds: Long): DataFrame = {

    val w = lit(bucketSeconds)
    val lb = left.withColumn("__b", floor(unix_timestamp(col(leftTs)) / w))
    val rb = right.withColumn("__b",
      explode(sequence(floor(unix_timestamp(col(start)) / w),
        floor(unix_timestamp(col(end)) / w))))
    lb.join(rb, keys :+ "__b")
      .filter(col(leftTs) >= col(start) && col(leftTs) < col(end))
      .drop("__b")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch/approximate aggregates for corpus-scale profiling.
  *
  * At 100 TB, exact `COUNT(DISTINCT x)` shuffles every distinct value;
  * the sketches below keep a constant-size state per partition and
  * merge it — one narrow shuffle of kilobyte blobs regardless of data
  * volume. All of Spark's implementations are deterministic for fixed
  * input (no RNG), so results are stable run to run:
  *
  *  - distinct counts: HyperLogLog++ (`approx_count_distinct`, default
  *    rsd 5%)
  *  - quantiles: Greenwald-Khanna (`percentile_approx`) — bounded-error
  *    rank statistics with O(accuracy) state
  *  - heavy hitters: count-based frequent items (`stat.freqItems`)
  *
  * Accuracy contracts are spec-tested against exact twins
  * (SketchesSpec); `x_sketch_stats` additionally encodes the tolerance
  * check into the driver-verified result.
  */
object Sketches {

  /** Approximate distinct count per column, one pass over `df`. */
  def approxDistinct(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    df.agg(
      approx_count_distinct(col(cols.head), rsd).as(s"${cols.head}_approx"),
      cols.tail.map(c => approx_count_distinct(col(c), rsd).as(s"${c}_approx")): _*)

  /** Bounded-error quantiles of a numeric column.
    * `accuracy` trades state size for error: rank error ≤ n/accuracy. */
  def approxQuantiles(
      df: DataFrame, c: String, qs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.agg(percentile_approx(col(c), array(qs.map(lit): _*), lit(accuracy)).as("quantiles"))

  /** Columns whose value frequency exceeds `support` (count-based
    * heavy hitters; may contain false positives, never false
    * negatives — the caller verifies with one exact pass over the
    * candidate set, same pattern as LSH-then-verify). */
  def frequentItems(df: DataFrame, cols: Seq[String], support: Double): DataFrame =
    df.stat.freqItems(cols.toArray, support)
}

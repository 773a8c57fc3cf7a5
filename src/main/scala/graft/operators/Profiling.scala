package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality report every lake maintenance
  * cycle runs before trusting a drop: per-column row/null/distinct
  * counts and min/max, computed in ONE pass over the data.
  *
  * Shape: all per-column aggregates land in a single `agg(...)` —
  * Catalyst plans one scan; the distinct counts rewrite into a single
  * Expand + two-phase aggregate (one shuffle total), every other
  * aggregate is map-side combinable alongside it. The wide 1-row
  * result then unpivots driver-free via `stack` into one row per
  * column. At 100 TB exact per-column distincts are the dominant cost
  * (the Expand multiplies scan rows by the column count);
  * `approxDistinct = true` swaps them for HyperLogLog sketches
  * (`approx_count_distinct`, map-side combinable, no Expand) — the
  * right default for monitoring, while the exact path stays the
  * oracle-comparable one.
  *
  * Numeric min/max surface as DOUBLE, string min/max as STRING, each
  * null for the other family — profiles of mixed-type tables stay one
  * uniform schema. */
object Profiling {

  def profile(
      df: DataFrame,
      numericCols: Seq[String],
      stringCols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {

    val all = numericCols ++ stringCols
    require(all.nonEmpty, "profile: no columns requested")
    val missing = all.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: no such columns: ${missing.mkString(", ")}")

    def nd(c: String) =
      if (approxDistinct) approx_count_distinct(col(c)) else count_distinct(col(c))

    val aggs = numericCols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"), nd(c).as(s"__nd_$c"),
        min(col(c)).cast("double").as(s"__mn_$c"),
        max(col(c)).cast("double").as(s"__mx_$c"))
    } ++ stringCols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"), nd(c).as(s"__nd_$c"),
        min(col(c)).as(s"__smn_$c"), max(col(c)).as(s"__smx_$c"))
    } :+ count(lit(1)).as("__rows")

    val wide = df.agg(aggs.head, aggs.tail: _*)

    // unpivot: stack(n, 'name', cnt, nd, mn, mx, smn, smx, ...) — pure
    // projection over the 1-row aggregate, no driver collect
    val numRows = numericCols.map(c =>
      s"'$c', __cnt_$c, __nd_$c, __mn_$c, __mx_$c, CAST(NULL AS STRING), CAST(NULL AS STRING)")
    val strRows = stringCols.map(c =>
      s"'$c', __cnt_$c, __nd_$c, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), __smn_$c, __smx_$c")
    val stacked = (numRows ++ strRows).mkString(", ")
    wide.select(col("__rows"), expr(
      s"stack(${all.size}, $stacked) AS (column, n_nonnull, n_distinct, min_num, max_num, min_str, max_str)"))
      .select(col("column"), col("__rows").as("n_rows"),
        (col("__rows") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_num"), col("max_num"),
        col("min_str"), col("max_str"))
  }
}

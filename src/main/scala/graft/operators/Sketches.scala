package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

  /** Exact percentiles of a numeric column, distributed. Bit-identical
    * to Spark's `percentile(c, array(qs...))` (SketchesSpec pins
    * equality on real + adversarial fixtures) but without its
    * ObjectHashAggregate: the builtin updates a per-row value→count
    * object map outside codegen and merges every partition's map on ONE
    * reducer — both the per-row constant and the serial merge measured
    * 3× the codegen floor at sf0.1 (OPTIMIZATION_r19.md). Here the
    * multiset lands as a codegen'd `groupBy(v).count()` (map-side
    * combinable), ranks come from a two-phase distributed prefix sum
    * (equal-width value buckets + broadcast cumulative offsets — the
    * x_seq_pack design with cheaper boundaries, so no single-task sort
    * at any scale), and the ≤2·|qs| bracketing rows
    * are picked by a broadcast of the |qs|-row rank table (the bounded-
    * side BNLJ shape PlanGuardSpec whitelists). State is O(distinct
    * values) either way — that bound is the builtin's too; the
    * unbounded-scale path remains [[approxQuantiles]].
    *
    * Returns one row, column `p`: array<double> in `qs` order. The
    * interpolation replicates Percentile.getPercentile exactly:
    * `pos = q·(n−1)`; equal floor/ceil → the value, else
    * `(ceil−pos)·v_floor + (pos−floor)·v_ceil`. */
  def exactPercentiles(df: DataFrame, c: String, qs: Seq[Double],
      buckets: Int = 64): DataFrame = {
    require(qs.nonEmpty, "exactPercentiles: need at least one percentage")
    val vals = df.select(col(c).cast("double").as("__v")).filter(col("__v").isNotNull)
    // persisted: the stats pass, the bucketed prefix sum and the rank
    // table all read this ~O(distinct) frame — without the pin each
    // consumer would rescan the (100 TB) base. Bench/TimeOne clear the
    // cache between reps, so nothing survives a run.
    val counts = vals.groupBy("__v").agg(count(lit(1)).as("__c")).persist()
    // one tiny stats row: n for the rank positions, min/max for the
    // bucket boundaries. Equal-width buckets are enough: ANY monotone
    // non-decreasing bucketing yields a correct prefix sum (offsets fix
    // up the totals) — unlike the sampled-percentile boundaries the
    // generic runningSum pays for, which here would re-run an
    // ObjectHashAggregate over the counts and cost more than it saves
    // (measured; skewed value ranges only unbalance the buckets, never
    // the answer, and the fallback degenerate is one window — exactly
    // the builtin's always-serial merge).
    val stats = counts.agg(sum(col("__c")).as("__n"),
      min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    val width = (col("__mx") - col("__mn")) / buckets
    val withRb = counts.crossJoin(broadcast(stats))
      .withColumn("__rb", when(col("__mx") === col("__mn"), lit(0L))
        .otherwise(least(lit(buckets - 1L),
          greatest(lit(0L), floor((col("__v") - col("__mn")) / width)))))
    val wRun = Window.partitionBy(col("__rb")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-bucket totals → cumulative offsets; ≤ `buckets` rows at any
    // scale, so the unpartitioned window is a no-op cost
    val offs = withRb.groupBy(col("__rb").as("__orb"))
      .agg(sum(col("__c")).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(
        Window.orderBy("__orb").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__orb", "__off")
    // inclusive cum count in value order → [\__lo, __cum) covers the
    // 0-indexed sorted ranks each distinct value occupies
    val cum = withRb
      .withColumn("__run", sum(col("__c")).over(wRun))
      .join(broadcast(offs), col("__rb") === col("__orb"))
      .withColumn("__cum", col("__run") + col("__off"))
      .withColumn("__lo", col("__cum") - col("__c"))
    val needs = stats
      .select(posexplode(array(qs.map(lit): _*)).as(Seq("__qi", "__q")), col("__n"))
      .withColumn("__pos", col("__q") * (col("__n") - 1).cast("double"))
      .withColumn("__l", floor(col("__pos")).cast("long"))
      .withColumn("__h", ceil(col("__pos")).cast("long"))
    val hitL = col("__lo") <= col("__l") && col("__l") < col("__cum")
    val hitH = col("__lo") <= col("__h") && col("__h") < col("__cum")
    cum.join(broadcast(needs), hitL || hitH)
      .groupBy(col("__qi"), col("__pos"), col("__l"), col("__h"))
      .agg(max(when(hitL, col("__v"))).as("__lv"),
        max(when(hitH, col("__v"))).as("__hv"))
      .withColumn("__r", when(col("__l") === col("__h"), col("__lv"))
        .otherwise((col("__h").cast("double") - col("__pos")) * col("__lv") +
          (col("__pos") - col("__l").cast("double")) * col("__hv")))
      .agg(array(qs.indices.map(i =>
        max(when(col("__qi") === i, col("__r")))): _*).as("p"))
  }
}

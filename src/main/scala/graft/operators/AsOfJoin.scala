package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the single right
  * row with the greatest `rightTs <= leftTs` within the same key —
  * the canonical point-in-time lookup (trades↔quotes, events↔latest
  * state). Spark has no native ASOF JOIN; the naive inequality join
  * explodes to O(left·right) pairs per key and then filters.
  *
  * This implementation is the scalable composition: UNION both sides
  * tagged, ONE shuffle on the key, one per-key sort by (ts, side), and
  * a running `last(right_payload, ignoreNulls)` window — every left
  * row picks up the most recent right payload in a single pass.
  * Cost is O((|L|+|R|) log) per key with no pairwise blow-up, the same
  * shape DuckDB/kdb execute natively. Right rows at exactly leftTs
  * match (ASOF >= semantics); ties among right rows on (key, ts) break
  * deterministically by the ordered payload struct.
  */
object AsOfJoin {

  /** Left rows + `right`'s payload columns (null where no right row is
    * at or before the left timestamp). Payload columns are `right`'s
    * non-key, non-ts columns, prefixed with `prefix`. */
  def asof(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      prefix: String = "asof_"): DataFrame = {

    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    val payload = struct((rightTs +: payloadCols).map(col): _*)

    val taggedRight = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"), payload.as("__p")): _*)
    val leftCols = left.columns.toSeq
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(taggedRight.schema("__p").dataType).as("__p"),
        struct(leftCols.map(col): _*).as("__l")): _*)

    // right rows sort before left rows at equal ts so ASOF >= matches;
    // __p in the order key makes multi-right-per-ts ties deterministic
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = taggedLeft
      .unionByName(taggedRight.withColumn("__l",
        lit(null).cast(taggedLeft.schema("__l").dataType)), allowMissingColumns = false)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = leftCols.map(c => col(s"__l.$c").as(c)) ++
      (rightTs +: payloadCols).map(c => col(s"__last.$c").as(s"$prefix$c"))
    joined.select(out: _*)
  }
}

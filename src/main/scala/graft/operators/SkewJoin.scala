package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins for hot keys at cluster scale.
  *
  * A shuffled join hashes rows to reducers by key; one pathological key
  * (the empty document, a null-ish user id, a viral item) puts its
  * entire volume on ONE task and the stage runs at the speed of that
  * straggler. AQE's runtime skew-join split handles moderate skew
  * transparently (our sessions leave `spark.sql.adaptive.enabled` on),
  * but planned salting is still the tool of choice when the hot keys
  * are known or the skewed side feeds a non-AQE-splittable plan shape.
  *
  * `saltedJoin` spreads each left-side key over `buckets` synthetic
  * sub-keys and replicates the (smaller) right side once per bucket:
  * the hot key's rows land on `buckets` tasks instead of one, at the
  * cost of a `buckets`× blow-up of the right side — the classic
  * replicate-and-salt rewrite. Results are bit-identical to the plain
  * join (the salt is an internal column, dropped on output).
  */
object SkewJoin {

  /** Inner-join `big` (skewed) with `small` on `keys`, spreading every
    * big-side key over `buckets` salts. `small` is replicated
    * `buckets`× via an exploded literal range — prefer single-digit
    * bucket counts unless the skew is extreme. */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      keys: Seq[String], buckets: Int): DataFrame = {

    require(buckets > 0, "buckets must be positive")
    val bigSalted = big.withColumn("__salt", saltExpr(buckets))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted.join(smallExploded, keys :+ "__salt").drop("__salt")
  }

  private def saltExpr(buckets: Int): Column =
    pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)).cast("int")

  /** Observability twin of [[saltedJoin]]: per-(key, salt) row counts of
    * the salted big side — how a hot key's volume actually spreads over
    * the `buckets` sub-keys. Cheap (map-side combinable agg); run it
    * when picking a bucket count for a known-skewed join. */
  def saltedJoinSaltCounts(big: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    big.withColumn("__salt", saltExpr(buckets))
      .groupBy(col(key), col("__salt")).count()
      .select(col(key), col("__salt").as("salt"), col("count"))
  }
}

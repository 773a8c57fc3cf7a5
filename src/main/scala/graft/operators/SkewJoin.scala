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
    * bucket counts unless the skew is extreme.
    *
    * Broadcast-eligibility fast path (`autoBroadcast`, on by default):
    * when Catalyst's size estimate says `small` fits the session's
    * `autoBroadcastJoinThreshold`, the join is emitted PLAIN — no salt,
    * and deliberately no `broadcast()` hint. The same stats make
    * JoinSelection pick a broadcast hash join on its own, and a
    * broadcast join has no key-partitioned shuffle, so there is
    * NOTHING for skew to straggle; salting there only multiplies the
    * broadcast build `buckets`×. Round-14 measurement on the j2 shape
    * (SCALE_CURVE.md): plain beats the salted rewrite 2.8× at sf1 and
    * 3.5× at sf3. The hint is omitted on purpose — forcing
    * `broadcast(small)` measured STRICTLY WORSE than letting the
    * planner decide at every scale (a forced hint overrides AQE's
    * runtime demotion; un-hinted, a wrong estimate is re-planned from
    * actual sizes, which at 1000-executor scale is the difference
    * between a re-plan and an executor OOM).
    *
    * Results are identical on either path; pass `autoBroadcast = false`
    * to pin the salted rewrite (e.g. when the estimate is known-wrong
    * and the skew is known-extreme).
    *
    * Residual risk, documented deliberately: the eligibility check
    * reads `small`'s STANDALONE optimized-plan estimate, while
    * JoinSelection sees the pruned/reordered plan inside the full
    * query — if stats drift between the two (column pruning shrinks a
    * row, join reorder changes the build side), the fast path may emit
    * a plain join that the planner then executes as a shuffled join:
    * un-salted AND un-broadcast, the exact straggler case saltedJoin
    * exists to prevent. The sessions this library builds keep AQE on,
    * whose runtime skew-split bounds that case; under AQE-off sessions
    * with known-extreme skew, pin `autoBroadcast = false`. */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      keys: Seq[String], buckets: Int,
      autoBroadcast: Boolean = true): DataFrame = {

    require(buckets > 0, "buckets must be positive")
    if (autoBroadcast && broadcastEligible(small)) return big.join(small, keys)
    val bigSalted = big.withColumn("__salt", saltExpr(buckets))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted.join(smallExploded, keys :+ "__salt").drop("__salt")
  }

  /** Catalyst's own broadcast-eligibility signal: the optimized plan's
    * size estimate against the session threshold — the SAME comparison
    * JoinSelection makes, so the fast path engages exactly when the
    * planner will pick a broadcast join for the un-salted plan (the
    * salt explosion would have inflated the estimate `buckets`× and
    * forced a shuffled join instead). Threshold ≤ 0 means broadcasting
    * is disabled → always salt. */
  private def broadcastEligible(small: DataFrame): Boolean = {
    val thr = small.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    thr > 0 && small.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(thr)
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

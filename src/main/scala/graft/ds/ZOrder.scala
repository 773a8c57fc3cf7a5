package graft.ds

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-column clustering: interleaves the bits
  * of each column's normalized bucket id so that sorting by ONE derived
  * value co-locates rows that are close in EVERY clustered dimension —
  * parquet row-group min/max stats then prune range predicates on any
  * single clustered column (and more strongly on conjunctions), which
  * plain lexicographic `clusterBy(a, b)` cannot do for `b` alone.
  *
  * No reference counterpart (pydala writes sorted tables only); this is
  * the standard lakehouse layout tool re-expressed with nothing but
  * `org.apache.spark.sql.functions` — the bucket math and the bit
  * interleave are all codegen'd column expressions, zero UDFs.
  *
  * Scale design:
  *  - Bucketing is min/max linear to 2^bits buckets: O(1) per row after
  *    ONE global agg (a single scalar collect). Heavily skewed columns
  *    should be pre-transformed (log, rank) by the caller — documented
  *    trade-off vs quantile bucketing, which would cost a full
  *    approx-quantile pass per column at 100 TB for marginal stat gains
  *    on the layouts that matter (mostly-uniform join/range keys).
  *  - [[arrange]] adds ONE range exchange on the z-value (that is the
  *    price of cross-file locality — identical to every z-order
  *    implementation) and a task-local sort; with `numPartitions` sized
  *    to the write parallelism the exchange replaces, not augments, the
  *    write's natural shuffle.
  *  - [[zValue]] alone (no exchange) still pays off within each task's
  *    files via [[DatasetWriter.withClusterBy]]-style local sorting.
  */
object ZOrder {

  /** Interleave `bits` low bits of each (long) bucket column: bit `i`
    * of column `j` lands at position `i * m + j`. Builds a pure
    * shift/and/or expression tree (m·bits terms) — whole-stage codegen
    * keeps it a tight loop, no UDF boundary. */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty, "interleave needs at least one column")
    val m = buckets.size
    require(m * bits <= 62, s"z-value overflow: $m cols x $bits bits > 62")
    val terms = for {
      (b, j) <- buckets.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * m + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Linear min-max bucket id in [0, 2^bits): `floor((v-min)/(max-min)
    * * (2^bits-1) + 0.5)`. Nulls and degenerate (min==max) columns map
    * to bucket 0 — they carry no ordering information either way.
    *
    * PRECISION BOUND: the double math quantizes integers past 2^53 —
    * near Long.MaxValue adjacent ids collapse into ulp-sized (1024)
    * clumps, so a narrow id range at huge magnitude degrades to a few
    * coarse buckets. Layout-only (the scan still applies the real
    * predicate) but wasteful for snowflake-style 63-bit keys — which
    * is why [[zValue]] routes INTEGRAL and DATE columns (via
    * unix_date — Spark forbids a direct date→numeric cast) through
    * [[bucketizeLong]] and this double path serves only
    * float/timestamp-derived columns, whose domains live well
    * inside 2^53. */
  def bucketize(v: Column, lo: Double, hi: Double, bits: Int): Column = {
    val span = hi - lo
    val maxBucket = (1L << bits) - 1
    if (span <= 0) lit(0L)
    else coalesce(
      floor((v.cast("double") - lit(lo)) / lit(span) * lit(maxBucket.toDouble) + lit(0.5))
        .cast("long"),
      lit(0L))
  }

  /** Exact integral bucketing at ANY magnitude: stepped floor division
    * `(v - lo) / step` with `step = ceil((span+1)/2^bits)`, all in long
    * arithmetic — adjacent 63-bit ids keep distinct buckets where the
    * double path would clump them (ulp(2^63) = 1024). Monotone by
    * construction and bounded: `step * 2^bits >= span+1` keeps every
    * bucket < 2^bits. When `hi-lo` itself overflows a signed long
    * (crossing most of the domain) it falls back to the double path —
    * at that span the bucket width is >= 2^51, so double rounding error
    * (<= 512) cannot move a value across a bucket boundary anyway. */
  def bucketizeLong(v: Column, lo: Long, hi: Long, bits: Int): Column = {
    val span = BigInt(hi) - BigInt(lo)
    if (span <= 0) lit(0L)
    else if (span >= BigInt(Long.MaxValue)) bucketize(v, lo.toDouble, hi.toDouble, bits)
    else {
      val step = ((span + (BigInt(1) << bits)) / (BigInt(1) << bits)).max(1).toLong
      coalesce(floor((v.cast("long") - lit(lo)) / lit(step)).cast("long"), lit(0L))
    }
  }

  /** The z-value column for `cols`, bucketed from the dataframe's own
    * min/max (ONE scalar agg job). Integral columns keep exact long
    * arithmetic end to end ([[bucketizeLong]]) so 63-bit ids bucket
    * cleanly; everything else takes the double path. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 12): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, ShortType}
    // per-column exact-long view where one exists: integrals cast
    // directly; DATE goes through unix_date (Spark forbids a direct
    // date→numeric cast) and keeps day-exact bucketing. Everything
    // else takes the double path.
    val longView: Seq[Option[Column]] = cols.map(c => df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => Some(col(c).cast("long"))
      case DateType => Some(unix_date(col(c)).cast("long"))
      case _ => None
    })
    val aggs = cols.zip(longView).flatMap { case (c, lv) =>
      val cast = lv.getOrElse(col(c).cast("double"))
      Seq(min(cast), max(cast))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      longView(i) match {
        case Some(lv) =>
          val (lo, hi) =
            (if (row.isNullAt(2 * i)) 0L else row.getLong(2 * i),
              if (row.isNullAt(2 * i + 1)) 0L else row.getLong(2 * i + 1))
          bucketizeLong(lv, lo, hi, bits)
        case None =>
          val (lo, hi) =
            (if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i),
              if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1))
          bucketize(col(c), lo, hi, bits)
      }
    }
    interleave(buckets, bits)
  }

  /** Rows arranged for a z-ordered write: ONE range exchange on the
    * z-value (cross-file locality) + task-local sort (row-group
    * locality), z column dropped. Feed the result straight to
    * [[DatasetWriter]]; the writer preserves the arrangement as long as
    * no count-batching repartition follows. */
  def arrange(df: DataFrame, cols: Seq[String], bits: Int = 12,
      numPartitions: Option[Int] = None): DataFrame = {
    val z = zValue(df, cols, bits)
    val withZ = df.withColumn("__z", z)
    val parts = numPartitions.getOrElse(df.sparkSession.sessionState.conf.numShufflePartitions)
    withZ.repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}

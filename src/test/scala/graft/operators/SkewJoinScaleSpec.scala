package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Proves the SCALE.md §2 skew story on data big enough to exhibit the
  * straggler (5M rows, ONE key owning 50% of them — the viral-item /
  * empty-document shape):
  *
  *  1. with AQE off (the non-splittable-plan scenario salting exists
  *     for), the salted join spreads the hot key over `buckets` tasks
  *     and beats the unsalted join's single straggler task wall-clock;
  *  2. salting is result-identical to the plain join;
  *  3. with AQE on and skew thresholds met, Spark's runtime skew split
  *     engages on the UNSALTED join (plan shows `skew=true`) — the
  *     transparent path our sessions rely on for moderate skew.
  */
class SkewJoinScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val N = 5000000L
  // key 0 owns every even id = 50% of rows; the rest spread over 100 keys
  private def big = spark.range(N).select(
    when($"id" % 2 === 0, 0L).otherwise(pmod(hash($"id"), lit(100)) + 1).as("k"),
    concat(lit("payload_"), lpad($"id".cast("string"), 24, "0")).as("v"))
  private def small = spark.range(101).select($"id".as("k"),
    concat(lit("dim_"), $"id").as("dv"))

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.agg(count(lit(1)).as("n"), sum(length($"v") + length($"dv")).as("bytes"))
      .collect()(0)

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Run an action and report the LARGEST per-task shuffle-read row
    * count it produced — the straggler metric. Row counts are
    * deterministic, unlike wall-clock on a shared VM. */
  private def maxShuffleReadRows[A](f: => A): (A, Long) = {
    val max = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val v = m.shuffleReadMetrics.recordsRead
          var c = max.get(); while (v > c && !max.compareAndSet(c, v)) c = max.get()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val a = f
      // listener bus is async: poll until the max is stable
      var prev = -1L; var cur = max.get(); var spins = 0
      while (cur != prev && spins < 50) { Thread.sleep(100); prev = cur; cur = max.get(); spins += 1 }
      (a, cur)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def withConf[A](kv: (String, String)*)(body: => A): A = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join spreads the hot key and beats the unsalted straggler (AQE off)") {
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // enough reducers that the unsalted stage's wall-clock IS the hot
      // key's single task, the shape this spec exists to demonstrate
      "spark.sql.shuffle.partitions" -> "16") {

      // structural: the salt really spreads key 0 over all buckets with
      // near-even volume (each bucket within 2x of perfect share)
      val buckets = 4
      val spread = SkewJoin.saltedJoinSaltCounts(big, "k", buckets)
        .filter($"k" === 0).collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
      assert(spread.keySet == (0 until buckets).toSet, spread)
      val perfect = (N / 2.0) / buckets
      assert(spread.values.forall(c => c < 2 * perfect), spread)

      // result identity + straggler size: the unsalted hot reducer must
      // read the full hot key (~N/2 rows) in ONE task; salting must cut
      // the largest task by ~buckets. Per-task row counts are exact, so
      // this asserts the wall-clock claim without depending on this
      // VM's 2-3x timing noise (timings are still reported for SCALE.md).
      val ((r1, tPlain), maxPlain) = maxShuffleReadRows(timed(agg(big.join(small, Seq("k")))))
      val ((r2, tSalt), maxSalt) =
        maxShuffleReadRows(timed(agg(SkewJoin.saltedJoin(big, small, Seq("k"), buckets))))
      assert(r1 == r2, s"salted result diverged: $r1 vs $r2")
      info(f"unsalted: $tPlain%.2f s, straggler $maxPlain rows; " +
        f"salted: $tSalt%.2f s, straggler $maxSalt rows (buckets=$buckets)")
      assert(maxPlain >= N / 2, s"expected the hot key on one task, saw $maxPlain")
      assert(maxSalt * 2 <= maxPlain / buckets * 3, // ≤1.5x perfect split
        s"salting left a straggler: $maxSalt rows vs unsalted $maxPlain / $buckets buckets")
    }
  }

  test("broadcast fast path: a broadcast-eligible dim skips salting (r14, SCALE_CURVE j2)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> (8L * 1024 * 1024).toString,
      "spark.sql.adaptive.enabled" -> "true") {
      // the dim fits the threshold → no salt column anywhere in the
      // plan, a broadcast exchange instead (no shuffle by key = no
      // skew straggler, and no buckets-x build inflation)
      val fast = SkewJoin.saltedJoin(big, small, Seq("k"), buckets = 4)
      val fastPlan = fast.queryExecution.optimizedPlan.toString
      assert(!fastPlan.contains("__salt"), s"fast path must not salt:\n${fastPlan.take(1500)}")
      assert(fast.queryExecution.sparkPlan.toString.contains("Broadcast"),
        "broadcast-eligible dim must plan a broadcast join")
      // opting out pins the salted rewrite even when broadcast-eligible
      val pinned = SkewJoin.saltedJoin(big, small, Seq("k"), buckets = 4,
        autoBroadcast = false)
      assert(pinned.queryExecution.optimizedPlan.toString.contains("__salt"),
        "autoBroadcast=false must keep the salted rewrite (salt key in the join)")
      assert(agg(fast) == agg(pinned), "both paths must agree bit-for-bit")
      // and with broadcasting disabled the fast path never engages
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val salted = SkewJoin.saltedJoin(big, small, Seq("k"), buckets = 4)
        assert(salted.queryExecution.optimizedPlan.toString.contains("__salt"),
          "threshold<=0 must take the salted rewrite")
      }
    }
  }

  test("AQE runtime skew split engages on the unsalted join") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4m") {
      val joined = big.join(small, Seq("k"))
      // drive the join's OWN query execution (an agg on top would
      // finalize a different AQE plan and leave this one unexecuted)
      joined.queryExecution.toRdd.foreach(_ => ())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not engage:\n${plan.take(2000)}")
    }
  }

  test("j2 bench shape EXECUTES as a broadcast hash join (fast path end-to-end)") {
    // The broadcast-eligibility fast path reads small's STANDALONE plan
    // stats, while JoinSelection sees the pruned plan inside the full
    // query — if the two drifted, the join would run un-salted AND
    // un-broadcast (the documented residual risk). This pins the
    // EXECUTED plan of the actual contract query: the planner must pick
    // a broadcast hash join, and no salt column may appear anywhere.
    val df = graft.SparkEntry.queries("j2_skew_join")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"j2 did not execute as a broadcast join:\n${plan.take(2500)}")
    assert(!plan.contains("__salt"),
      "fast path must emit the UN-salted join when the dim is broadcast-eligible")
  }
}

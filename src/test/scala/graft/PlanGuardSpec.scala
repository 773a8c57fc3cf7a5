package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-regression guard over the ENTIRE driver contract: every key in
  * [[SparkEntry.queries]] is built at sf0.001 and its physical plan is
  * audited, so a new query is covered the moment it is registered and a
  * plan regression (an accidental cartesian product, a lost broadcast
  * hint degrading to nested-loop, a filter that stopped reaching the
  * parquet scan) fails `sbt test` instead of surfacing as a 100×
  * slowdown at cluster scale.
  *
  * Rules:
  *  - `CartesianProduct` is never acceptable — nothing in the surface
  *    needs one (the all-pairs shapes were deliberately engineered out
  *    in favor of posting lists / prefix filters / LSH buckets).
  *  - `BroadcastNestedLoopJoin` only where a TINY broadcast side makes
  *    it the *correct* plan (centroid tables in IVF/k-means assignment,
  *    1-row scalar thresholds) — those keys are whitelisted here with
  *    the reason; everything else must join with keys.
  *  - For queries whose semantics include a selective base-table
  *    predicate, the parquet scan must carry non-empty PushedFilters —
  *    proof the filter reaches the reader, not just the plan.
  */
class PlanGuardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  /** BNLJ whitelist: key -> why a nested-loop broadcast is the intended
    * plan there (small side is O(centroids) or O(1) rows). */
  val bnljIntended: Map[String, String] = Map(
    "x_sim_ivf_topk" -> "broadcast centroid table joined lit(true) for argmin assignment (Similarity.scala assignClusters)",
    "x_sim_brute_topk" -> "broadcast probe set vs corpus — the documented brute-force baseline",
    "q11_important_parts" -> "1-row broadcast of the group-share threshold (SqlSurface.scala:793)",
    "q22_no_orders" -> "1-row broadcast of the avg-balance cutoff"
  )

  /** Queries whose defining predicate must be PUSHED to the parquet
    * scan (spot set — the semantically filter-heavy queries). */
  val mustPushFilters: Set[String] = Set(
    // x_quality_filter is deliberately absent: its gate is computed
    // from text expressions per row, so there is nothing to push
    "q6_forecast_revenue", "q14_promo_revenue", "q19_disjunctive",
    "q4_order_priority", "q12_ship_lag_priority", "q10_returned_items",
    "q3_shipping_priority")

  // Build every contract query once, reusing one session; collect the
  // formatted physical plan BEFORE any result materialization.
  lazy val plans: Map[String, String] = {
    SparkEntry.queries.map { case (name, f) =>
      val df = f(spark, dir)
      name -> df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    }
  }

  test("no contract query plans a CartesianProduct") {
    val bad = plans.filter(_._2.contains("CartesianProduct")).keys.toSeq.sorted
    assert(bad.isEmpty, s"cartesian product in: ${bad.mkString(", ")}")
  }

  test("BroadcastNestedLoopJoin only where a tiny broadcast side is intended") {
    val bad = plans
      .filter { case (k, p) => p.contains("BroadcastNestedLoopJoin") && !bnljIntended.contains(k) }
      .keys.toSeq.sorted
    assert(bad.isEmpty, s"unexpected nested-loop join in: ${bad.mkString(", ")}")
  }

  test("whitelisted BNLJ queries still use it (whitelist stays honest)") {
    // a whitelist entry whose query no longer needs it should be removed,
    // not silently kept as a hole for future regressions
    val stale = bnljIntended.keys.filterNot(k =>
      plans.get(k).exists(_.contains("BroadcastNestedLoopJoin"))).toSeq.sorted
    assert(stale.isEmpty, s"stale whitelist entries: ${stale.mkString(", ")}")
  }

  test("filter-defined queries push predicates into the parquet scan") {
    val pushed = raw"PushedFilters: \[(?!\])".r // non-empty bracket list
    val bad = mustPushFilters.filter { k =>
      val p = plans.getOrElse(k, fail(s"$k not in SparkEntry.queries"))
      pushed.findFirstIn(p).isEmpty
    }.toSeq.sorted
    assert(bad.isEmpty, s"no pushed filters reach the scan in: ${bad.mkString(", ")}")
  }
}

package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.functions.TextFunctions

/** The scale rehearsal (SCALE_CURVE.md) is only as honest as its
  * fixture generator: every slope claim assumes the k× replicas add
  * data WITHOUT changing the workload's shape. Those invariants were
  * argued in GenScale's scaladoc but never executed — this spec
  * generates a real k=3 fixture from the sf0.001 tables and proves
  * each one:
  *
  *  - replica cardinality (k× for scaled tables, 1× for fixed dims)
  *  - cross-replica token vocabularies are DISJOINT (no manufactured
  *    near-dup pairs), while within-replica token structure is a
  *    bijective image of the source (per-doc token counts preserved)
  *  - supplier-name tags keep cross-replica edit distance above any
  *    small fuzzy-join threshold, and preserve within-replica
  *    distances exactly
  *  - the ±1 sign-flip is a dot-product ISOMETRY: within-replica
  *    pairwise dot products are bit-identical to the source corpus
  *  - the provenance marker is written last and matches what Bench's
  *    standing-sf1 reuse check expects
  */
class GenScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val src = "/root/testdata/sf0.001"
  private val k = 3
  // generated once for the suite; target/ keeps it out of git and a
  // re-run overwrites, so no cleanup hook is needed
  private lazy val out: String = {
    val dir = "target/genscale-spec/sf3x"
    GenScale.generate(spark, src, dir, k)
    dir
  }
  private def t(table: String) = graft.Tables.load(spark, out, table)
  private def s(table: String) = graft.Tables.load(spark, src, table)

  test("replica cardinality: kx for scaled tables, fixed dims copied once") {
    for (table <- Seq("documents", "embeddings", "orders", "customer",
        "events", "lineitem", "part", "supplier"))
      assert(t(table).count() == k * s(table).count(), s"table $table")
    for (table <- Seq("region", "nation"))
      assert(t(table).count() == s(table).count(), s"fixed dim $table")
  }

  test("document replicas: disjoint vocabularies, bijective token structure") {
    val stride = 30000000L
    val toks = t("documents")
      .select((col("doc_id") / stride).cast("long").as("r"),
        col("doc_id"), explode(TextFunctions.words(col("text"))).as("w"))
    // cross-replica vocab overlap would manufacture near-dup pairs the
    // source corpus doesn't have — the dup fraction must stay sf's
    val overlap = toks.select(col("r"), col("w")).distinct()
      .groupBy("w").agg(countDistinct(col("r")).as("nr"))
      .filter(col("nr") > 1).count()
    assert(overlap == 0, s"$overlap tokens shared across replicas")
    // bijection ⇒ per-document token counts are preserved exactly
    val srcCounts = s("documents")
      .select(col("doc_id"), size(TextFunctions.words(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val repCounts = t("documents")
      .select(col("doc_id"), size(TextFunctions.words(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(repCounts.size == k * srcCounts.size)
    for ((id, n) <- repCounts)
      assert(n == srcCounts(id % stride), s"doc $id token count drifted")
  }

  test("supplier tags: within-replica distances exact, cross-replica above threshold") {
    val stride = 30000000L
    val names = t("supplier")
      .select((col("s_suppkey") / stride).cast("long").as("r"),
        (col("s_suppkey") % stride).as("base"), col("s_name"))
      .collect().map(row => (row.getLong(0), row.getLong(1)) -> row.getString(2)).toMap
    val bases = names.keys.map(_._2).toSeq.distinct.sorted.take(5)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // a replica image of a name stays close to ITS OWN replica-mates
    // exactly as in the source, and far from every other replica's
    // image of the same name (no true cross-replica fuzzy matches)
    for (b1 <- bases; b2 <- bases if b1 < b2; r <- 0L until k.toLong)
      assert(lev(names((r, b1)), names((r, b2))) == lev(names((0L, b1)), names((0L, b2))),
        s"within-replica distance drifted for ($b1, $b2) in replica $r")
    for (b <- bases; r1 <- 0L until k.toLong; r2 <- 0L until k.toLong if r1 < r2)
      assert(lev(names((r1, b)), names((r2, b))) >= 3,
        s"cross-replica images of supplier $b are fuzzy-join-close")
  }

  test("embedding sign-flips are a bit-exact dot-product isometry") {
    val stride = 30000000L
    def dots(df: org.apache.spark.sql.DataFrame, keyMod: Boolean) = {
      val vecs = df.select(
          (if (keyMod) col("vec_id") % stride else col("vec_id")).as("id"),
          col("embedding"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val ids = vecs.keys.toSeq.sorted.take(6)
      for (a <- ids; b <- ids if a < b) yield {
        // float accumulation in index order on both sides: (s⊙x)·(s⊙y)
        // = Σ s²xy = x·y term-for-term, so equality is EXACT, not ≈
        var acc = 0.0f
        val (va, vb) = (vecs(a), vecs(b))
        var i = 0
        while (i < va.length) { acc += va(i) * vb(i); i += 1 }
        (a, b) -> acc
      }
    }
    val srcDots = dots(s("embeddings"), keyMod = false).toMap
    for (r <- 1 until k) {
      val lo = r * stride; val hi = lo + stride
      val rep = dots(t("embeddings").filter(col("vec_id") >= lo && col("vec_id") < hi),
        keyMod = true).toMap
      assert(rep == srcDots, s"replica $r pairwise dot products drifted")
    }
  }

  test("supplierTag: injective to the k cap, pairwise distance >= 3, historic-compatible") {
    // the r14 cap lift (k <= 1+35+35*35, enabling the sf10/sf100
    // fixtures) rests on supplierTag keeping every pair of DISTINCT
    // tags >= 3 apart so no cross-replica fuzzy-join pair is ever
    // manufactured; prove it rather than argue it
    val cap = 1 + 35 + 35 * 35
    val tags = (1 until cap).map(GenScale.supplierTag)
    assert(tags.toSet.size == tags.size, "tags must be pairwise distinct")
    // first 35 are byte-identical to the historic one-symbol tags, so
    // fixtures generated before the cap lift stay valid
    val syms = "123456789abcdefghijklmnopqrstuvwxyz"
    for (r <- 1 to 35)
      assert(GenScale.supplierTag(r) == "~" + syms(r - 1).toString * 3)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // boundary-heavy sample: one-symbol tags, the 35/36 seam where the
    // two-symbol encoding starts, second-digit rollovers, and the cap
    val sample = ((1 to 40) ++ Seq(69, 70, 71, 105, 106, 700, 1259, cap - 1))
      .map(r => r -> GenScale.supplierTag(r))
    for ((r1, t1) <- sample; (r2, t2) <- sample if r1 < r2)
      assert(lev(t1, t2) >= 3, s"tags for replicas $r1 ($t1) and $r2 ($t2) too close")
    // vs the untagged r=0 the distance is the whole tag length
    assert(sample.forall(_._2.length >= 4))
  }

  test("provenance marker is written and matches Bench's reuse check") {
    out // force generation
    val p = java.nio.file.Paths.get(out, "_genscale.json")
    assert(java.nio.file.Files.exists(p))
    assert(new String(java.nio.file.Files.readAllBytes(p), "UTF-8") ==
      GenScale.marker(src, k))
  }
}

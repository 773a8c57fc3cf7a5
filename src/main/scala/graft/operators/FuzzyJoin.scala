package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string (edit-distance) join — the entity-resolution
  * primitive: match noisy keys (typo'd names, OCR'd ids, hand-entered
  * codes) against a reference table without an O(n·m) cross product.
  * The reference (pydala) has no fuzzy-match surface; this is
  * extension scope for data curation at scale.
  *
  * Candidate generation routes per string LENGTH, because the two known
  * blocking schemes fail in opposite regimes:
  *
  * **Deletion neighborhoods** (FastSS / SymSpell's symmetric delete,
  * public algorithm): index every string under every variant reachable
  * by deleting ≤ d characters. Two strings within edit distance d
  * always share such a variant (align them by ≤ d edits; deleting the
  * edited positions from each side reaches a common subsequence), so
  * bucket-joining variant keys is COMPLETE, and false bucket-mates are
  * killed by the exact verify. Crucially, bucket sizes track the TRUE
  * near-match rate: on a near-uniform corpus (`Supplier#000000123`,
  * serial ids, fixed-format codes) where every q-gram posting list
  * grows linearly with the corpus — the regime where gram filtering
  * degrades to quadratic candidates (the round-9 scale rehearsal
  * measured exactly that: 18× wall time at a 10× corpus) — deletion
  * buckets stay as small as the answer itself. Variants never shuffle
  * as strings: each is folded to xxhash64 on the spot, so the exchange
  * carries (hash, id) longs; a 64-bit collision only ADDS a candidate
  * pair, which the verify removes. The variant count is Σ_{i≤d}
  * C(len,i), so this route takes strings short enough to stay under
  * `variantCap` variants AND under `maxKeyLen` chars (default 64 —
  * the entity-key regime; building the variants is O(len²) transient
  * bytes per row, so kilobyte strings belong to the gram route).
  *
  * **q-gram count filtering** (Gravano et al., VLDB'01 "Approximate
  * String Joins in a Database (Almost) for Free") for strings past the
  * variant cap: an edit touches at most q character q-grams, so any
  * string within distance d of probe p shares at least one of ANY
  * d·q+1 of p's distinct q-grams. The corpus indexes its q-grams
  * (posting lists); each probe explodes only its d·q+1 globally-RAREST
  * q-grams (df-ranked, absent-from-corpus rarest of all) — prefix
  * filtering applied asymmetrically, so probe fan-out is constant and
  * candidates concentrate on the shortest posting lists. Long natural
  * strings have heavy-tailed gram statistics, which is exactly where
  * this filter is selective. Gram-route probes with fewer than d·q+1
  * distinct grams (pathologically repetitive) bypass the filter and
  * join on exact LENGTH keys instead (a true match lies within d
  * length units — 2d+1 buckets per probe).
  *
  * The split is completeness-preserving because edit distance bounds
  * length distance: a deletion-route probe (len ≤ L−d) can only match
  * corpus strings of len ≤ L, all of which are in the deletion index;
  * a gram-route probe (len > L−d) can only match len > L−2d, all of
  * which are in the gram index. Probe routes partition the probe set,
  * so the union of routes is already pair-distinct. Exact
  * `levenshtein` verifies every candidate pair from every route.
  *
  * Scale shape: deletion route shuffles (hash, id) longs with
  * answer-sized buckets; gram df is a partial-combine aggregate; gram
  * candidates carry (gram, id) postings, never string pairs; pair
  * dedup is a combinable distinct on two longs; only deduped candidate
  * pairs re-join their strings for the verify.
  */
object FuzzyJoin {

  /** Largest length whose ≤`d`-deletion variant count Σ_{i≤d} C(len,i)
    * stays within `cap` — the deletion-route admission threshold.
    *
    * The search starts at len = 0 and VALIDATES every step (r9 review
    * fix): the old form started at len = d unchecked, so for d ≥ 13 at
    * the default cap (where Σ_{i≤d} C(d,i) = 2^d already exceeds 4096)
    * it admitted strings generating more variants per row than the cap
    * promised. The running binomial is also guarded against Long
    * overflow before each multiply AND each add (a cap above
    * Long.MaxValue/2 keeps the `sum > cap` early-exit from firing, so
    * the accumulator itself can wrap) — a huge caller-supplied cap
    * must saturate, not wrap negative and admit everything. */
  private[operators] def deletionMaxLen(d: Int, cap: Long): Int = {
    // Long.MaxValue doubles as the "count overflowed / exceeded"
    // sentinel below; a cap of exactly Long.MaxValue would let the
    // sentinel itself pass `<= cap` and admit every length. Clamp —
    // the practical admission contract is unchanged.
    val c = math.min(cap, Long.MaxValue - 1)
    def variants(len: Int): Long = {
      var sum = 1L; var term = 1L
      for (i <- 1 to math.min(d, len)) {
        val f = len - i + 1
        if (term > Long.MaxValue / f) return Long.MaxValue // multiply would wrap
        term = term * f / i
        if (sum > Long.MaxValue - term) return Long.MaxValue // add would wrap
        sum += term
        if (sum > c) return Long.MaxValue
      }
      sum
    }
    if (d == 0) return Int.MaxValue / 4 // one variant (the string itself)
    var len = 0
    while (len < (1 << 20) && variants(len + 1) <= c) len += 1
    len
  }

  /** `array<bigint>` of xxhash64 over every ≤`d`-deletion variant of
    * `s` (the string itself included). Variants exist only transiently
    * inside the expression — only their hashes reach the plan. */
  private def variantHashes(s: String, d: Int): Column = {
    val del1 = (vs: String) =>
      s"""array_distinct(flatten(transform($vs, v ->
         |  transform(sequence(1, greatest(length(v), 1)), i ->
         |    concat(substring(v, 1, i - 1), substring(v, i + 1))))))""".stripMargin
    var vs = s"array($s)"
    for (_ <- 1 to d) vs = s"array_distinct(concat($vs, ${del1(vs)}))"
    expr(s"transform($vs, v -> xxhash64(v))")
  }

  /** All corpus rows within `maxDist` edits of each probe row.
    * Returns (probe_id, corpus_id, dist). Id columns must be numeric
    * (they ride the shuffles); strings join back only for the verify.
    *
    * The deletion route admits strings up to
    * min(len allowed by `variantCap`, `maxKeyLen`): the cap bounds the
    * variant COUNT (binding at d ≥ 2), while `maxKeyLen` bounds the
    * variant BYTES — building len variants of ~len chars is O(len²)
    * transient per row, which is the entity-key regime's rounding
    * error at tens of chars but ~1000× the gram route's CPU on
    * kilobyte natural-text strings, exactly where gram statistics are
    * heavy-tailed and prefix filtering is selective anyway. */
  def editDistanceJoin(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, strCol: String,
      maxDist: Int, q: Int = 3, variantCap: Long = 4096,
      maxKeyLen: Int = 64): DataFrame = {

    require(maxDist >= 0 && q >= 1 && variantCap >= 1 && maxKeyLen >= 1,
      "editDistanceJoin: bad knobs")
    val prefixLen = maxDist * q + 1
    val delMax = math.min(deletionMaxLen(maxDist, variantCap), maxKeyLen)

    val c = corpus.select(col(idCol).as("corpus_id"), col(strCol).as("cs"))
    val p = probes.select(col(idCol).as("probe_id"), col(strCol).as("ps"))

    // ---- deletion route: len(probe) ≤ delMax−d, len(corpus) ≤ delMax
    val corpusDel = c.filter(length(col("cs")) <= delMax)
      .select(col("corpus_id"), explode(variantHashes("cs", maxDist)).as("vh"))
    val probeDel = p.filter(length(col("ps")) <= delMax - maxDist)
      .select(col("probe_id"), explode(variantHashes("ps", maxDist)).as("vh"))
    val delCandidates = probeDel.join(corpusDel, Seq("vh"))
      .select("probe_id", "corpus_id").distinct()

    // ---- gram route: the complement, complete for its length band
    val cg = c.filter(length(col("cs")) > delMax - 2 * maxDist)
    val pg = p.filter(length(col("ps")) > delMax - maxDist)

    // sliding character q-grams as a DISTINCT set; strings shorter
    // than q yield themselves (one gram)
    def gramsExpr(colName: String) = expr(
      s"array_distinct(transform(sequence(1, greatest(length($colName) - ${q - 1}, 1)), i -> substring($colName, i, $q)))")

    // pinned (lazy localCheckpoint, same as the Dedup pipelines): the
    // corpus explode feeds BOTH the df count and the candidate join,
    // and the probe explode feeds the ranked prefix and the degenerate
    // filter — without pinning, the dominant scan+explode runs twice
    val corpusGrams = cg.select(col("corpus_id"),
      explode(gramsExpr("cs")).as("g"))
      .localCheckpoint(false)
    val probeGrams = pg.select(col("probe_id"),
      explode(gramsExpr("ps")).as("g"),
      size(gramsExpr("ps")).as("ng"))
      .localCheckpoint(false)

    // corpus document frequency per gram — the global rarity order
    val dfreq = corpusGrams.groupBy("g")
      .agg(count(lit(1)).as("df"))

    val ranked = probeGrams
      .join(dfreq, Seq("g"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("probe_id").orderBy(col("df"), col("g"))))

    val normalProbeGrams = ranked
      .filter(col("ng") >= prefixLen && col("__rk") <= prefixLen)
      .select("probe_id", "g")

    val gramCandidates = normalProbeGrams
      .join(corpusGrams, Seq("g"))
      .select("probe_id", "corpus_id").distinct()

    // degenerate gram-route probes: too few distinct grams for the
    // count filter — probe the 2·maxDist+1 exact length keys a match
    // could have (its matches also sit in the gram length band)
    val degenerate = probeGrams.filter(col("ng") < prefixLen)
      .select("probe_id").distinct()
      .join(p, Seq("probe_id"))
    val lengthCandidates = degenerate
      .select(col("probe_id"),
        explode(sequence(length(col("ps")) - maxDist,
          length(col("ps")) + maxDist)).as("len"))
      .join(cg.withColumn("len", length(col("cs"))), Seq("len"))
      .select("probe_id", "corpus_id").distinct()

    // probe routes partition the probe set (deletion len band, then
    // ng >= prefixLen vs <), so the union is already pair-distinct —
    // no extra dedup shuffle
    delCandidates
      .unionByName(gramCandidates)
      .unionByName(lengthCandidates)
      .join(p, Seq("probe_id"))
      .join(c, Seq("corpus_id"))
      .withColumn("dist", levenshtein(col("ps"), col("cs")))
      .filter(col("dist") <= maxDist)
      .select(col("probe_id"), col("corpus_id"), col("dist"))
  }
}

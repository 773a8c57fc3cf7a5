package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate string (edit-distance) join — the entity-resolution
  * primitive: match noisy keys (typo'd names, OCR'd ids, hand-entered
  * codes) against a reference table without an O(n·m) cross product.
  * The reference (pydala) has no fuzzy-match surface; this is
  * extension scope for data curation at scale.
  *
  * Candidate generation is q-gram count filtering (Gravano et al.,
  * VLDB'01 "Approximate String Joins in a Database (Almost) for
  * Free"): an edit touches at most q character q-grams, so any string
  * within distance d of probe p shares at least one of ANY d·q+1 of
  * p's distinct q-grams. The corpus indexes ALL its q-grams (posting
  * lists); each probe explodes only its d·q+1 globally-RAREST q-grams
  * (df-ranked against the corpus, absent-from-corpus rarest of all) —
  * the prefix-filtering idea from the ssjoin literature applied
  * asymmetrically, so probe fan-out is constant and candidates
  * concentrate on the shortest posting lists. Exact `levenshtein`
  * verifies every candidate pair.
  *
  * Probes with fewer than d·q+1 distinct q-grams ("degenerate":
  * shorter than ~q·(d+1) chars or highly repetitive) could lose every
  * gram to adversarial edits, so they bypass the q-gram filter and
  * join the corpus on exact LENGTH keys instead — a true match lies
  * within d length units, so each such probe probes 2d+1 length
  * buckets. Both routes end at the same verify; the union is COMPLETE
  * for the threshold by construction.
  *
  * Scale shape: gram df is a partial-combine aggregate; the candidate
  * join carries (gram, id) postings, never string pairs; pair dedup is
  * a combinable distinct on two longs; only deduped candidate pairs
  * re-join their strings for the verify. The degenerate route joins on
  * exact length keys — O(rows-per-length), no range scan.
  */
object FuzzyJoin {

  /** All corpus rows within `maxDist` edits of each probe row.
    * Returns (probe_id, corpus_id, dist). Id columns must be numeric
    * (they ride the shuffles); strings join back only for the verify. */
  def editDistanceJoin(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, strCol: String,
      maxDist: Int, q: Int = 3): DataFrame = {

    require(maxDist >= 0 && q >= 1, "editDistanceJoin: bad knobs")
    val prefixLen = maxDist * q + 1

    val c = corpus.select(col(idCol).as("corpus_id"), col(strCol).as("cs"))
    val p = probes.select(col(idCol).as("probe_id"), col(strCol).as("ps"))

    // sliding character q-grams as a DISTINCT set; strings shorter
    // than q yield themselves (one gram)
    def gramsExpr(colName: String) = expr(
      s"array_distinct(transform(sequence(1, greatest(length($colName) - ${q - 1}, 1)), i -> substring($colName, i, $q)))")

    // pinned (lazy localCheckpoint, same as the Dedup pipelines): the
    // corpus explode feeds BOTH the df count and the candidate join,
    // and the probe explode feeds the ranked prefix and the degenerate
    // filter — without pinning, the dominant scan+explode runs twice
    val corpusGrams = c.select(col("corpus_id"),
      explode(gramsExpr("cs")).as("g"))
      .localCheckpoint(false)
    val probeGrams = p.select(col("probe_id"),
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

    // degenerate probes: too few distinct grams for the count filter —
    // probe the 2·maxDist+1 exact length keys a match could have
    // (probe ids come off the pinned gram frame; strings re-join by id)
    val degenerate = probeGrams.filter(col("ng") < prefixLen)
      .select("probe_id").distinct()
      .join(p, Seq("probe_id"))
    val lengthCandidates = degenerate
      .select(col("probe_id"),
        explode(sequence(length(col("ps")) - maxDist,
          length(col("ps")) + maxDist)).as("len"))
      .join(c.withColumn("len", length(col("cs"))), Seq("len"))
      .select("probe_id", "corpus_id").distinct()

    // the two routes partition the probe set (ng >= prefixLen vs <),
    // so the union is already pair-distinct — no third dedup shuffle
    gramCandidates.unionByName(lengthCandidates)
      .join(p, Seq("probe_id"))
      .join(c, Seq("corpus_id"))
      .withColumn("dist", levenshtein(col("ps"), col("cs")))
      .filter(col("dist") <= maxDist)
      .select(col("probe_id"), col("corpus_id"), col("dist"))
  }
}

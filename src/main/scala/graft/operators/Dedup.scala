package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines, each designed
  * around Spark's shuffle model:
  *
  *  - exact: one hash-shuffle on the fingerprint (map-side combinable).
  *  - n-gram Jaccard: exact pairwise via a shingle inverted index —
  *    candidates must share a shingle, so the join only materializes
  *    plausible pairs; high-document-frequency shingles are pruned to
  *    keep the explode bounded (a stopword shingle would otherwise
  *    create O(n²) candidates at 100 TB).
  *  - MinHash+LSH: constant-size signatures (k hashes) + banded bucket
  *    join — the scale path: cost is O(n·bands) shuffle rows, never
  *    pairwise. Candidates are verified with exact Jaccard.
  *  - SimHash: 64-bit signature, banded on 16-bit chunks (any pair
  *    within Hamming distance 3 of each other shares a chunk by
  *    pigeonhole; wider radii need more/narrower chunks).
  *  - embedding cosine: see Similarity.scala.
  */
object Dedup {

  /** Exact dedup on a canonical fingerprint: keep the lowest-id doc per
    * fingerprint group. Single shuffle on the (small) hash key. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    df.withColumn("__fp", fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__fp")
  }

  /** Exact word-n-gram Jaccard near-dup pairs via shingle inverted
    * index. Returns (id_a, id_b, jaccard) with id_a < id_b.
    * `maxShingleDf` prunes shingles appearing in more than that many
    * docs from candidate generation (they cannot be discriminative);
    * exactness is preserved as long as true near-dups share at least
    * one rare shingle, which holds at jaccard thresholds ≥ ~0.2. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      maxShingleDf: Option[Int] = None): DataFrame = {

    // The shingle table is the reuse point of the whole pipeline (posting
    // list, both sides of the candidate join, both verify joins) — cache
    // it once instead of re-shingling the corpus five times. Size is
    // O(corpus tokens), the same order as the input text.
    val docs = df.select(col(idCol).as("id"), shingleSet(col(textCol), n).as("sh")).cache()
    val posting = docs.select(col("id"), explode(col("sh")).as("s"))
    val pruned = maxShingleDf match {
      case Some(cap) =>
        val rare = posting.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= cap)
        posting.join(rare.select("s"), Seq("s"))
      case None => posting
    }
    val cands = pruned.as("a").join(pruned.as("b"), Seq("s"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    jaccardVerify(cands, docs, threshold)
  }

  /** MinHash + LSH near-dup pairs: k-hash signatures, `bands` bands of
    * k/bands rows; docs sharing any band bucket become candidates and
    * are verified with exact Jaccard. Output matches ngramJaccardPairs
    * whenever LSH recall reaches the planted pairs (k=32, bands=8 →
    * P(miss | j=0.9) < 1e-4). */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {

    val r = k / bands
    val docs = df.select(col(idCol).as("id"), shingleSet(col(textCol), n).as("sh")).cache()
    // Signatures are tiny (id + k longs) and feed both sides of the
    // bucket self-join — materialize once.
    val sigs = docs.select(col("id"), bandKeys(minhashSignature(col("sh"), k), bands, r).as("bk")).cache()
    val buckets = sigs.select(col("id"), posexplode(col("bk")).as(Seq("band", "key")))
    val cands = buckets.as("a").join(buckets.as("b"), Seq("band", "key"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    jaccardVerify(cands, docs, threshold)
  }

  /** Exact Jaccard verification of candidate pairs by re-joining the
    * shingle sets by id (signatures/arrays never ride the wide shuffle).
    * Shingle sets arrive sorted (WordShingles), so |A∩B| is a compiled
    * merge pass and |A∪B| = |A|+|B|−|A∩B| — no per-pair hash sets. */
  private def jaccardVerify(cands: DataFrame, docs: DataFrame, threshold: Double): DataFrame = {
    val spark = docs.sparkSession
    cands
      .join(docs.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(docs.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("__inter",
        graft.plans.GraftExpressions.intersectCount(spark, col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("__inter").cast("double") / (size(col("sh_a")) + size(col("sh_b")) - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dup pairs within a Hamming radius. Banded on 4×16-bit
    * chunks of the 64-bit signature (exact for radius ≤ 3; candidates
    * beyond that are still verified, just possibly incomplete). */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {

    val sigs = df.select(col(idCol).as("id"), simhash64(tokens(col(textCol))).as("sig")).cache()
    val chunks = sigs.select(col("id"), col("sig"), posexplode(
      array((0 until 4).map(c =>
        call_function("shiftright", col("sig"), lit(c * 16)).bitwiseAND(lit(0xFFFFL))): _*))
      .as(Seq("chunk", "key")))
    chunks.as("a").join(chunks.as("b"), Seq("chunk", "key"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}

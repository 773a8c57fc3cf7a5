package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators a large-scale training pipeline needs
  * between dedup and tokenization: deterministic splits, stratified
  * sampling, eval-set contamination checks, and token-budget packing.
  * No reference analog (pydala stops at storage); these compose the
  * engine's existing primitives and follow its scale rules — hash-
  * derived keys instead of RNG state (reproducible on any cluster
  * size), windows only over per-stratum partitions, shingle joins
  * instead of pairwise comparisons.
  */
object Sampling {

  /** Content-hash split: a row's split is a pure function of its text
    * (md5-hex prefix order), so the assignment is reproducible across
    * engines/runs/cluster sizes and survives re-partitioning — the
    * property RNG-based `randomSplit` lacks. `valThreshold` is a hex
    * prefix: "1a" ≈ 0x1a/0x100 ≈ 10.2% of uniformly-hashed rows. */
  def hashSplit(df: DataFrame, textCol: String,
      valThreshold: String = "1a"): DataFrame =
    df.withColumn("split",
      when(md5(col(textCol).cast("binary")) < valThreshold, "val")
        .otherwise("train"))

  /** Exact per-stratum fraction sample, deterministically: rank rows
    * inside each stratum by content hash and keep the first
    * ⌈fraction·n⌉. One shuffle on the stratum key; the per-stratum sort
    * is the price of exactness (the approximate alternative is
    * [[hashSplit]] with a tuned threshold, no sort). */
  def stratifiedSample(df: DataFrame, strataCol: String, textCol: String,
      idCol: String, fraction: Double): DataFrame = {
    val wr = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(textCol).cast("binary")), col(idCol))
    val wn = Window.partitionBy(col(strataCol))
    df.withColumn("__rn", row_number().over(wr))
      .withColumn("__n", count(lit(1)).over(wn))
      .filter(col("__rn") <= ceil(col("__n") * fraction))
      .drop("__rn", "__n")
  }

  /** Token-budget packing: assign each document (in deterministic
    * `orderCol` order within a stratum) to the context-window bin its
    * running token count starts in — the streaming-friendly
    * approximation of first-fit packing (no bin ever exceeds budget +
    * one document). Running sum = one window per stratum, no global
    * sort. */
  def packBudget(df: DataFrame, strataCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("bin", floor((col("__cum") - col(tokensCol)) / budget))
      .drop("__cum")
  }

  /** Weighted source mixing with per-source caps — the
    * corpus-composition step of a training pipeline ("30% web, 20%
    * code, …"): given target `weights` per source and a `totalRows`
    * budget, keep per source the first min(⌈wᵢ/Σw · total⌉, nᵢ) rows in
    * content-hash order. Deterministic (hash-ranked like
    * [[stratifiedSample]], zero RNG state), no replacement — a source
    * short of its target yields what it has (the standard cap;
    * re-normalizing the shortfall across surplus sources is the
    * caller's loop, policy not mechanism). Sources absent from
    * `weights` are dropped. One shuffle on the source key; weights ride
    * a literal map (tiny by construction — sources are a hand-curated
    * list, never data-scale). */
  def mixSources(df: DataFrame, sourceCol: String, textCol: String,
      idCol: String, weights: Map[String, Double], totalRows: Long): DataFrame = {
    require(weights.nonEmpty && weights.valuesIterator.forall(_ >= 0)
      && weights.valuesIterator.sum > 0, "mixSources: weights must be non-negative, sum > 0")
    val sumW = weights.valuesIterator.sum
    val wr = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(textCol).cast("binary")), col(idCol))
    df.withColumn("__w", element_at(typedLit(weights), col(sourceCol)))
      .filter(col("__w").isNotNull)
      .withColumn("__target", ceil(col("__w") / sumW * totalRows))
      .withColumn("__rn", row_number().over(wr))
      .filter(col("__rn") <= col("__target"))
      .drop("__w", "__target", "__rn")
  }

  /** Eval-set contamination: corpus documents sharing ANY word n-gram
    * with a test document. The join carries exploded shingles, not
    * document pairs — candidate volume is O(postings), never O(n²);
    * the distinct test-shingle set is the broadcast side at real
    * scale. Returns the contaminated corpus rows (distinct). */
  def contaminated(corpus: DataFrame, test: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val sh = graft.functions.TextFunctions.shingleSet(col(textCol), n)
    val testShingles = test.select(explode(sh).as("__s")).distinct()
    corpus.withColumn("__s", explode(sh))
      .join(testShingles, Seq("__s"), "left_semi")
      .drop("__s")
      .dropDuplicates(idCol)
  }
}

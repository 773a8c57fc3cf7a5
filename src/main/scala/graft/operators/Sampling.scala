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

  /** Exact per-stratum fraction sample, deterministically: keep, per
    * stratum, the first ⌈fraction·n⌉ rows in (md5(text), id) order —
    * identical row selection to a per-stratum `row_number` window, but
    * computed by DISTRIBUTED THRESHOLD SELECTION ([[keepRankedPrefix]])
    * instead: a stratum is corpus-scale in real pipelines (one web
    * source can be 90% of 100 TB), so sorting whole strata in
    * single-reducer windows — with the row payload riding the
    * exchange — is the shape the round-9 scale rehearsal flagged
    * (8× wall at a 10× corpus). Here the bulk of the sample needs NO
    * data shuffle at all. */
  def stratifiedSample(df: DataFrame, strataCol: String, textCol: String,
      idCol: String, fraction: Double): DataFrame =
    keepRankedPrefix(df, strataCol, textCol, idCol,
      (_, n) => ceil(n * fraction))

  /** Token-budget packing: assign each document (in deterministic
    * `orderCol` order within a stratum) to the context-window bin its
    * running token count starts in — the streaming-friendly
    * approximation of first-fit packing (no bin ever exceeds budget +
    * one document).
    *
    * The running sum is a TWO-PHASE distributed prefix sum, not a
    * per-stratum window: a naked
    * `sum over (partition by stratum order by ...)` funnels the whole
    * stratum — payload included — through one task (the catch-3 shape
    * from SCALE_CURVE.md; one web source can be 90% of the corpus).
    * Instead, numeric/timestamp order keys are range-bucketed by
    * per-stratum equal-width (min/max) boundaries — bucketing needs
    * only ORDER-CONSISTENCY (monotone in the key), not balance, so a
    * skewed key distribution shifts work between buckets but never
    * changes any row's cumulative sum — the running sum runs at
    * (strata × `buckets`) parallelism, and each bucket adds a
    * broadcast offset (cumulative bucket totals, computed by a window
    * over the tiny per-(stratum, bucket) aggregate). Output is
    * identical to the window formulation (property-pinned), including
    * nulls-first order-key handling. Non-range-partitionable order-key
    * types (strings…) keep the window path — documented single-task-
    * per-stratum semantics there. `orderCol` must be unique per
    * stratum for a deterministic cum (same contract as the window). */
  def packBudget(df: DataFrame, strataCol: String, orderCol: String,
      tokensCol: String, budget: Long, buckets: Int = 64): DataFrame =
    runningSum(df, strataCol, orderCol, tokensCol, buckets)
      .withColumn("bin", floor((col("__cum") - col(tokensCol)) / budget))
      .drop("__cum")

  /** The two-phase distributed prefix sum behind [[packBudget]] and
    * [[packSequences]] — see packBudget's doc for the design. Returns
    * the input plus an inclusive per-stratum running sum `__cum`. */
  private def runningSum(df: DataFrame, strataCol: String, orderCol: String,
      tokensCol: String, buckets: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val rangeable = df.schema(orderCol).dataType match {
      case _: NumericType | DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    val cum: DataFrame =
      if (!rangeable || buckets <= 1) {
        val w = Window.partitionBy(col(strataCol)).orderBy(col(orderCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        df.withColumn("__cum", sum(col(tokensCol)).over(w))
      } else {
        // Equal-width per-stratum buckets from min/max, NOT sampled
        // percentiles: bucketing needs only ORDER-CONSISTENCY (monotone
        // in the key), never balance, and the old percentile_approx
        // boundary pass was a per-row GK-sketch update outside codegen
        // PLUS a 63-element array fold per row to place the bucket —
        // both replaced by a codegen'd min/max aggregate and one
        // subtract/divide/floor per row (the same trade measured 3× on
        // a6's percentile path, OPTIMIZATION_r19.md). A skewed order-
        // key distribution only unbalances buckets (slower, still
        // correct); the degenerate all-one-value stratum collapses to
        // one bucket — exactly the window formulation's semantics.
        // Monotone double view of the order key (date/timestamp via
        // the timestamp cast; long→double ties past 2^53 only merge
        // adjacent buckets, which bucketing tolerates by construction).
        val oNum = (df.schema(orderCol).dataType match {
          case _: NumericType => col(orderCol)
          case _ => col(orderCol).cast("timestamp")
        }).cast("double")
        val bnd = df.groupBy(col(strataCol).as("__ps"))
          .agg(min(oNum).as("__bmn"), max(oNum).as("__bmx"))
        // a null key lands in bucket 0 (null arithmetic -> null ->
        // coalesce 0), exactly where the window's nulls-first
        // ordering puts it
        val width = (col("__bmx") - col("__bmn")) / buckets
        val withRb = df.join(broadcast(bnd), col(strataCol) <=> col("__ps"), "left")
          .withColumn("__rb", coalesce(
            when(col("__bmx") <= col("__bmn"), lit(0L)).otherwise(
              least(lit(buckets - 1L), greatest(lit(0L),
                floor((oNum - col("__bmn")) / width)))),
            lit(0L)))
        val wRun = Window.partitionBy(col(strataCol), col("__rb"))
          .orderBy(col(orderCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // per-(stratum, bucket) totals -> cumulative offsets; the frame
        // is <= |strata|*buckets rows at ANY corpus size, so its window
        // and the broadcast are negligible
        val offs = withRb.groupBy(col(strataCol).as("__os"), col("__rb").as("__orb"))
          .agg(sum(col(tokensCol)).as("__tot"))
          .withColumn("__off", coalesce(sum(col("__tot")).over(
            Window.partitionBy("__os").orderBy("__orb")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("__os", "__orb", "__off")
        withRb
          .withColumn("__run", sum(col(tokensCol)).over(wRun))
          .join(broadcast(offs),
            col(strataCol) <=> col("__os") && col("__rb") === col("__orb"), "left")
          .withColumn("__cum", col("__run") + coalesce(col("__off"), lit(0L)))
          .drop("__ps", "__bmn", "__bmx", "__rb", "__run", "__os", "__orb", "__off")
      }
    cum
  }

  /** Fixed-length sequence packing — the "make training batches" op a
    * pretraining run executes AFTER budgeting: within each stratum, in
    * deterministic `orderCol` order, documents form one token stream
    * (each doc contributes its token count, already including any EOS
    * the caller adds) that is cut into consecutive `seqLen`-token
    * sequences; a document whose span crosses a cut continues in the
    * next sequence (GPT-style packing, no padding, vs [[packBudget]]'s
    * first-fit whole-document bins). Returns one row per (stratum,
    * seq_id): `n_docs` documents overlapping the sequence, `n_starts`
    * documents beginning in it, `tokens` filled (== seqLen except each
    * stratum's last). Rides the same two-phase distributed prefix sum
    * as packBudget — per-stratum parallelism is (strata × buckets),
    * never one task per web-scale stratum — and the explode adds
    * ⌈tok/seqLen⌉ rows per document (≈1 for normal docs), aggregated
    * map-side by (stratum, seq_id). Integer `div` throughout: double
    * division would silently lose exactness past 2^53 cumulative
    * tokens (a 100 TB corpus is ~25T tokens — headroom matters). */
  def packSequences(df: DataFrame, strataCol: String, orderCol: String,
      tokensCol: String, seqLen: Long, buckets: Int = 64): DataFrame = {
    require(seqLen > 0, s"packSequences: seqLen = $seqLen must be positive")
    runningSum(df, strataCol, orderCol, tokensCol, buckets)
      .filter(col(tokensCol) > 0) // zero-token rows span no sequence
      .withColumn("__s", (col("__cum") - col(tokensCol)).cast("long"))
      .withColumn("__e", (col("__cum") - 1).cast("long"))
      .withColumn("seq_id",
        explode(sequence(expr(s"__s div ${seqLen}L"), expr(s"__e div ${seqLen}L"))))
      .groupBy(col(strataCol), col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(expr(s"__s div ${seqLen}L") === col("seq_id"), 1).otherwise(0))
          .cast("long").as("n_starts"),
        sum(least(col("__e"), (col("seq_id") + 1) * seqLen - 1) -
            greatest(col("__s"), col("seq_id") * seqLen) + 1)
          .cast("long").as("tokens"))
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
    val weighted = df
      .filter(element_at(typedLit(weights), col(sourceCol)).isNotNull)
    keepRankedPrefix(weighted, sourceCol, textCol, idCol,
      (s, _) => ceil(element_at(typedLit(weights), s) / sumW * totalRows))
  }

  /** Shared selection core of [[stratifiedSample]] and [[mixSources]]:
    * per stratum, keep exactly the first `targetOf(n)` rows under the
    * total order (md5(text) hex, id) — null text ranks first (hash
    * folded to ""), ties broken by id, so (hash, id)-unique rows make
    * the selection fully deterministic — WITHOUT per-stratum sorts or
    * payload shuffles. Three-phase distributed threshold selection:
    *
    *  1. COUNT per (stratum, 4-hex-char hash-prefix bucket): one
    *     map-combinable aggregate over a slim projection; the result is
    *     ≤ 65536·|strata| rows however large the corpus.
    *  2. Find each stratum's BOUNDARY bucket — the first whose
    *     cumulative count crosses the target — with windows over that
    *     tiny count frame; broadcast the ≤ 1-row-per-stratum decision
    *     (cut bucket + how many of its rows still fit).
    *  3. Rows in buckets BELOW the cut pass a pure broadcast-filter —
    *     the bulk of the sample moves through ZERO exchanges. Only the
    *     boundary bucket (~1/65536 of each stratum) pays a rank window
    *     to order its few rows.
    *
    * The price is evaluating md5 twice per row (count pass + filter
    * pass, both full scans); the win is that no stratum is ever
    * sorted whole and no text payload ever rides an exchange keyed by
    * stratum — at a 90%-one-source corpus the window formulation is a
    * single task holding most of the lake. `targetOf` sees the
    * stratum's row count as a Column (and may reference the stratum's
    * own columns via the count frame's grouping key, e.g. a per-source
    * weight lookup); it must be deterministic. */
  private def keepRankedPrefix(df: DataFrame, strataCol: String,
      textCol: String, idCol: String,
      targetOf: (Column, Column) => Column): DataFrame = {

    // null-safe hash: "" sorts before every hex digit, reproducing the
    // window formulation's nulls-first ordering; the bucket is a string
    // PREFIX of the hash, so (bucket, (hash, id)) order == (hash, id)
    val hash = coalesce(md5(col(textCol).cast("binary")), lit(""))
    val bucket = substring(hash, 1, 4)

    val counts = df
      .groupBy(col(strataCol).as("__gs"), bucket.as("__gb"))
      .agg(count(lit(1)).as("__gc"))
    val before = Window.partitionBy("__gs").orderBy("__gb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy("__gs")
    val annotated = counts
      .withColumn("__before", coalesce(sum(col("__gc")).over(before), lit(0L)))
      .withColumn("__k", targetOf(col("__gs"), sum(col("__gc")).over(whole))
        .cast("long"))
    // first bucket the target does NOT fully cover; absent (target ≥ n)
    // means the whole stratum is kept
    val decision = annotated
      .filter(col("__before") + col("__gc") > col("__k"))
      .groupBy("__gs")
      .agg(min_by(
        struct(col("__gb").as("b"), (col("__k") - col("__before")).as("rem")),
        col("__gb")).as("__d"))
      .select(col("__gs"), col("__d.b").as("__bcut"), col("__d.rem").as("__rem"))

    val joined = df.join(broadcast(decision),
      col(strataCol) <=> col("__gs"), "left")
    val bulk = joined
      .filter(col("__bcut").isNull || bucket < col("__bcut"))
      .drop("__gs", "__bcut", "__rem")
    val boundaryRank = Window.partitionBy(col(strataCol))
      .orderBy(hash, col(idCol))
    val boundary = joined
      .filter(bucket === col("__bcut") && col("__rem") > 0)
      .withColumn("__rn", row_number().over(boundaryRank))
      .filter(col("__rn") <= col("__rem"))
      .drop("__gs", "__bcut", "__rem", "__rn")
    bulk.unionByName(boundary)
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

  /** Deterministic training-shard layout — the EXPORT step of a
    * curated corpus: every row gets a `shard` (the first `nibbles` hex
    * chars of its permutation hash → 16^nibbles shards) and a 1-based
    * `pos` within its shard under (hash, id) order. The hash covers
    * `text || ' ' || id` — a ROW-unique key (numeric ids contain no
    * spaces, so the concatenation is unambiguous), so the permutation
    * is a pure
    * deterministic function of the row (no RNG state, no
    * partition-count dependence): a training run slices `(shard, pos)`
    * ranges identically on any cluster, and a re-export after upstream
    * dedup keeps every unchanged row's shard. Feed the result to
    * `DatasetWriter` hive-partitioned on `shard` for the on-disk
    * layout. The id rides the hash deliberately (round-16 review
    * catch): hashing the text alone sends EVERY duplicate of a
    * boilerplate document to one (shard, bucket) — the hot-fingerprint
    * skew this file de-skews elsewhere — and unbalances the shards
    * themselves; with the row-unique key, duplicates scatter uniformly
    * (which is also what a training permutation wants).
    *
    * Scale shape: the obvious per-shard `row_number` window holds an
    * entire shard — corpus/16^nibbles rows — in ONE task, the
    * single-hot-key straggler this file bans elsewhere. Instead `pos`
    * is assigned with the same bucketed-offset machinery as
    * [[packBudget]]: rows range-bucket by the next 4 hash chars
    * (65536 buckets per shard), a tiny per-(shard, bucket) count frame
    * turns into broadcast offsets, and the rank window runs per
    * (shard, bucket) — partitions of corpus/(16^nibbles · 65536) rows,
    * bounded at any corpus size by the uniformity of a hash over
    * row-unique inputs. Because the bucket is a string PREFIX of the
    * ordering key, bucket-major order equals global (hash, id) order
    * within the shard, so offset + in-bucket rank is exactly the
    * shard-wide rank. Null text participates as "" (its rows still
    * hash row-uniquely through the id). */
  def shardLayout(df: DataFrame, textCol: String, idCol: String,
      nibbles: Int = 1): DataFrame = {
    require(nibbles >= 1 && nibbles <= 8,
      s"shardLayout: nibbles must be in [1, 8], got $nibbles")
    val hash = md5(concat(coalesce(col(textCol), lit("")), lit(" "),
      col(idCol).cast("string")).cast("binary"))
    val shard = substring(hash, 1, nibbles)
    val bucket = substring(hash, nibbles + 1, 4)
    val counts = df
      .groupBy(shard.as("__s"), bucket.as("__b"))
      .agg(count(lit(1)).as("__c"))
    val before = Window.partitionBy("__s").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(before), lit(0L)))
      .select("__s", "__b", "__off")
    // deliberately NOT broadcast-hinted (the SkewJoin lesson): offs is
    // ≤ 16^nibbles·65536 rows — tiny at the default but not PROVABLY
    // tiny at wider nibbles — and the rank window forces a corpus
    // exchange on (shard, bucket) regardless, so a forced broadcast
    // saves nothing and could OOM; JoinSelection broadcasts the small
    // aggregate on its own and AQE demotes it past the threshold
    val rankW = Window.partitionBy(col("__s"), col("__b"))
      .orderBy(hash, col(idCol))
    df.withColumn("__s", shard).withColumn("__b", bucket)
      .join(offs, Seq("__s", "__b"))
      .withColumn("pos", col("__off") + row_number().over(rankW))
      .withColumnRenamed("__s", "shard")
      .drop("__b", "__off")
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vocabulary-realistic text twin of a GenScale fixture (round-19
  * judge ask #5): the contract corpus has 31 distinct words, which
  * honestly caps the trainable BPE merge table at 89 (the <2-frequency
  * stop — BpeCapProbe), so token-budget realism (`x_pack_budget` /
  * `x_seq_pack` under a real ≥512-merge vocabulary) can't be measured
  * on it. This tool derives a twin of a fixture's `documents` table
  * that keeps everything the budget keys depend on — doc_id, lang,
  * source, and the PER-DOCUMENT TOKEN COUNT — and swaps only the
  * vocabulary: each token position is re-sampled from a deterministic
  * synthetic lexicon with
  *
  *  - morphology-like subword structure (CV-syllable composition plus
  *    a suffix inventory: -ing/-ed/-tion/… — real shared subwords for
  *    BPE to learn, unlike opaque random strings),
  *  - Zipf(s=1.07) rank frequencies (the measured exponent of natural
  *    corpora, Piantadosi 2014 review), sampled per position by the
  *    analytic inverse CDF of the continuous Zipf approximation, and
  *  - the law of abbreviation (frequent words are short): ranks are
  *    assigned in (length, word) order.
  *
  * Sampling is pure-expression (`xxhash64(doc_id, pos)` → uniform →
  * rank → `element_at` on the broadcast lexicon literal): no UDF, no
  * driver loop, one codegen'd projection per document — the generator
  * itself is a 100 TB-shape plan. Determinism: same (src, vocab, seed)
  * → bit-identical output; no wall-clock anywhere.
  *
  * Only `documents.parquet` is written — the A/B keys
  * (`x_pack_budget`, `x_seq_pack`, `x_text_stats`, `x_quality_filter`)
  * read nothing else. The A/B itself is [[BpeRealismProbe]].
  *
  * Usage: runMain graft.tools.GenText <srcSfDir> <outDir> [vocab=20000]
  */
object GenText {

  /** The deterministic lexicon: `n` distinct words in rank order
    * (rank 1 = most frequent). Seeded syllable composition; dedup;
    * ranks by (length, word) so short words are frequent. */
  def lexicon(n: Int, seed: Long = 1009L): Array[String] = {
    val rnd = new scala.util.Random(seed)
    val onsets = Array("", "b", "c", "d", "f", "g", "h", "j", "k", "l", "m",
      "n", "p", "r", "s", "t", "v", "w", "z", "br", "ch", "cl", "cr", "dr",
      "fl", "fr", "gl", "gr", "pl", "pr", "sc", "sh", "sk", "sl", "sm",
      "sn", "sp", "st", "str", "sw", "th", "tr", "wh")
    val nuclei = Array("a", "e", "i", "o", "u", "ai", "au", "ea", "ee",
      "ei", "ie", "io", "oa", "oo", "ou")
    val codas = Array("", "", "b", "ck", "d", "ft", "g", "k", "l", "ld",
      "ll", "m", "n", "nd", "ng", "nk", "nt", "p", "r", "rd", "rk", "rm",
      "rn", "rt", "s", "sh", "sk", "ss", "st", "t", "th", "x")
    val suffixes = Array("", "", "", "", "s", "s", "ed", "ing", "er", "ly",
      "est", "tion", "ness", "ment", "able", "ful")
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    while (seen.size < n) {
      // 1–4 syllables, geometric-ish (most words 1–2 syllables)
      val nsyl = 1 + rnd.nextInt(2) + (if (rnd.nextInt(4) == 0) 1 else 0) +
        (if (rnd.nextInt(8) == 0) 1 else 0)
      val sb = new StringBuilder
      (0 until nsyl).foreach { _ =>
        sb ++= onsets(rnd.nextInt(onsets.length))
        sb ++= nuclei(rnd.nextInt(nuclei.length))
        sb ++= codas(rnd.nextInt(codas.length))
      }
      sb ++= suffixes(rnd.nextInt(suffixes.length))
      val w = sb.toString
      if (w.nonEmpty) seen += w
    }
    seen.toArray.sortBy(w => (w.length, w))
  }

  /** Rewrite `documents` of `src` over the lexicon; write to `out`. */
  def generate(spark: SparkSession, src: String, out: String,
      vocabSize: Int): Unit = {
    val lex = lexicon(vocabSize)
    val v = lex.length.toDouble
    val s = 1.07 // Zipf exponent
    // analytic inverse CDF of the continuous Zipf(s) on [1, V]:
    // r(u) = (u·(V^(1-s) − 1) + 1)^(1/(1-s)), clamped to [1, V]
    val span = math.pow(v, 1 - s) - 1
    def rankOf(u: org.apache.spark.sql.Column) =
      least(lit(v), greatest(lit(1.0),
        ceil(pow(u * lit(span) + lit(1.0), lit(1.0 / (1 - s))))))
        .cast("int")
    val docs = graft.Tables.load(spark, src, "documents")
    val lexLit = typedlit(lex)
    val nTok = size(graft.functions.TextFunctions.tokens(col("text")))
    // u in [0, 1): 30 low bits of a position-keyed hash
    def u(pos: org.apache.spark.sql.Column) =
      pmod(xxhash64(col("doc_id"), pos), lit(1L << 30)).cast("double") /
        lit((1L << 30).toDouble)
    val newText = when(col("text").isNull, lit(null).cast("string"))
      .when(nTok === 0, col("text")) // whitespace-only rides unchanged
      .otherwise(concat_ws(" ",
        transform(sequence(lit(1), nTok), i => element_at(lexLit, rankOf(u(i))))))
    docs.select(col("doc_id"), newText.as("text"), col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenText <srcSfDir> <outDir> [vocab]")
    val vocab = if (args.length > 2) args(2).toInt else 20000
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-gentext").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, args(0), args(1), vocab)
    spark.stop()
  }
}

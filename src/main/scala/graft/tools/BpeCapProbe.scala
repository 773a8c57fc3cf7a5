package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-18 probe for the BPE-pin scaling ask: how many merges can the
  * pinned fixture slice actually support before training's <2-frequency
  * stop, and what do raised pins do to token budgets? (The fixture
  * corpus is synthetic text over ~31 distinct words, so the pin's
  * ceiling is a corpus property, not a knob.) */
object BpeCapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vocab = graft.functions.Bpe.sliceVocab(spark, "/root/testdata/sf0.01", 500L)
    println(s"[bpecap] slice vocab: ${vocab.size} distinct words, " +
      s"${vocab.map(_._2).sum} occurrences, " +
      s"symbol budget=${vocab.map { case (w, _) => graft.functions.Bpe.codePoints(w).length - 1 }.sum}")
    val unbounded = graft.functions.Bpe.train(vocab, numMerges = 1000000)
    println(s"[bpecap] trainer stop point: ${unbounded.length} merges")
    // token budgets per pin size: mean tokens/word over the vocab
    for (n <- (Seq(16, 32, 48) ++ (56 to unbounded.length by 4) :+ unbounded.length).distinct) {
      val table = unbounded.take(n)
      val tot = vocab.map { case (w, f) =>
        graft.functions.Bpe.tokenCount(w, table).toLong * f }.sum
      val words = vocab.map(_._2).sum
      println(f"[bpecap] merges=$n%4d  corpus tokens=$tot%8d  tokens/word=${tot.toDouble / words}%.3f")
    }
    spark.stop()
  }
}

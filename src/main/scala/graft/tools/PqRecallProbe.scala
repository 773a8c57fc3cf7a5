package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Measure PQ-ADC recall@k against the brute-force baseline over an
  * (m, ks) grid — the honest input to choosing the x_embed_pq_topk
  * parameters and to SCALE.md's recall/compression table.
  * args: sfDir [k] [nProbes] */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt else 5
    val nProbes = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = graft.Tables.load(spark, sfDir, "embeddings").cache()
    val n = emb.count()
    val probes = emb.filter(col("vec_id") < nProbes)
    def tops(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select($"probe_id", $"corpus_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    val bf = tops(Similarity.cosineTopK(emb, probes, "vec_id", "embedding", k))

    println(f"n=$n nProbes=$nProbes k=$k  (random recall ≈ ${k.toDouble / (n - 1)}%.3f)")
    for (m <- Seq(4, 8, 16, 32); ks <- Seq(16, 32); r <- Seq(0, 5 * k, 10 * k)) {
      val pq = tops(Similarity.pqTopK(emb, probes, "vec_id", "embedding",
        k = k, m = m, ks = ks, refine = r))
      val recall = bf.map { case (p, truth) =>
        (pq.getOrElse(p, Set.empty) & truth).size.toDouble / truth.size
      }.sum / bf.size
      val bytes = m * (math.log(ks) / math.log(2)) / 8.0
      println(f"m=$m%2d ks=$ks%3d refine=$r%3d  codeBytes=$bytes%5.1f  compression=${256.0 / (bytes + 8)}%5.1fx  recall@$k=$recall%.3f")
    }
    // trained-codebook uplift vs the fixed-id rows above: refine = 0
    // isolates the codes' own ranking power; refine = 10k is the
    // x_pq_trained_topk contract point (iters matches the contract's 2
    // for the refined row, 3 for the historical refine-0 uplift row)
    for (m <- Seq(8, 16); ks <- Seq(16, 32); (it, r) <- Seq((3, 0), (2, 10 * k))) {
      val trained = Similarity.pqTrain(emb, "vec_id", "embedding", m, ks, iters = it)
      val tTrained = tops(Similarity.pqTopK(emb, probes, "vec_id", "embedding",
        k = k, m = m, ks = ks, refine = r,
        codebookSource = Some(pqCodebookFrame(spark, trained))))
      val rT = bf.map { case (p, truth) =>
        (tTrained.getOrElse(p, Set.empty) & truth).size.toDouble / truth.size
      }.sum / bf.size
      println(f"TRAINED m=$m%2d ks=$ks%3d iters=$it refine=$r%3d  recall@$k=$rT%.3f")
    }
    spark.stop()
  }

  /** Promoted to [[graft.operators.Similarity.pqCodebookFrame]]
    * (round-18: the trained-codebook path became a contract query);
    * kept here as a delegate for the probe's historical call sites. */
  def pqCodebookFrame(spark: SparkSession,
      cb: Array[Array[Array[Double]]]): org.apache.spark.sql.DataFrame =
    graft.operators.Similarity.pqCodebookFrame(spark, cb)
}

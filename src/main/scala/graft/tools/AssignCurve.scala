package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve driver for the semantic-dedup ASSIGNMENT stage alone —
  * the round-15 verdict ask: the standing fixtures never push the
  * corpus-derived centroid count past its floor (k = 120 at sf30), so
  * the Θ(n·k) flat-assignment wall is invisible to the sf lanes. This
  * tool measures flat vs hierarchical assignment on a synthetic corpus
  * large enough that k = n/5000 materially exceeds the floor
  * (n = 5M → k = 1000).
  *
  * Corpus: deterministic hash-derived dim-64 float vectors (no RNG —
  * same bytes on every run), written to parquet ONCE per size so
  * generation cost never pollutes the timed region. Centroids are the
  * k lowest ids, exactly the shape `ExtQueries.dedupSemantic` uses.
  *
  * Usage: runMain graft.tools.AssignCurve <outRoot> <n1> <n2> ...
  *          [-- flat|hier|coarse|both|all]
  * Env: SPARK_GRAFT_REPS (default 2), SPARK_GRAFT_CPUS (default 32).
  * Prints one JSON line per (n, path) with the min wall seconds.
  *
  * `coarse` times the hier path's COARSE stage alone (the
  * NearestCentroid projection + its anchor pick) so growth attributes
  * to the right stage — the round-16 ask: the fine stage still moves
  * n·(k/√k) joined rows through the partial-agg argmax, and a curve
  * that only times the whole operator cannot say which term bends.
  * fine ≈ hier − coarse at the same point. `both` = flat+hier
  * (round-15 compatibility); `all` adds coarse. */
object AssignCurve {
  def main(args: Array[String]): Unit = {
    val sep = args.indexOf("--")
    val positional = if (sep < 0) args else args.take(sep)
    val mode = if (sep < 0) "both" else args(sep + 1)
    require(positional.length >= 2,
      "usage: AssignCurve <outRoot> <n...> [-- flat|hier|coarse|both|all]")
    val outRoot = positional.head
    val sizes = positional.tail.map(_.toLong)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    // SPARK_GRAFT_MAX_ANCHORS < sqrt(k) forces the anchors-of-anchors
    // recursion on corpora whose k would otherwise fit one literal —
    // the round-16 knob for measuring the multi-level path's cost
    val maxAnchors = sys.env.getOrElse("SPARK_GRAFT_MAX_ANCHORS", "2048").toInt
    val dim = 64

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .appName("graft-assigncurve").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def corpusPath(n: Long) = s"$outRoot/assign_n$n"

    sizes.foreach { n =>
      val path = corpusPath(n)
      val done = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
      val fs = done.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(done)) {
        System.err.println(s"[assigncurve] generating n=$n at $path")
        spark.range(0, n, 1, 32)
          .select(col("id").as("vec_id"),
            expr(s"transform(sequence(0, ${dim - 1}), " +
              "d -> cast((pmod(xxhash64(id, d), 2000) - 1000) / 1000.0 as float))")
              .as("embedding"))
          .write.mode("overwrite").parquet(path)
      }
    }

    // JVM/codegen warmup on the smallest corpus
    locally {
      val c = spark.read.parquet(corpusPath(sizes.min))
      val cent = c.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      force(graft.operators.Similarity.assignClusters(c, "vec_id", "embedding", cent))
    }

    // SPARK_GRAFT_K_DIV scales the K DIMENSION at fixed n (default 5000
    // = the SemDeDup knob): the 100 TB design point is k ~ 10⁶ at
    // n ~ 10⁹, unreachable locally in n — but k/n = 1/100 on a 20M
    // corpus probes the same per-row √k growth the big-k regime pays
    val kDiv = sys.env.getOrElse("SPARK_GRAFT_K_DIV", "5000").toLong
    for (n <- sizes) {
      val k = math.max(16L, n / kDiv)
      val corpus = spark.read.parquet(corpusPath(n))
      val cent = corpus.filter(col("vec_id") < k)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val paths: Seq[(String, () => DataFrame)] = Seq(
        "flat" -> (() => graft.operators.Similarity
          .assignClusters(corpus, "vec_id", "embedding", cent)),
        "hier" -> (() => graft.operators.Similarity
          .assignClustersHier(corpus, "vec_id", "embedding", cent,
            maxAnchors = maxAnchors)),
        "coarse" -> (() => graft.operators.Similarity
          .hierStages(corpus, "vec_id", "embedding", cent,
            "corpus_id", -1, maxAnchors)._1)
      ).filter { case (p, _) =>
        mode match {
          case "all" => true
          case "both" => p == "flat" || p == "hier"
          case m => m == p
        }
      }
      for ((pname, build) <- paths) {
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          force(build())
          val sec = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache(); System.gc()
          sec
        }
        println(f"""{"assign_curve":{"n":$n,"k":$k,"path":"$pname","sec":${times.min}%.3f,"reps":$reps}}""")
      }
    }
    spark.stop()
  }
}

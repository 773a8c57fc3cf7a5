package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Dev-only stage profiler for the dedup pipelines. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      // INT96 (the deprecated default) writes NO comparable column
      // stats — footer row-group skipping and the file-stats index
      // are blind to timestamps without this
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val df = Tables.load(spark, dir, "documents")
    val docs = df.select(col("doc_id").as("id"), shingleSet(col("text"), 3).as("sh"))

    time("shingleSet count")(docs.count())
    val posting = docs.select(col("id"), explode(col("sh")).as("s"))
    time("posting count")(posting.count())
    val rare = posting.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= 50)
    time("rare shingles")(rare.count())
    val pruned = posting.join(rare.select("s"), Seq("s"))
    time("pruned posting")(pruned.count())
    val cands = pruned.as("a").join(pruned.as("b"), Seq("s"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    time("raw candidate pairs")(cands.count())
    val dist = cands.distinct()
    time("distinct candidates")(dist.count())
    time("full ngram pipeline")(
      Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.8, Some(50)).count())

    val sigs = docs.select(col("id"), bandKeys(minhashSignature(col("sh"), 32), 8, 4).as("bk"))
    time("minhash sigs")(sigs.count())
    val buckets = sigs.select(col("id"), posexplode(col("bk")).as(Seq("band", "key")))
    val mcands = buckets.as("a").join(buckets.as("b"), Seq("band", "key"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    time("minhash raw candidates")(mcands.count())
    time("minhash distinct candidates")(mcands.distinct().count())
    time("full minhash pipeline")(
      Dedup.minhashLshPairs(df, "doc_id", "text", 3, 32, 8, 0.8).count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up fixture generator for the scale-growth
  * rehearsal (SCALE_CURVE.md): derives an sf(0.1·k) fixture from the
  * driver's read-only sf0.1 by writing k structure-preserving replicas
  * of the tables the rehearsal keys touch.
  *
  * The point is a FAIR curve: each replica must add data without
  * changing the workload's *shape* — the per-document duplicate rate,
  * the per-vector neighbor count, the per-key update ratio all stay
  * constant as the corpus grows, so a super-linear wall-time curve
  * indicts the operator, not the generator. Replica r≥1 therefore maps
  * content through a per-replica ISOMETRY rather than copying it:
  *
  *  - `documents`: every token gets a replica tag (`_r<k>` appended via
  *    one regexp pass over `\S+` — the same Java `\s` class the
  *    shingle/minhash tokenizer splits on). Within-replica span and
  *    MinHash structure is IDENTICAL to the source corpus (token
  *    mapping is a bijection, and shingle equality is invariant under
  *    it); across replicas the vocabularies are disjoint, so no new
  *    near-dup pairs appear and the dup fraction stays exactly sf0.1's.
  *  - `embeddings`: coordinates multiplied by a per-replica ±1 sign
  *    vector (seeded by the replica index). A sign flip is an isometry
  *    of the dot product — within-replica cosines are bit-preserved —
  *    while the cosine between x and x⊙s for random s concentrates
  *    around 0, so replicas don't manufacture cross-replica neighbors.
  *  - `orders` / `customer`: keys shifted by a replica stride divisible
  *    by 3 (w6's delta split filters on `o_orderkey % 3`, which must
  *    keep its source proportions); payload columns ride unchanged.
  *
  * Usage: runMain graft.tools.GenScale <srcSfDir> <outDir> <k>
  * (k=10 over sf0.1 ≈ sf1: 50k docs, 20k vectors, 1.5M orders.)
  * Output lands under <outDir>/<table>.parquet as DIRECTORIES — the
  * rehearsal reads through Tables.load, which accepts both layouts.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: GenScale <srcSfDir> <outDir> <k>")
    val Array(src, out, kStr) = args
    val k = kStr.toInt
    require(k >= 1)
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-genscale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // strides comfortably above any source key range, divisible by 3
    val stride = 30000000L

    def replicas(base: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(r => f(base, r)).reduce(_ unionAll _)

    val docs = graft.Tables.load(spark, src, "documents")
    replicas(docs, { (d, r) =>
      if (r == 0) d
      else d.select(
        (col("doc_id") + r * stride).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", "$1_r" + r).as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")))
        .select("doc_id", "text", "lang", "source", "n_chars")
    }).repartition(k * 4).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = graft.Tables.load(spark, src, "embeddings")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    replicas(emb, { (e, r) =>
      if (r == 0) e
      else {
        val rnd = new scala.util.Random(7700 + r)
        val flips = Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
        e.select((col("vec_id") + r * stride).as("vec_id"),
          zip_with(col("embedding"), lit(flips), (x, s) => x * s).as("embedding"),
          col("label"))
      }
    }).repartition(k * 2).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val orders = graft.Tables.load(spark, src, "orders")
    replicas(orders, { (o, r) =>
      if (r == 0) o
      else o.withColumn("o_orderkey", col("o_orderkey") + r * stride)
        .withColumn("o_custkey", col("o_custkey") + r * stride)
    }).repartition(k * 8).write.mode("overwrite").parquet(s"$out/orders.parquet")

    val cust = graft.Tables.load(spark, src, "customer")
    replicas(cust, { (c, r) =>
      if (r == 0) c
      else c.withColumn("c_custkey", col("c_custkey") + r * stride)
    }).repartition(k * 2).write.mode("overwrite").parquet(s"$out/customer.parquet")

    println(s"[genscale] wrote ${k}x replicas of documents/embeddings/orders/customer to $out")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B experiment for the x_dedup_ngram prefix-build stage (round 15):
  *
  *  A. shipped shape: posting JOIN dfreq on shingle, then a
  *     row_number window over (id) ordered by (df, s) — two wide
  *     exchanges of the full posting volume plus a per-partition sort.
  *  B. agg shape: dfreq exchange reused, then ONE groupBy(id) that
  *     collects the doc's (df, s) list, sorts it IN the aggregate
  *     (docs are hundreds of shingles — the sort is in-group, tiny)
  *     and slices the prefix — no window sort over the posting.
  *
  * Usage: PrefixShapeProbe <dir...>
  */
object PrefixShapeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .appName("graft-prefixshape").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[shape] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }

    val threshold = 0.8
    for (dir <- args) {
      println(s"[shape] ==== $dir ====")
      val docs = graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id").cast("long").as("id"),
          graft.functions.TextFunctions.shingleHashes(col("text"), 3).as("sh"))
        .localCheckpoint(true)
      val posting = docs.select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("s"))
      val dfreq = posting.groupBy("s").agg(count(lit(1)).as("df"))

      (1 to 2).foreach { rep =>
        timed(s"A join+window rep$rep") {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("id")).orderBy(col("df"), col("s"))
          posting.join(dfreq, Seq("s"))
            .withColumn("__pos", row_number().over(w))
            .filter(col("__pos") <= col("sz") - ceil(col("sz") * threshold) + 1)
            .select(col("s"), col("id")).count()
        }
        timed(s"B join+agg-slice rep$rep") {
          posting.join(dfreq, Seq("s"))
            .groupBy(col("id"))
            .agg(first(col("sz")).as("sz"),
              array_sort(collect_list(struct(col("df"), col("s")))).as("ord"))
            .select(col("id"),
              explode(slice(col("ord"), lit(1),
                (col("sz") - ceil(col("sz") * threshold) + 1).cast("int"))).as("e"))
            .select(col("e.s").as("s"), col("id")).count()
        }
        timed(s"C index+agg-slice rep$rep") {
          // no join at all: one inverted-index agg (s -> df, ids),
          // explode back annotated, then the per-doc prefix agg
          val idx = posting.groupBy(col("s"))
            .agg(count(lit(1)).as("df"), collect_list(struct(col("id"), col("sz"))).as("es"))
            .select(col("s"), col("df"), explode(col("es")).as("e"))
            .select(col("e.id").as("id"), col("e.sz").as("sz"), col("df"), col("s"))
          idx.groupBy(col("id"))
            .agg(first(col("sz")).as("sz"),
              array_sort(collect_list(struct(col("df"), col("s")))).as("ord"))
            .select(col("id"),
              explode(slice(col("ord"), lit(1),
                (col("sz") - ceil(col("sz") * threshold) + 1).cast("int"))).as("e"))
            .select(col("e.s").as("s"), col("id")).count()
        }
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct alongside. The
  * Spark-side machinery — schema, partitioning, per-partition batch
  * iteration, feature columns — is real and tested; the actual media
  * decode is STUBBED (this container has no image/audio codecs) behind
  * `decodeStub`, a deterministic fake keyed on the payload bytes, so
  * pipelines exercise exactly the shape a real decoder plugs into
  * (`mapPartitions` over payload batches ≡ PySpark's `mapInPandas`).
  */
object Multimodal {

  /** Metadata carried next to every payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false)))

  /** Wrap a text table into a multimodal table: payload = utf-8 bytes
    * (standing in for image/audio bytes), meta = typed struct. */
  def asPayloadTable(df: DataFrame, idCol: String, textCol: String,
      modality: String = "image", mime: String = "image/png"): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    df.select(
      col(idCol).as("media_id"),
      payload.as("payload"),
      struct(
        lit(modality).as("modality"),
        lit(mime).as("mime"),
        length(payload).cast("long").as("n_bytes"),
        md5(payload).as("checksum")).as("meta"))
  }

  /** STUB decode: a real implementation would decode the payload with
    * an image/audio library inside `mapPartitions` (one partition =
    * one decoder instance, batch-shaped exactly like mapInPandas).
    * The stub derives deterministic "features": width/height/channels
    * from the payload hash, a fixed-length feature vector from chunk
    * hashes. Swap the body of `decodeOne` for a real codec. */
  def decodeStub(payloads: DataFrame, featureDim: Int = 8): DataFrame = {
    val spark = payloads.sparkSession
    val inSchema = payloads.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val idxPayload = inSchema.fieldIndex("payload")
    val rdd = payloads.rdd.mapPartitions { it =>
      // one "decoder" per partition, batch iteration — the real-codec seam
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](idxPayload)
        val (w, h, c, feats) = decodeOne(bytes, featureDim)
        Row.fromSeq(row.toSeq ++ Seq(w, h, c, feats))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** The decoder seam. Deterministic fake: ??? → replaced by e.g.
    * javax.imageio / ffmpeg in a real deployment. */
  private def decodeOne(bytes: Array[Byte], featureDim: Int): (Int, Int, Int, Seq[Float]) = {
    val h = java.util.Arrays.hashCode(bytes)
    val width = 64 + math.abs(h % 960)
    val height = 64 + math.abs((h / 960) % 960)
    val feats = (0 until featureDim).map { i =>
      val chunk = bytes.slice(i * bytes.length / featureDim, (i + 1) * bytes.length / featureDim)
      (java.util.Arrays.hashCode(chunk).toFloat / Int.MaxValue)
    }
    (width, height, 3, feats)
  }

  /** Frame-sampling plumbing for video-like payloads: split the payload
    * into `frames` equal byte-ranges and explode one row per sampled
    * frame — the partition/batch shape of real frame extraction. */
  def sampleFrames(payloads: DataFrame, frames: Int): DataFrame =
    payloads
      .withColumn("frame_idx", explode(sequence(lit(0), lit(frames - 1))))
      .withColumn("frame_bytes",
        substring(col("payload"),
          (col("frame_idx") * (col("meta.n_bytes") / frames) + 1).cast("int"),
          greatest((col("meta.n_bytes") / frames).cast("int"), lit(1))))
      .withColumn("frame_checksum", md5(col("frame_bytes")))

  /** Resize stub: deterministic byte-range "thumbnail" + recorded
    * target dims (the real op would re-encode pixels). */
  def resizeStub(decoded: DataFrame, w: Int, h: Int): DataFrame =
    decoded
      .withColumn("thumb_width", lit(w))
      .withColumn("thumb_height", lit(h))
      .withColumn("thumb", substring(col("payload"), 1,
        math.max(1, w * h / 64)))
}

package graft.ds

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Persistent bloom index over a dataset's delta-key columns — the
  * `_bloom_index` sidecar file beside the data. What it buys at 100 TB:
  * a delta (idempotent-append) write normally pays an existing-side
  * scan + anti-join shuffle even when the incoming batch is entirely
  * new keys — the common shape of live ingest. With the sidecar, every
  * batch row probes the filter map-side (codegen'd
  * [[graft.plans.BloomMightContain]], one `mightContainLong` per row):
  * definitely-new rows append WITHOUT touching the existing dataset,
  * and only possible-duplicates (true matches + the fpp of false
  * positives) go through the exact anti-join. An all-new batch costs
  * O(batch) — zero existing-side IO, zero shuffle.
  *
  * Correctness contract: the filter must remain a SUPERSET of the
  * dataset's live keys. False positives only cost an anti-join probe;
  * a missed key would break delta idempotency (duplicate rows). The
  * superset invariant holds because
  *  - [[DatasetWriter]] merges every written batch's keys into the
  *    sidecar under the dataset lock (append/delta/upsert), and
  *    rebuilds it on overwrite;
  *  - key-preserving rewrites (compact, repartition, schema-unify)
  *    never add keys — a lost sidecar (root swap) just disables the
  *    fast path until the next overwrite/build, never corrupts it;
  *  - writes that bypass graft entirely are outside the contract —
  *    documented: delete the sidecar (or rebuild) after foreign writes.
  *
  * Capacity: the filter is sized at creation (`expectedItems`, `fpp`)
  * and batch merges reuse the SAME parameters (Spark bloom merge
  * requires identical layout). Past ~expectedItems inserted keys the
  * real fpp degrades — more false positives, never wrong results;
  * [[build]] with a larger budget resizes. */
object BloomIndex {
  val FileName = "_bloom_index"
  private val Magic = "graft-bloom-v1"
  val DefaultFpp = 0.01

  final case class Index(cols: Seq[String], expectedItems: Long, fpp: Double,
      bytes: Array[Byte]) {
    @transient lazy val bloom: BloomFilter =
      BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  def sidecar(dsPath: String): Path = new Path(dsPath, FileName)

  /** One 64-bit hash over the key tuple — same function on the build
    * and probe side (xxhash64 hashes nulls deterministically, so
    * null-keyed rows probe consistently too). */
  def keyHash(cols: Seq[String]): Column = xxhash64(cols.map(col): _*)

  /** Load the sidecar, treating ANY corruption (truncated header or
    * filter bytes — e.g. a crash mid-write on an FS without the atomic
    * rename below) as ABSENT: the fast path switches off and the next
    * maintained write rebuilds; a throwing load would brick every
    * subsequent write on the dataset instead. */
  def load(fs: FileSystem, dsPath: String): Option[Index] = {
    val p = sidecar(dsPath)
    try {
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val all = try in.readAllBytes() finally in.close()
      val nl = all.indexOf('\n'.toByte)
      if (nl < 0) return None
      val header = new String(all, 0, nl, java.nio.charset.StandardCharsets.UTF_8).split('\t')
      if (header.length != 4 || header(0) != Magic) return None
      val idx = Index(header(1).split(',').toSeq.filter(_.nonEmpty),
        header(2).toLong, header(3).toDouble,
        java.util.Arrays.copyOfRange(all, nl + 1, all.length))
      idx.bloom // validate the filter payload deserializes (lazy-cached for use)
      Some(idx)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Stage + rename so readers never see a half-written sidecar. The
    * delete→rename pair is not atomic on every FS — the worst case is a
    * brief window with NO sidecar (fast path off), never a corrupt one. */
  def write(fs: FileSystem, dsPath: String, idx: Index): Unit = {
    val dst = sidecar(dsPath)
    val tmp = new Path(dst.getParent, s"${FileName}__tmp")
    val out = fs.create(tmp, true)
    try {
      out.write((Seq(Magic, idx.cols.mkString(","), idx.expectedItems.toString,
        idx.fpp.toString).mkString("\t") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.write(idx.bytes)
    } finally out.close()
    fs.delete(dst, false)
    require(fs.rename(tmp, dst), s"bloom index: cannot promote $tmp to $dst")
  }

  def delete(fs: FileSystem, dsPath: String): Boolean =
    fs.delete(sidecar(dsPath), false)

  private def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Filter over `df`'s key hashes at the GIVEN layout parameters
    * (distributed treeAggregate — no driver materialization of keys). */
  def fromBatch(df: DataFrame, cols: Seq[String],
      expectedItems: Long, fpp: Double): BloomFilter =
    df.select(keyHash(cols).as("__h")).stat.bloomFilter("__h", expectedItems, fpp)

  /** Build (or resize) the sidecar from the dataset's current rows.
    * `expectedItems` defaults to 4× the current count — headroom for
    * subsequent batch merges before fpp degrades. */
  def build(spark: SparkSession, ds: GraftDataset, cols: Seq[String],
      expectedItems: Option[Long] = None, fpp: Double = DefaultFpp): Index = {
    val df = ds.raw(spark)
    val items = expectedItems.getOrElse(math.max(1L << 16, df.count() * 4))
    val idx = Index(cols, items, fpp, serialize(fromBatch(df, cols, items, fpp)))
    write(ds.fs(spark), ds.path, idx)
    idx
  }

  /** Merge a written batch's keys into an index (same layout params →
    * mergeable), returning the updated index. Deserializes a FRESH
    * filter — `idx.bloom` is cached and mergeInPlace mutates. */
  def merged(idx: Index, batch: DataFrame): Index = {
    val bf = BloomFilter.readFrom(new ByteArrayInputStream(idx.bytes))
    bf.mergeInPlace(fromBatch(batch, idx.cols, idx.expectedItems, idx.fpp))
    idx.copy(bytes = serialize(bf))
  }

  /** The membership probe column for `df`'s rows against `idx`. */
  def mightContain(spark: SparkSession, idx: Index): Column =
    graft.plans.GraftExpressions.bloomContains(spark, keyHash(idx.cols), idx.bytes)
}

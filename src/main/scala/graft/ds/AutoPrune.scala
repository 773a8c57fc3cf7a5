package graft.ds

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Automatic stats-index file skipping for PLAIN Spark reads — SQL
  * passthrough included. [[GraftDataset.pruned]] gives the graft API
  * file skipping, but a user who registers a graft dataset as a SQL
  * table (`spark.read.parquet(path).createOrReplaceTempView(...)`) and
  * queries it with `spark.sql` bypasses that call site entirely. This
  * module closes the gap the way Delta Lake closes it: a delegating
  * [[FileIndex]] that re-uses the filters Catalyst ALREADY pushes to
  * the scan. `FileSourceScanExec.selectedPartitions` hands the pushed
  * data filters to `FileIndex.listFiles(partitionFilters, dataFilters)`
  * — the standard engine seam for format-owned file skipping — so the
  * wrapper compiles those resolved expressions through
  * [[StatsIndex.compile]] and drops every file whose recorded ranges
  * prove it cannot match. No query rewrite, no new operator: partition
  * pruning runs first (the underlying index applies partitionFilters),
  * stats pruning composes after it, and the untouched scan still
  * applies the full predicate to whatever survives — the same
  * superset-safety argument as every other StatsIndex consumer.
  *
  * Two ways in, same [[StatsPruneRule]]:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session
  *    build — ONE extensions class ships the custom functions AND this
  *    rule (the zero-code-change path for a cluster-wide deployment;
  *    injected post-hoc-resolution, the analyzer's run-once batch, so
  *    the sidecar `exists` probe is paid once per query);
  *  - [[AutoPrune.enable]] on a live session (adds the rule to
  *    `experimental.extraOptimizations` — the REPL/notebook path).
  *
  * Cost model, spelled out because the rule sees EVERY file relation in
  * every plan: relations are wrapped only when their single root
  * carries a `_stats_index` sidecar — one driver-side `exists` RPC per
  * unwrapped file relation per rule pass (the analyzer injection runs
  * once; the experimental batch converges in two passes because wrapped
  * relations are skipped). A wrapped scan then pays one sidecar read
  * in `listFiles` through [[StatsIndex.loadCached]] — an unchanged
  * root/segment file revalidates by (mtime, length) for the cost of a
  * `getFileStatus`, and writes invalidate naturally (fresh segment
  * names, changed root stamp). At 100 TB those driver RPCs buy
  * removing thousands of files from the scan before listing,
  * scheduling, or footer IO happens. */
object AutoPrune {

  /** Install [[StatsPruneRule]] on a live session (idempotent). */
  def enable(spark: SparkSession): Unit = {
    val already = spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[StatsPruneRule])
    if (!already)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ StatsPruneRule(spark)
  }
}

/** Swaps a [[StatsPrunedFileIndex]] into every [[HadoopFsRelation]]
  * whose governing dataset directory carries a stats sidecar. Pure
  * metadata rewrite — output attributes, schema, and semantics are
  * untouched, so it is safe at any plan phase.
  *
  * Root resolution: a single-root relation's root IS the dataset dir
  * (the common `spark.read.parquet(dir)` shape). A MULTI-root relation
  * is an explicit file list — [[GraftDataset.dfUnified]]'s per-schema-
  * group reads are the in-house producer — whose dataset dir is the
  * deepest common ancestor of the roots; if that dir carries the
  * sidecar, the same wrapper applies (sidecar keys are dataset-dir-
  * relative, so pruning is root-shape-agnostic). A union of unrelated
  * dirs resolves to some ancestor WITHOUT a sidecar and is left alone,
  * and the ancestor fold is O(distinct parent dirs), not O(files). */
case class StatsPruneRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case l: LogicalRelation =>
      l.relation match {
        case r: HadoopFsRelation if !r.location.isInstanceOf[StatsPrunedFileIndex]
            && r.location.rootPaths.nonEmpty =>
          val hconf = spark.sessionState.newHadoopConf()
          val root0 = StatsPruneRule.datasetRootOf(r.location.rootPaths)
          def sidecarAt(rt: Path): Boolean =
            try rt.getFileSystem(hconf).exists(StatsIndex.sidecar(rt.toString))
            catch { case scala.util.control.NonFatal(_) => false }
          // a single root can be a FILE (a one-file schema group from
          // dfUnified, or spark.read.parquet(file)) — its dataset dir
          // is the parent, same as the multi-root ancestor fold. Only
          // the sidecar-miss path pays the extra isFile RPC, and only
          // a root PROVEN to be a file retries the parent (a partition
          // subdir read must not silently adopt the whole dataset's
          // sidecar — its keys wouldn't match the listing anyway).
          val root = root0.filter(sidecarAt).orElse(root0.flatMap { rt =>
            val parent = rt.getParent
            if (parent == null) None
            else {
              val isFile =
                try rt.getFileSystem(hconf).getFileStatus(rt).isFile
                catch { case scala.util.control.NonFatal(_) => false }
              if (isFile && sidecarAt(parent)) Some(parent) else None
            }
          })
          root match {
            case None => l
            case Some(rt) => l.copy(relation =
              r.copy(location = new StatsPrunedFileIndex(r.location, rt, hconf))(
                r.sparkSession))
          }
        case _ => l
      }
  }
}

object StatsPruneRule {
  /** The dataset directory governing a relation's roots: the single
    * root itself, or the deepest common ancestor of an explicit
    * file-list's PARENTS. Cost honesty: every root pays one getParent
    * (unavoidable — O(roots) cheap driver work per rule invocation on
    * the relation, ~tens of ms at a million files), but the ancestor
    * FOLD runs over the distinct parent set only — a hive layout has
    * few distinct leaf dirs however many files it holds. */
  private[ds] def datasetRootOf(roots: Seq[Path]): Option[Path] =
    if (roots.sizeIs == 1) Some(roots.head)
    else {
      def common(a: Path, b: Path): Path = {
        val as = a.toString.split('/')
        val bs = b.toString.split('/')
        val n = as.zip(bs).takeWhile { case (x, y) => x == y }.length
        if (n == 0) null else new Path(as.take(n).mkString("/"))
      }
      try {
        // single pass, no intermediate per-file collection: parents
        // dedup into a small set as they stream by
        val parents = scala.collection.mutable.LinkedHashSet.empty[Path]
        roots.foreach { r => val p = r.getParent; if (p != null) parents += p }
        if (parents.isEmpty) None
        else Option(parents.reduce { (a, b) =>
          if (a == null || b == null) null else common(a, b)
        })
      } catch { case scala.util.control.NonFatal(_) => None }
    }
}

/** A [[FileIndex]] that delegates listing to `underlying`, then drops
  * files the root's `_stats_index` sidecar proves cannot satisfy the
  * pushed data filters. Multiple filters arrive as implicit conjuncts
  * (Catalyst splits the WHERE into `dataFilters`), so a file survives
  * only if EVERY compiled test keeps it — and any filter the compiler
  * does not understand simply contributes no test (the AND-drop rule of
  * [[StatsIndex.compile]]'s conservatism algebra, applied across the
  * sequence). Files without an index entry always survive.
  *
  * `sizeInBytes` intentionally reports the UNPRUNED size: it feeds join
  * strategy choices (broadcast thresholds) at a point where the actual
  * file selection may not be known yet, and over-estimating can only
  * cost a missed broadcast, never an OOM. Driver-only object, like
  * every [[FileIndex]] (`FileSourceScanExec` holds its relation
  * transiently). */
final class StatsPrunedFileIndex(
    private val underlying: FileIndex, root: Path, hconf: Configuration) extends FileIndex {

  override def rootPaths: Seq[Path] = underlying.rootPaths
  override def inputFiles: Array[String] = underlying.inputFiles
  override def refresh(): Unit = underlying.refresh()
  override def sizeInBytes: Long = underlying.sizeInBytes
  override def partitionSchema: StructType = underlying.partitionSchema

  // CacheManager and sameResult compare relations with equals():
  // HadoopFsRelation (a case class) recurses into its FileIndex, and
  // InMemoryFileIndex compares by root paths. Without a matching
  // override here the wrapper compares by object identity, so with the
  // rule enabled a second read of a cached sidecar-bearing path builds
  // a NEW wrapper instance and silently misses df.cache() — the
  // wrapper must be exactly as equal as what it wraps. Pruning state
  // is NOT part of identity: the sidecar only changes which files the
  // scan lists, never the relation's logical result.
  override def equals(other: Any): Boolean = other match {
    case o: StatsPrunedFileIndex => underlying == o.underlying
    case _ => false
  }
  override def hashCode(): Int = underlying.hashCode()

  override def listFiles(
      partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[PartitionDirectory] = {
    val base = underlying.listFiles(partitionFilters, dataFilters)
    if (dataFilters.isEmpty) return base
    val fs = root.getFileSystem(hconf)
    StatsIndex.loadCached(fs, root.toString) match {
      case None => base // sidecar vanished/corrupt since wrap: no pruning
      case Some(idx) =>
        val tests = dataFilters.flatMap(StatsIndex.compile)
        if (tests.isEmpty) base
        else {
          // qualify the root once; per-file keys are sidecar-relative
          val qr = fs.makeQualified(root).toString + "/"
          base.map { pd =>
            pd.copy(files = pd.files.filter { f =>
              idx.files.get(fs.makeQualified(f.getPath).toString.stripPrefix(qr)) match {
                case None => true // unindexed file: never pruned
                case Some(byCol) => tests.forall(t => t(byCol))
              }
            })
          }
        }
    }
  }
}

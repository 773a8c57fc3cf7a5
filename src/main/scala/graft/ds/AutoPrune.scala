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

/** Swaps a [[StatsPrunedFileIndex]] into every single-root
  * [[HadoopFsRelation]] whose root directory carries a stats sidecar.
  * Pure metadata rewrite — output attributes, schema, and semantics are
  * untouched, so it is safe at any plan phase. Multi-root relations
  * (explicit file lists, unioned schema-group reads) are left alone:
  * their roots are FILES, not dataset directories, and the graft API
  * already prunes those through [[GraftDataset.pruned]]. */
case class StatsPruneRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case l: LogicalRelation =>
      l.relation match {
        case r: HadoopFsRelation if !r.location.isInstanceOf[StatsPrunedFileIndex]
            && r.location.rootPaths.sizeIs == 1 =>
          val root = r.location.rootPaths.head
          val hconf = spark.sessionState.newHadoopConf()
          val hasSidecar =
            try root.getFileSystem(hconf).exists(StatsIndex.sidecar(root.toString))
            catch { case scala.util.control.NonFatal(_) => false }
          if (!hasSidecar) l
          else l.copy(relation =
            r.copy(location = new StatsPrunedFileIndex(r.location, root, hconf))(
              r.sparkSession))
        case _ => l
      }
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
    underlying: FileIndex, root: Path, hconf: Configuration) extends FileIndex {

  override def rootPaths: Seq[Path] = underlying.rootPaths
  override def inputFiles: Array[String] = underlying.inputFiles
  override def refresh(): Unit = underlying.refresh()
  override def sizeInBytes: Long = underlying.sizeInBytes
  override def partitionSchema: StructType = underlying.partitionSchema

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

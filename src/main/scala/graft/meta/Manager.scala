package graft.meta

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Toml
import graft.ds.GraftDataset

/** Lake catalog (reference `datalake/manager.py:16-209`): a `_graft.toml`
  * at the lake root listing registered datasets, plus discovery by
  * globbing for `_dataset.toml` markers. Each dataset registers as a
  * Spark temp view so the whole lake is queryable through `spark.sql`
  * (the reference shares one DuckDB connection across readers —
  * `datalake/reader.py`; one SparkSession plays that role here).
  */
final class Manager(spark: SparkSession, lakeRoot: String) {
  private val rootPath = new Path(lakeRoot)
  private def fs: FileSystem = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  val configPath = new Path(rootPath, "_graft.toml")

  def readConfig(): Toml.Tbl =
    if (!fs.exists(configPath)) Toml.Tbl.empty
    else {
      val in = fs.open(configPath)
      try Toml.parse(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }

  private def writeConfig(t: Toml.Tbl): Unit = {
    fs.mkdirs(rootPath)
    val out = fs.create(configPath, true)
    try out.write(Toml.render(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def init(name: String): Unit = {
    val cfg = readConfig()
    writeConfig(Toml.Tbl(cfg.v
      .updated("graft", Toml.Tbl(
        "name" -> Toml.Str(name),
        "path" -> Toml.Str(lakeRoot),
        "init" -> Toml.Str(java.time.Instant.now().toString)))
      .updated("dataset", cfg.v.getOrElse("dataset", Toml.Tbl.empty))))
  }

  /** Register a dataset under a catalog name (`manager.py:175-180`).
    * `clusterBy` records the dataset's write-time clustering contract
    * in the catalog so maintenance sweeps (which load datasets by name,
    * not through the writer that knew the key) preserve the layout. */
  def addDataset(name: String, path: String, format: String = "parquet",
      clusterBy: Seq[String] = Nil): Unit = {
    val cfg = readConfig()
    val ds = Toml.getTbl(cfg, "dataset").getOrElse(Toml.Tbl.empty)
    val entry = Seq("path" -> (Toml.Str(path): Toml.Value),
      "format" -> (Toml.Str(format): Toml.Value)) ++
      (if (clusterBy.isEmpty) Nil
       else Seq("cluster_by" -> (Toml.Arr(clusterBy.map(Toml.Str)): Toml.Value)))
    writeConfig(Toml.Tbl(cfg.v.updated("dataset",
      Toml.Tbl(ds.v.updated(name, Toml.Tbl(entry: _*))))))
  }

  def removeDataset(name: String): Unit = {
    val cfg = readConfig()
    val ds = Toml.getTbl(cfg, "dataset").getOrElse(Toml.Tbl.empty)
    writeConfig(Toml.Tbl(cfg.v.updated("dataset", Toml.Tbl(ds.v - name))))
  }

  def datasets(): Map[String, (String, String)] =
    Toml.getTbl(readConfig(), "dataset").map(_.v.collect {
      case (name, t: Toml.Tbl) =>
        name -> (Toml.getStr(t, "path").getOrElse(""), Toml.getStr(t, "format").getOrElse("parquet"))
    }.toMap).getOrElse(Map.empty)

  /** Discover datasets by `_dataset.toml` markers under the lake root
    * (`manager.py:91-114`) and register them into the catalog.
    *
    * Additive only: a name already in the catalog keeps its existing
    * entry untouched — re-registering would rebuild it with default
    * format and EMPTY cluster_by, wiping the clustering contract the
    * catalog exists to preserve. Basename collisions (teamA/data and
    * teamB/data) get a disambiguated name instead of silently
    * overwriting each other. */
  def discover(): Seq[String] = {
    val found = scala.collection.mutable.ArrayBuffer.empty[String]
    if (!fs.exists(rootPath)) return Nil
    val registered = scala.collection.mutable.Map.empty[String, String] ++
      datasets().map { case (n, (p, _)) => n -> p }
    // listStatus walk on hierarchical filesystems (flat LIST on object
    // stores) — a lake root with thousands of data files per dataset
    // pays super-linear per-file re-stats under listFiles(recursive)
    // on LocalFileSystem (see graft.core.FsListing). STREAMING variant:
    // scanning a million-file lake for a handful of _dataset.toml
    // markers must not materialize the full listing in driver memory —
    // the iterator holds one directory batch / LIST page at a time.
    val it = graft.core.FsListing.iterFiles(fs, rootPath)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName == "_dataset.toml") {
        val dsRoot = st.getPath.getParent
        val base = dsRoot.getName
        registered.find(_._2 == dsRoot.toString) match {
          case Some((name, _)) => found += name // already cataloged, keep its entry
          case None =>
            val name = if (!registered.contains(base)) base
              else Iterator.from(2).map(i => s"$base-$i")
                .find(!registered.contains(_)).get
            addDataset(name, dsRoot.toString)
            registered += name -> dsRoot.toString
            found += name
        }
      }
    }
    found.toSeq
  }

  /** The catalog entry for one dataset — the ONE shared parse every
    * per-name accessor goes through (one readConfig per call; callers
    * needing several fields read the Tbl once). */
  private def datasetEntry(name: String): Option[Toml.Tbl] = for {
    ds <- Toml.getTbl(readConfig(), "dataset")
    t <- Toml.getTbl(ds, name)
  } yield t

  /** The recorded clustering contract for a catalog dataset (empty if
    * none was registered). */
  def datasetClusterBy(name: String): Seq[String] =
    datasetEntry(name).map(Toml.getArr(_, "cluster_by")).getOrElse(Nil)

  /** Load a registered dataset (TimeFly-managed roots read `current/`).
    * ONE config read: path, format and cluster_by all come from the
    * same parsed Tbl — registerAll/compactAll call this per catalog
    * dataset, and on an object store every extra readConfig is a GET
    * round-trip multiplied by the sweep. */
  def load(name: String): GraftDataset = {
    val t = datasetEntry(name).getOrElse(
      throw new NoSuchElementException(s"dataset $name not in catalog"))
    val path = Toml.getStr(t, "path").getOrElse("")
    val format = Toml.getStr(t, "format").getOrElse("parquet")
    val cluster = Toml.getArr(t, "cluster_by")
    val cur = new Path(path, "current")
    if (fs.exists(new Path(path, "_dataset.toml")) && fs.exists(cur))
      GraftDataset(cur.toString, format = format, clusterBy = cluster)
    else GraftDataset(path, format = format, clusterBy = cluster)
  }

  /** Register every catalog dataset as a temp view; returns view names. */
  def registerAll(): Seq[String] =
    datasets().keys.toSeq.sorted.map { name =>
      load(name).register(spark, name); name
    }

  def table(name: String): DataFrame = load(name).df(spark)

  /** Lake-wide maintenance sweep: compact every catalog dataset's
    * small files ([[graft.ds.Repartition.compact]]) and vacuum its
    * crashed-rewrite leftovers. Planning per dataset is FS metadata
    * only, so a sweep over a large catalog costs one rewrite job per
    * FRAGMENTED dataset and nothing for healthy ones. Partitioning is
    * read from each dataset's own layout: hive `col=value` dirs under
    * the root are detected and compacted partition-scoped. Returns
    * per-dataset stats, in catalog order, and persists them under
    * `[maintenance]` in the lake config so operators can see when each
    * dataset was last swept and what it cost without re-listing
    * anything (the reference records nothing; at 100 TB "when did
    * maintenance last run here" must not require an FS walk). */
  def compactAll(targetFileBytes: Long = 128L * 1024 * 1024)
      : Seq[(String, graft.ds.Repartition.CompactStats)] = {
    val results = datasets().keys.toSeq.sorted.map { name =>
      val ds = load(name)
      // every FS op below runs on the DATASET's own FileSystem — a
      // catalog may register datasets under a different scheme than the
      // lake root (hdfs:// root, s3a:// dataset), and the root fs would
      // throw 'Wrong FS' on their paths
      val dsFs = ds.fs(spark)
      // vacuum FIRST: leftover swap backups contain '=' and would
      // otherwise pollute the layout inference below
      val vacuumed = ds.vacuum(spark)
      // infer the hive `col=value` chain from the directory tree —
      // compact needs depth and column names to find leaf dirs. Hidden
      // ("."/"_") dirs are never partitions.
      def partDirs(p: Path) = dsFs.listStatus(p).filter { st =>
        val n = st.getPath.getName
        st.isDirectory && n.contains("=") && !n.startsWith(".") && !n.startsWith("_")
      }
      val names = Iterator.iterate(Option(new Path(ds.path))) {
        case Some(p) => partDirs(p).headOption.map(_.getPath)
        case None => None
      }.drop(1).takeWhile(_.isDefined).flatten
        .map(_.getName.takeWhile(_ != '=')).toSeq
      val shaped = if (names.isEmpty) ds else ds.copy(partitioning = names)
      (name, graft.ds.Repartition.compact(spark, shaped, targetFileBytes),
        vacuumed.size, ds.path, dsFs)
    }
    val sweptAt = java.time.Instant.now().toString
    val cfg = readConfig()
    val maint = Toml.getTbl(cfg, "maintenance").getOrElse(Toml.Tbl.empty)
    // per-dataset stats live under their own `dataset` sub-table so a
    // dataset NAMED like a summary key (e.g. "last_sweep") can't collide
    val prevDs = Toml.getTbl(maint, "dataset").getOrElse(Toml.Tbl.empty)
    val dsTbl = results.foldLeft(prevDs.v) { case (m, (name, st, vac, dsPath, dsFs)) =>
      // lock pressure: CROSS-PROCESS counters for the dataset's lock —
      // every writer process flushes its contention into the lock-stats
      // sidecar on release, so a contended lake shows up as
      // waited-ms/steals here even when the ingest writers are separate
      // JVMs from the sweeping one. Path and fs ride from the sweep
      // loop — re-load()ing here would repeat a config GET per dataset
      val lk = graft.ds.DatasetLock.combinedStats(dsFs, new Path(dsPath))
      m.updated(name, Toml.Tbl(
        "swept_at" -> Toml.Str(sweptAt),
        "partitions_compacted" -> Toml.Int64(st.partitionsCompacted.toLong),
        "files_before" -> Toml.Int64(st.filesBefore),
        "files_after" -> Toml.Int64(st.filesAfter),
        "vacuumed_paths" -> Toml.Int64(vac.toLong),
        "lock_acquires" -> Toml.Int64(lk.acquires),
        "lock_contended" -> Toml.Int64(lk.contended),
        "lock_waited_ms" -> Toml.Int64(lk.waitedMs),
        "lock_steals" -> Toml.Int64(lk.steals),
        "lock_timeouts" -> Toml.Int64(lk.timeouts)))
    }
    writeConfig(Toml.Tbl(cfg.v.updated("maintenance", Toml.Tbl(maint.v
      .updated("last_sweep", Toml.Str(sweptAt): Toml.Value)
      .updated("dataset", Toml.Tbl(dsTbl): Toml.Value)))))
    results.map { case (name, st, _, _, _) => name -> st }
  }

  /** The persisted `[maintenance]` section (empty table before the
    * first sweep): `last_sweep` plus a `dataset` sub-table with
    * per-dataset swept_at / partitions_compacted / files_before /
    * files_after / vacuumed_paths and the lock-pressure counters
    * lock_acquires / lock_contended / lock_waited_ms / lock_steals /
    * lock_timeouts (combined across every writer process that released
    * the lock, plus the sweeping JVM's unflushed remainder — see
    * [[graft.ds.DatasetLock.combinedStats]]). */
  def maintenanceInfo(): Toml.Tbl =
    Toml.getTbl(readConfig(), "maintenance").getOrElse(Toml.Tbl.empty)
}

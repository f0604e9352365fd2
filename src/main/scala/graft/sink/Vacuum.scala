package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VACUUM — lakehouse garbage collection, the write family's missing
  * last rung (append → compact q210 → targeted delete q231 → merge
  * q233 → TRUNCATE/overwrite → vacuum): delete from a table directory
  * every file the table's manifest does not reference. Aborted jobs,
  * killed executors, and crashed swaps leave three classes of garbage
  * behind, with very different hazard profiles:
  *
  *  - **orphan `part-*.parquet` data files** (an aborted job's output
  *    that was moved into place but never committed to the manifest) —
  *    the CORRECTNESS hazard: a plain directory read
  *    (`spark.read.parquet(dir)`) lists them like any live file and
  *    silently double-counts, which is exactly what the graded q250
  *    read proves vacuum repairs;
  *  - **dot-prefixed swap artifacts** (`.x.staged` temp dirs,
  *    `.x.bak` backups from [[TargetedDelete]]/[[MergeInto]] crashes)
  *    and **`_temporary` job-attempt trees** — invisible to Spark's
  *    listing (leading `.`/`_` paths are filtered), so a pure STORAGE
  *    leak, but at 100 TB a leak that compounds per failed job;
  *  - **`.bak` files whose original is MISSING** — NOT garbage: that
  *    is a crash captured mid-swap, and the backup is the only copy of
  *    the file's surviving rows. Vacuum runs [[TargetedDelete.recover]]
  *    FIRST, so the backup heals back into a live file before any
  *    sweeping decision is made — a vacuum that swept backups before
  *    healing would turn a recoverable crash into data loss.
  *
  * The manifest (q220's stats manifest doubling as the commit
  * metadata — one row per live file) is read driver-side: file-count-
  * sized by construction, the same metadata-scale argument as
  * [[Manifest.prunedFiles]]. The sweep itself is a driver loop over
  * ONE directory listing — at 100 TB both are ~10⁵ entries, never a
  * data-sized job.
  *
  * Safety contract (the classic vacuum disaster is pointing it at the
  * wrong manifest and deleting the whole table): sweep REFUSES unless
  * at least one manifest entry resolves to an existing file in the
  * directory, and refuses if any manifest entry is missing — both
  * states mean the manifest does not describe this directory, and
  * deleting anything under a mismatched manifest is unrecoverable.
  * Retention-window deferral (delete only garbage older than N hours,
  * for readers mid-flight on a stale listing) is a production knob
  * deliberately not modeled here: local fixtures have no concurrent
  * readers, and the decision logic it would gate is the line below
  * marked `orphan`.
  */
object Vacuum {

  final case class VacuumReport(filesLive: Int, orphansDeleted: Int,
                                artifactsDeleted: Int, backupsHealed: Int)

  /** Sweeps `path`, keeping exactly the files `manifestPath` references
    * (by basename — the manifest stores full `input_file_name()` URIs)
    * plus job markers (`_SUCCESS`). Heals crash artifacts BEFORE
    * deciding anything, then deletes orphan data files, stale swap
    * artifacts, and `_temporary` trees. Idempotent: a second sweep
    * finds nothing to do. */
  def sweep(spark: SparkSession, path: String,
            manifestPath: String): VacuumReport = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())

    // 1. heal: a .bak without its original is a mid-swap crash — the
    //    backup must become live again before the sweep classifies it
    val preBak = fs.listStatus(dir).count { st =>
      val n = st.getPath.getName
      n.startsWith(".") && n.endsWith(".bak") &&
        !fs.exists(new Path(dir, n.drop(1).dropRight(4)))
    }
    TargetedDelete.recover(fs, dir)

    val live = spark.read.parquet(manifestPath)
      .select("file").collect()
      .map(r => new Path(r.getString(0)).getName).toSet
    require(live.nonEmpty, s"vacuum: manifest at $manifestPath lists no files")

    val entries = fs.listStatus(dir)
    val present = entries.map(_.getPath.getName).toSet
    val missing = live.filterNot(present)
    require(missing.isEmpty,
      s"vacuum: manifest references files absent from $path " +
        s"(${missing.take(3).mkString(", ")}…) — wrong manifest? refusing to sweep")

    var orphans = 0
    var artifacts = 0
    var kept = 0
    entries.foreach { st =>
      val name = st.getPath.getName
      if (live.contains(name)) kept += 1
      else if (name == "_SUCCESS") () // job marker, harmless and cheap
      else if (name.startsWith(".") || name.startsWith("_")) {
        // swap artifacts / job-attempt trees: invisible to reads, a
        // storage leak only (recover() already consumed any live .bak)
        fs.delete(st.getPath, true)
        artifacts += 1
      } else {
        // orphan: a read-visible data file the manifest never committed
        fs.delete(st.getPath, true)
        orphans += 1
      }
    }
    VacuumReport(kept, orphans, artifacts, preBak)
  }

  // ---- q250 fixture + graded query ----------------------------------

  private val OrphanMod = 37L

  /** Built once per (JVM, dataset): orders clustered into 16 files with
    * a manifest, then THREE garbage classes injected — an orphan data
    * file re-publishing every `o_orderkey ≡ 0 (mod 37)` row (an aborted
    * job's moved-but-uncommitted output; a directory read double-counts
    * these rows until vacuum runs), a stale `.staged` dir, and a
    * `_temporary` attempt tree — and swept. The graded query reads the
    * post-vacuum DIRECTORY; the oracle recomputes from the raw table,
    * so a hash match proves the sweep removed ALL read-visible garbage
    * and not one live row (the q231 output-vs-raw discipline pointed at
    * GC). VacuumSpec additionally pins what the aggregate cannot see:
    * the pre-vacuum read genuinely differed, live files stayed
    * byte-identical, hidden artifacts are gone, replay is a no-op, and
    * both safety guards refuse. */
  private[sink] def ensureVacuumedOrders(s: SparkSession,
                                         dir: String): (String, String) =
    ScratchExport.once(s"vacuum:$dir") {
      val out = ScratchExport.scratchDir("graft-vacuum-")
      val orders = graft.ops.T(s, dir, "orders")
      ClusteredWrite.parquet(orders, out, 16, col("o_orderkey"))
      val man = ScratchExport.scratchDir("graft-vacuum-man-")
      s.read.parquet(out)
        .groupBy(input_file_name().as("file"))
        .agg(min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"),
          count(lit(1)).as("n_rows"))
        .coalesce(1)
        .write.mode("overwrite").parquet(man)
      injectGarbage(s, out, orders.filter(col("o_orderkey") % OrphanMod === 0))
      sweep(s, out, man)
      (out, man)
    }

  /** Plants the three garbage classes into `tableDir`: the orphan rows
    * as a `part-…orphan….parquet` (renamed into place the way a
    * non-atomic committer's stray task output lands), one `.staged`
    * swap temp, one `_temporary` attempt tree. */
  private[sink] def injectGarbage(s: SparkSession, tableDir: String,
                                  orphanRows: DataFrame): Unit = {
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(s.sessionState.newHadoopConf())
    val tmp = ScratchExport.scratchDir("graft-vacuum-orphan-")
    orphanRows.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = fs.listStatus(new Path(tmp)).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"orphan write produced no file: $tmp"))
    require(fs.rename(part, new Path(dir, s"part-99999-orphan-${part.getName}")),
      "vacuum fixture: could not plant orphan file")
    fs.mkdirs(new Path(dir, ".part-00000.parquet.staged"))
    fs.create(new Path(dir, ".part-00000.parquet.staged/junk"), true).close()
    fs.mkdirs(new Path(dir, "_temporary/0"))
  }

  def q250Vacuum(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensureVacuumedOrders(s, dir)._1)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("sum_price_c2"))
      .orderBy("o_orderstatus")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q250_vacuum" -> q250Vacuum _,
  )

  val oracle: Map[String, String] = Map(
    // recomputed from the RAW table — the oracle never sees the
    // clustered copy, the planted garbage, or the sweep. If the orphan
    // file survived vacuum, the Spark side double-counts every
    // mod-37 key's row and the hash breaks.
    "q250_vacuum" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c2
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}

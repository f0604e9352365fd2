package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE INTO over a [[ClusteredWrite]] parquet table — the lakehouse
  * upsert (Delta/Iceberg `MERGE`): apply a compacted CDC batch of
  * last-state rows as matched-UPDATE / not-matched-INSERT /
  * tombstone-DELETE, rewriting ONLY the files the batch actually
  * touches. The most common warehouse write after append, and the
  * natural consumer of q183's compacted CDC log.
  *
  * Change-batch contract: `changes` carries every TABLE column plus an
  * `op` column — `'U'` (upsert: the row's new full image) or `'D'`
  * (tombstone) — at most ONE row per key (a raw multi-version log is
  * compacted first, exactly q183's max_by shape; enforced loudly).
  *
  * Routing: the clustered layout's footer ranges are read driver-side
  * (metadata-only, the same stats the scan planner prunes with) and
  * every change key routes to its FLOOR file — the file whose range
  * contains the key, or, for a key in a range gap / beyond the ends,
  * the nearest file below (first file for keys below everything).
  * Rows only ever join the file whose range already admits them, so
  * range-DISJOINTNESS survives every merge: a file's range can grow
  * into an empty gap but never across a neighbour's floor. A 'D' whose
  * key routes to a file that turns out not to hold it (min/max is a
  * bounding box, not membership) is a detected no-op; files with no
  * routed effect are left BYTE-identical.
  *
  * The per-file rewrite is [[TargetedDelete.swapStaged]]'s staged
  * temp + `.bak`-first atomic swap, and [[TargetedDelete.recover]]
  * heals any previous crash before new work starts; replaying the same
  * batch converges (ops are absolute row images, not deltas).
  *
  * Scale shape: the driver loop walks only the footer-pruned touched
  * set (at 100 TB: the files the batch hits, not the table); each
  * file's rewrite is one bounded job (the file plus its routed slice
  * of the broadcast-sized change batch). The floor lookup is a
  * codegen'd HOF over the sorted range-floor array — linear in file
  * count per change row, fine into the tens of thousands of files; a
  * deployment beyond that would swap in a binary-search expression
  * without touching the protocol. Bulk rewrites that touch most files
  * belong to a full re-cluster (q210's compact), not a merge. */
object MergeInto {

  final case class MergeReport(filesTotal: Int, filesAffected: Int,
                               filesRewritten: Int, rowsUpdated: Long,
                               rowsInserted: Long, rowsDeleted: Long)

  def merge(spark: SparkSession, path: String, keyCol: String,
            changes: DataFrame): MergeReport = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    TargetedDelete.recover(fs, dir)
    val files = fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
      .sortBy(_.getName)
    // footer ranges, ordered by lo — the routing table
    val ranged = files.flatMap { f =>
      TargetedDelete.keyRange(conf, f, keyCol) match {
        case Some((lo, hi)) => Some((f, lo, hi))
        case None =>
          // stat-less files: empty ones carry no keys and take no
          // routes; a non-empty stat-less file would break routing —
          // refuse loudly rather than merge wrong
          if (spark.read.parquet(f.toString).isEmpty) None
          else sys.error(s"merge: $f has rows but no $keyCol footer " +
            "stats — not a clustered table")
      }
    }.sortBy(_._2)
    require(ranged.nonEmpty, s"merge: no non-empty table files under $path")
    val tableCols = spark.read.parquet(ranged.head._1.toString).columns
    require(changes.columns.toSet == tableCols.toSet + "op",
      s"merge: change batch must carry ${tableCols.mkString(",")} + op, " +
        s"got ${changes.columns.mkString(",")}")
    require(changes.groupBy(keyCol).count().filter(col("count") > 1)
      .isEmpty, "merge: change batch has multiple ops for one key — " +
      "compact it first (q183's max_by shape)")

    // floor-file index per change key: #(lo <= key) - 1, clamped to 0
    val los = ranged.map(_._2)
    val routed = changes
      .withColumn("__fidx", greatest(lit(0),
        size(filter(lit(los), lo => lo <= col(keyCol))) - 1))
      .cache()
    try {
      val touched = routed.groupBy("__fidx")
        .agg(count(lit(1)).as("n"))
        .collect().map(_.getInt(0)).toSet // bounded by file count
      var rewritten = 0
      var updated = 0L
      var inserted = 0L
      var deleted = 0L
      touched.toSeq.sorted.foreach { i =>
        val f = ranged(i)._1
        val chg = routed.filter(col("__fidx") === i).drop("__fidx")
        val fileDf = spark.read.parquet(f.toString)
        val hit = fileDf.join(chg.select(col(keyCol), col("op")), keyCol)
          .groupBy("op").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val nUps = chg.filter(col("op") === "U").count()
        val delHits = hit.getOrElse("D", 0L)
        if (nUps > 0 || delHits > 0) {
          val survivors = fileDf
            .join(chg.select(keyCol), Seq(keyCol), "left_anti")
          val newRows = chg.filter(col("op") === "U")
            .select(tableCols.map(col).toSeq: _*)
          TargetedDelete.swapStaged(fs, f,
            survivors.select(tableCols.map(col).toSeq: _*)
              .unionByName(newRows)
              .coalesce(1)
              .sortWithinPartitions(keyCol))
          rewritten += 1
          val upsHit = hit.getOrElse("U", 0L)
          updated += upsHit
          inserted += nUps - upsHit
          deleted += delHits
        }
      }
      MergeReport(files.length, touched.size, rewritten,
        updated, inserted, deleted)
    } finally routed.unpersist()
  }
}

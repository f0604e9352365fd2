package graft.sink

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Targeted key deletion over a clustered parquet table — the
  * right-to-be-forgotten operation: remove every row of a set of keys
  * while rewriting ONLY the files whose parquet footer min/max range
  * can contain one of them. On a [[ClusteredWrite]] layout (disjoint
  * sorted key ranges per file) that is one or two files out of
  * thousands; every other file is left BYTE-IDENTICAL — at 100 TB the
  * difference between a surgical rewrite and re-materializing the
  * table (and untouched bytes are provably untouched, which is itself
  * part of the compliance story).
  *
  * Mechanics: footers are read driver-side (metadata-only, ~KB per
  * file — the same statistics the scan planner prunes with); each
  * affected file is filtered and rewritten IN PLACE via a staged
  * temp-file + atomic rename, preserving the file's name, sort order,
  * and range-disjointness (rows only leave, so the range can only
  * shrink). A file whose range matches but holds no actual target row
  * (min/max is a bounding box, not a membership proof) is detected and
  * left untouched. Driver loops over affected files only; at scale the
  * loop is the pruned set, not the table. */
object TargetedDelete {

  final case class DeleteReport(filesTotal: Int, filesAffected: Int,
                                filesRewritten: Int, rowsDeleted: Long)

  /** Deletes all rows with `keyCol` ∈ `keys` from the parquet table at
    * `path` (INT64 key column). */
  def deleteKeys(spark: SparkSession, path: String, keyCol: String,
                 keys: Seq[Long]): DeleteReport = {
    require(keys.nonEmpty, "no keys to delete")
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(conf)
    val files = fs.listStatus(new Path(path))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    val affected = files.filter { f =>
      keyRange(conf, f, keyCol) match {
        case Some((lo, hi)) => keys.exists(k => k >= lo && k <= hi)
        case None => true // no stats ⇒ cannot prove absence ⇒ candidate
      }
    }
    var rewritten = 0
    var deleted = 0L
    affected.foreach { f =>
      val df = spark.read.parquet(f.toString)
      val hits = df.filter(col(keyCol).isInCollection(keys)).count()
      if (hits > 0) {
        val staged = new Path(f.getParent, s".${f.getName}.staged")
        df.filter(!col(keyCol).isInCollection(keys))
          .coalesce(1)
          .sortWithinPartitions(keyCol)
          .write.mode("overwrite").parquet(staged.toString)
        val part = fs.listStatus(staged)
          .map(_.getPath)
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"staged rewrite produced no file: $staged"))
        fs.delete(f, false)
        fs.rename(part, f)
        fs.delete(staged, true)
        rewritten += 1
        deleted += hits
      }
    }
    DeleteReport(files.length, affected.length, rewritten, deleted)
  }

  /** The (min, max) footer statistics of an INT64 column across all row
    * groups of one parquet file; None when any row group lacks stats. */
  private def keyRange(conf: Configuration, file: Path,
                       keyCol: String): Option[(Long, Long)] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val ranges = reader.getFooter.getBlocks.asScala.toSeq.map { block =>
        block.getColumns.asScala
          .find(_.getPath.toDotString == keyCol)
          .map(_.getStatistics)
          .filter(st => st != null && st.hasNonNullValue)
          .map(st => (st.genericGetMin.asInstanceOf[Number].longValue(),
            st.genericGetMax.asInstanceOf[Number].longValue()))
      }
      if (ranges.isEmpty || ranges.exists(_.isEmpty)) None
      else Some((ranges.flatten.map(_._1).min, ranges.flatten.map(_._2).max))
    } finally reader.close()
  }
}

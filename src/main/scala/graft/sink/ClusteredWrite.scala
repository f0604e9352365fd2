package graft.sink

import org.apache.spark.sql.{Column, DataFrame}

/** Write-optimized clustered parquet layout — the write-side half of the
  * pushdown story.
  *
  * `repartitionByRange` + `sortWithinPartitions` on the cluster key
  * before writing gives every output file a disjoint, sorted key range,
  * so downstream scans with key predicates skip whole files and row
  * groups via parquet min/max statistics. At 100 TB this is the
  * difference between touching one file and touching all of them for a
  * point/range query — the local equivalent of bucketing without a
  * metastore dependency.
  */
object ClusteredWrite {

  /** Writes `df` as `numFiles` range-disjoint, internally sorted parquet
    * files clustered on `clusterCols`. */
  def parquet(df: DataFrame, path: String, numFiles: Int,
              clusterCols: Column*): Unit =
    df.repartitionByRange(numFiles, clusterCols: _*)
      .sortWithinPartitions(clusterCols: _*)
      .write.mode("overwrite").parquet(path)
}

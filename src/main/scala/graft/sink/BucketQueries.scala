package graft.sink

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.T

/** q110: the driver-visible query over the BUCKETED layout — the
  * bucket-pruning half of the storage story (q108 covers z-order
  * min/max skipping; [[BucketedTables]]' exchange-free joins are pinned
  * by BucketedJoinSpec/IndexedDedupSpec). An equality predicate on the
  * bucket key lets the scan skip whole buckets at PLANNING time —
  * `SelectedBucketsCount: k out of n` in the scan, no footer reads for
  * the other n−k — which at 100 TB turns a point lookup on a bucketed
  * fact table into reading 1/n of the files. The DuckDB oracle runs the
  * identical SQL on the RAW table, so the hash match proves the
  * bucketed rewrite preserved the table exactly.
  */
object BucketQueries {

  /** dataset dir → bucketed orders catalog table (built once per JVM). */
  private val built = TrieMap[String, String]()

  private val Buckets = 16

  /** Crash/race safety across sessions sharing a warehouse dir is the
    * [[BucketedTables.ensure]] protocol (complete-adopt /
    * incomplete-clear / staged atomic-rename build). */
  private[graft] def ensureBucketedOrders(s: SparkSession,
                                          dir: String): String =
    built.synchronized {
      built.getOrElseUpdate(dir, {
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_))
          .mkString
        BucketedTables.ensure(s, s"graft_orders_bucketed_$digest",
          T(s, dir, "orders"), Buckets, Seq("o_custkey"))
      })
    }

  /** q110: point lookups on the bucket key over the bucketed copy —
    * the murmur3 bucket hash routes each key to exactly one bucket, so
    * the scan plans `SelectedBucketsCount ≤ 2 out of 16`
    * (BucketPruneSpec pins it through this query path). */
  def q110BucketPrune(s: SparkSession, dir: String): DataFrame =
    s.table(ensureBucketedOrders(s, dir))
      .filter(col("o_custkey").isin(37L, 73L))
      .groupBy("o_custkey", "o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("o_totalprice")), 4).as("sum_price"))
      .orderBy("o_custkey", "o_orderstatus")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q110_bucket_prune" -> q110BucketPrune _,
  )

  /** Oracle over the RAW orders table — equality proves the bucketed
    * rewrite lost/duplicated nothing. */
  val oracle: Map[String, String] = Map(
    "q110_bucket_prune" ->
      """SELECT o_custkey, o_orderstatus,
        |       count(*) AS cnt,
        |       round(sum(o_totalprice), 4) AS sum_price
        |FROM orders
        |WHERE o_custkey IN (37, 73)
        |GROUP BY o_custkey, o_orderstatus
        |ORDER BY o_custkey, o_orderstatus""".stripMargin,
  )
}

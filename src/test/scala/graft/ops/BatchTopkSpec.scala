package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q148 (two-stage batched top-k) and q149 (epoch reshuffle): the
  * properties the oracle hash-match can't see.
  *
  * q148's claim is that salted partial top-k composes EXACTLY: any
  * global top-k row is top-k within its own salt cell, so pruning to
  * per-cell top-k before the final rank loses nothing. The spec checks
  * the two-stage result against the naive single-window formulation on
  * sf0.001 — not against the oracle (which shares the window shape),
  * but against a DIFFERENT Spark plan.
  *
  * q149's claims: a permutation (bijective positions), balanced
  * round-robin shards, determinism across runs, and key-order = the
  * brute-force md5 order. */
class BatchTopkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val Sf = SparkTestBase.Sf0001

  test("q148 two-stage top-k equals the naive single-window top-k") {
    import spark.implicits._
    val emb = T(spark, Sf, "embeddings")
    val qs = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val dot = graft.functions.VecDot.dot(col("embedding"), col("q_emb"))
    val na = graft.functions.VecDot.normSq(col("embedding"))
    val nb = graft.functions.VecDot.normSq(col("q_emb"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim_raw").desc, col("vec_id"))
    val naive = emb.filter(col("vec_id") >= 8)
      .crossJoin(broadcast(qs))
      .withColumn("sim_raw", dot / (sqrt(na) * sqrt(nb)))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("rk"), col("vec_id"),
        round(col("sim_raw"), 4).as("sim"))
      .orderBy("query_id", "rk")
      .as[(Long, Int, Long, Double)].collect().toSeq
    val staged = TrainingData.q148BatchTopk(spark, Sf)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(staged == naive)
    assert(staged.map(_._1).distinct.size == 8, "a query lost all hits")
  }

  test("q149 is a deterministic permutation with balanced shards in " +
    "brute-force md5 order") {
    import spark.implicits._
    val rows = TrainingData.q149EpochShuffle(spark, Sf)
      .as[(Long, Long, Long, Int)].collect().toSeq
    val n = rows.size
    assert(n > 0)
    assert(rows.map(_._3).toSet == (0L until n).toSet, "positions not a permutation")
    val shardSizes = rows.groupBy(_._4).view.mapValues(_.size).values.toSet
    assert(shardSizes.size <= 2 &&
      (shardSizes.max - shardSizes.min) <= 1, s"unbalanced shards: $shardSizes")
    // independent key derivation + order: md5 via java, first 12 hex → long
    def key(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"7:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map(b => f"$b%02x").mkString, 16)
    }
    val expectedOrder = rows.map(_._1).sortBy(id => (key(id), id))
    assert(rows.sortBy(_._3).map(_._1) == expectedOrder,
      "shuffle order diverges from brute-force md5 key order")
    assert(rows.forall(r => key(r._1) == r._2), "skey != independent md5")
    // determinism: a second evaluation yields the identical permutation
    val again = TrainingData.q149EpochShuffle(spark, Sf)
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(again == rows, "re-evaluation changed the permutation")
  }
}

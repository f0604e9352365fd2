package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q148 (batched top-k re-rank) and q149 (epoch reshuffle): the
  * properties the oracle hash-match can't see.
  *
  * q148 leans on Spark's `WindowGroupLimit` rewrite for its scale
  * story (every scan task pre-filters to its local top-k per query
  * BELOW the exchange, so partitionBy(query_id) never funnels the
  * corpus into Q tasks) — the spec pins that Partial stage in the
  * executed plan, and checks the result against a plain-Scala
  * brute force (a different formulation than the oracle's window).
  *
  * q149's claims: a permutation (bijective positions), balanced
  * round-robin shards, determinism across runs, and key-order = the
  * brute-force md5 order. */
class BatchTopkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val Sf = SparkTestBase.Sf0001

  test("q148 plans a Partial WindowGroupLimit below the exchange and " +
    "matches a plain-Scala brute-force top-3") {
    import spark.implicits._
    val df = TrainingData.q148BatchTopk(spark, Sf)
    val got = df.as[(Long, Int, Long, Double)].collect().toSeq
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") &&
      plan.contains("row_number(), 3, Partial"),
      s"the partial group-limit rewrite is the scale contract:\n$plan")

    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    // the r12 FixDot metric: integer dots on the 2^16 quantized grid
    def q(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 65536.0 + 0.5).toLong)
    def idot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val queries = emb.filter(_._1 < 8)
    val corpus = emb.filter(_._1 >= 8)
    val expected = queries.sortBy(_._1).toSeq.flatMap { case (qid, qv0) =>
      val qv = q(qv0)
      corpus.toSeq
        .map { case (vid, cv0) =>
          val cv = q(cv0)
          (vid, idot(cv, qv).toDouble /
            (math.sqrt(idot(cv, cv).toDouble) * math.sqrt(idot(qv, qv).toDouble)))
        }
        .sortBy { case (vid, s) => (-s, vid) }.take(3).zipWithIndex
        .map { case ((vid, s), i) =>
          // Spark round(_, 4) = HALF_UP on the decimal value — mirror it
          (qid, i + 1, vid, BigDecimal(s)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }
    assert(got == expected)
    assert(got.map(_._1).distinct.size == 8, "a query lost all hits")
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

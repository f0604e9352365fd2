package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The salted join must be a drop-in equivalent of the plain join —
  * same multiset of output rows — while spreading a hot key. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // 90% of the fact rows share key 1 (the pathological hot key)
  private def big = (1 to 2000).map { i =>
    (if (i % 10 == 0) (i % 7) + 2L else 1L, i.toLong)
  }.toDF("k", "payload")

  private def small = (1 to 10).map(i => (i.toLong, s"dim$i")).toDF("k", "name")

  test("salted join equals the plain join, duplicates included") {
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", r = 8)
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("hot key spreads across salt values") {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8L)))
    val spread = salted.filter(col("k") === 1L)
      .select("_salt").distinct().count()
    assert(spread >= 6, s"hot key landed on only $spread of 8 salts")
  }

  /** A q180-shaped histogram frame with the given hottest-key count. */
  private def hist(maxRows: Long) = Seq(
    (1, 10L, 20L, 2L), (5, 3L, maxRows + 10L, maxRows)
  ).toDF("bucket", "n_keys", "n_rows", "max_rows")

  test("r14 fanout decision: hottest-key rows over the task budget, " +
    "clamped, 1 on uniform keys — including on the REAL q180 output") {
    assert(SkewJoin.fanoutFrom(hist(999L), 1000L) == 1)   // fits one task
    assert(SkewJoin.fanoutFrom(hist(1000L), 1000L) == 1)  // exactly fits
    assert(SkewJoin.fanoutFrom(hist(1001L), 1000L) == 2)  // first flip
    assert(SkewJoin.fanoutFrom(hist(8000L), 1000L) == 8)
    assert(SkewJoin.fanoutFrom(hist(1000000L), 1000L) == 64) // clamp
    // empty histogram (empty/fully-filtered table): no rows = no skew
    assert(SkewJoin.fanoutFrom(hist(1L).limit(0), 1000L) == 1)
    // the graded q180 histogram over real orders: custkey is uniform at
    // this scale, so a sane budget must decide "don't salt"
    val real = Relational.q180KeySkew(spark, SparkTestBase.Sf0001)
    assert(SkewJoin.fanoutFrom(real, 1000L) == 1,
      "uniform custkey must not pay salting replication")
  }

  test("r14 decision flips the plan: a hot histogram salts (join on " +
    "(k, _salt), dimension replicated), a cool one runs the PLAIN " +
    "join — and both compute the identical multiset") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "name").as[(Long, Long, String)]
        .collect().sorted.toSeq
    val cool = SkewJoin.decidedInnerJoin(big, small, "k", hist(100L), 1000L)
    val hot = SkewJoin.decidedInnerJoin(big, small, "k", hist(8000L), 1000L)
    assert(!cool.queryExecution.optimizedPlan.toString.contains("_salt"),
      "cool side must be the plain join")
    val hotPlan = hot.queryExecution.optimizedPlan.toString
    // sequence(0, r-1) constant-folds to a literal array, so the
    // replication shows up as the Generate/explode node, not "sequence"
    assert(hotPlan.contains("_salt") && hotPlan.contains("explode"),
      s"hot side must salt + replicate:\n$hotPlan")
    assert(rows(cool) == rows(hot), "the decision must never change rows")
  }
}

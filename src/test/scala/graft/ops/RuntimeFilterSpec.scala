package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q198 (runtime Bloom-filter join pruning) beyond the DuckDB oracle.
  * The oracle proves the RESULT is the plain join's; a bloom that
  * admits every row would still pass it — so the spec checks the two
  * properties the oracle cannot see: no false negatives (the
  * correctness half of the filter contract) and real pruning at the
  * scan stage (the optimization half). */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  /** q198's literal nation (NATION_5) has suppliers at sf0.01/sf0.1 but
    * not at this suite's sf0.001, so the bloom-contract tests derive
    * their key set from a nation that is non-empty HERE — the contract
    * (no false negatives, bounded build, real pruning) is key-set
    * agnostic. */
  private lazy val dimKeys: Set[Long] = {
    val s = T(spark, dir, "supplier")
    val nk = s.groupBy("s_nationkey").count()
      .orderBy(col("count").desc, col("s_nationkey"))
      .first().getInt(0)
    s.filter(col("s_nationkey") === nk)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
  }

  private lazy val bits: Array[Long] = {
    val dim = T(spark, dir, "supplier")
      .filter(col("s_suppkey").isin(dimKeys.toSeq: _*))
      .select("s_suppkey")
    RuntimeFilter.buildBloom(dim, "s_suppkey")
  }

  test("no false negatives: every fact row whose key IS in the dimension " +
    "passes the bloom probe") {
    val fact = T(spark, dir, "lineitem").select("l_suppkey")
    val matching = fact.filter(col("l_suppkey").isin(dimKeys.toSeq: _*))
    val passedMatching = matching
      .filter(RuntimeFilter.mightContain(bits, col("l_suppkey")))
    assert(matching.count() == passedMatching.count())
    assert(matching.count() > 0, "degenerate fixture: no matching rows")
  }

  test("real pruning: the probe admits at most the exact matches plus a " +
    "2% FP allowance (theoretical FP ~0 at k=4, m=2^17, |keys| ≤ 10)") {
    val fact = T(spark, dir, "lineitem").select("l_suppkey")
    val total = fact.count()
    val passed =
      fact.filter(RuntimeFilter.mightContain(bits, col("l_suppkey"))).count()
    val exact = fact.filter(col("l_suppkey").isin(dimKeys.toSeq: _*)).count()
    assert(passed >= exact, s"false negatives: passed=$passed exact=$exact")
    // Bound derived from the MEASURED match count, not a fixed fraction
    // of the table: dimKeys is seed-dependent (largest nation at this
    // SF), so a regenerated fixture may legitimately match more rows —
    // what must stay tiny is the bloom's EXCESS over exact.
    assert(passed <= exact + total / 50,
      s"bloom admits too much: passed=$passed of $total (exact=$exact)")
  }

  test("build is bounded by m: the word array is the model constant size " +
    "and sets at most k bits per key") {
    assert(bits.length == RuntimeFilter.BloomBits / 64)
    val setBits = bits.map(java.lang.Long.bitCount).sum
    assert(setBits > 0 &&
      setBits <= dimKeys.size * RuntimeFilter.BloomHashes)
  }

  test("the bloom probe evaluates BELOW the join: the xxhash64 filter's " +
    "subtree is scan-only (no join feeds it)") {
    import org.apache.spark.sql.execution.FilterExec
    val df = RuntimeFilter.q198BloomPrune(spark, dir)
    val probes = df.queryExecution.sparkPlan.collect {
      case f: FilterExec if f.condition.toString.contains("xxhash64") => f
    }
    assert(probes.nonEmpty,
      s"no bloom-probe filter in the plan:\n${df.queryExecution.sparkPlan}")
    probes.foreach { f =>
      assert(!f.toString.contains("Join"),
        s"bloom probe is a post-join residual:\n$f")
    }
  }
}

package graft.sink

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.T

/** q173 ORC round trip: the rewrite preserves every row bit-exactly,
  * and the format change loses neither pushdown property — the
  * predicates reach the ORC scan's PushedFilters and the ReadSchema
  * narrows to the referenced columns. */
class OrcSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("round trip preserves rows bit-exactly") {
    val path = OrcQueries.ensureOrcLineitem(spark, SparkTestBase.Sf0001)
    val cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_returnflag", "l_linestatus", "l_shipdate")
    val back = spark.read.orc(path)
      .orderBy("l_orderkey", "l_linenumber")
      .select(cols.map(col): _*).collect()
    val raw = T(spark, SparkTestBase.Sf0001, "lineitem")
      .orderBy("l_orderkey", "l_linenumber")
      .select(cols.map(col): _*).collect()
    assert(back.length == raw.length && back.length > 0)
    assert(back.sameElements(raw))
  }

  test("predicates reach the ORC scan; ReadSchema narrows") {
    val df = OrcQueries.q173OrcRoundtrip(spark, SparkTestBase.Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_returnflag"), plan)
    assert(plan.contains("l_quantity"), plan)
    // projection pruning: the scan decodes only the referenced columns
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_shipdate"), readSchema)
    assert(!readSchema.contains("l_orderkey"), readSchema)
  }
}

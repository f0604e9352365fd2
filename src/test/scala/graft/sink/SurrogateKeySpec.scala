package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.T

/** q258 beyond the DuckDB oracle (which states the one-shot reference
  * assignment): the vault contracts the hash cannot see — density,
  * batch-1 STABILITY across the merge, idempotent re-merge, and the
  * incremental claim that merge 2 assigned exactly the new keys. */
class SurrogateKeySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  test("fresh vault: density, stability, idempotence, incrementality") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-skspec-").toString
    Seq.empty[(Long, Long)].toDF("nk", "sk")
      .write.mode("overwrite").parquet(out)
    val cust = T(spark, dir, "customer")
    val b1 = cust.filter(expr(s"${SurrogateKeys.TicketSql} < 8"))
      .select("c_custkey")
    val b2 = cust.filter(expr(s"${SurrogateKeys.TicketSql} >= 8"))
      .select("c_custkey")

    val n1 = SurrogateKeys.merge(spark, out, b1)
    assert(n1 == b1.count(), "merge 1 must assign every history key")
    val v1 = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v1.values.toSeq.sorted == (1L to n1).toSeq, "vault 1 not dense")

    val n2 = SurrogateKeys.merge(spark, out, b2)
    assert(n2 == b2.count(), "merge 2 must assign exactly the new keys")
    val v2 = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v2.values.toSeq.sorted == (1L to (n1 + n2)).toSeq, "vault 2 not dense")
    // STABILITY — the contract: no history key moved
    v1.foreach { case (k, sk) =>
      assert(v2(k) == sk, s"history key $k was reassigned")
    }
    // idempotence: re-merging a seen batch assigns nothing, vault intact
    assert(SurrogateKeys.merge(spark, out, b2) == 0L)
    val v3 = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v3 == v2)
  }

  test("q258 equals the one-shot reference assignment") {
    val got = graft.SparkEntry.queries("q258_surrogate_keys")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = T(spark, dir, "customer")
      .select(col("c_custkey"),
        expr(s"${SurrogateKeys.TicketSql} >= 8").as("b2"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
      .sortBy { case (k, b2) => (b2, k) }
      .zipWithIndex.map { case ((k, _), i) => (k, i + 1L) }
      .sortBy(_._1).toSeq
    assert(got == want)
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** IntersectCount must equal size(array_intersect(..)) on every
  * ascending-sorted distinct long-array input — the NgramSet output
  * contract the q78/q244 verify stage feeds it. */
class IntersectCountSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("matches size(array_intersect) on randomized sorted-distinct sets") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { _ =>
      def set() = Seq.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong)
        .distinct.sorted
      (set(), set())
    } :+ ((Seq.empty[Long], Seq.empty[Long])) :+
      ((Seq(1L, 2L, 3L), Seq.empty[Long]))
    // collection encoders declare containsNull=true; the expression
    // demands provably null-free arrays, so strip the flag the way a
    // caller with nullable-typed inputs would — array_compact
    val got = rows.toDF("a", "b")
      .select(
        IntersectCount.count(
          array_compact(col("a")), array_compact(col("b"))).as("ic"),
        size(array_intersect(col("a"), col("b"))).as("ai"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("null array yields null") {
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .select(IntersectCount.count(
        array_compact(col("a")), array_compact(col("b"))).as("ic"))
    assert(df.collect()(0).isNullAt(0))
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q188 token drift: exact-integer TVD basis points against a
  * driver-side BigInt recompute, the [0, 10⁴] bound, and the mover
  * selection (top-10 by exact cross-multiplied delta). */
class TokenDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("TVD and movers equal a driver-side BigInt recompute") {
    val dir = SparkTestBase.Sf0001
    val got = Corpus.q188TokenDrift(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.length == 10)

    val counts = scala.collection.mutable.Map
      .empty[String, (Long, Long)].withDefaultValue((0L, 0L))
    T(spark, dir, "documents").select("doc_id", "text").collect()
      .foreach { r =>
        val old = r.getLong(0) % 7 != 0
        r.getString(1).split(" ").filter(_.nonEmpty).foreach { w =>
          val (a, b) = counts(w)
          counts(w) = (if (old) a + 1 else a, b + 1)
        }
      }
    val na = BigInt(counts.values.map(_._1).sum)
    val nb = BigInt(counts.values.map(_._2).sum)
    def r4(num: BigInt, den: BigInt): Long =
      ((2 * num * 10000 + den) / (2 * den)).toLong
    val deltas = counts.toSeq.map { case (w, (a, b)) =>
      (w, a, b, (BigInt(a) * nb - BigInt(b) * na).abs)
    }
    val tvdBp = r4(deltas.map(_._4).sum, 2 * na * nb)
    assert(got.forall(_._5 == tvdBp), s"tvd_bp ${got.head._5} != $tvdBp")
    assert(tvdBp >= 0 && tvdBp <= 10000)

    val expected = deltas.sortBy { case (w, _, _, d) => (-d, w) }.take(10)
      .map { case (w, a, b, d) => (w, a, b, r4(d, na * nb)) }
      .sortBy { case (w, _, _, bp) => (-bp, w) }
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq == expected,
      "mover table diverged from the BigInt recompute")
  }

  test("identical snapshots drift 0 bp (the formula's fixed point)") {
    // every doc in both snapshots -> ca == cb, all deltas 0
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    // reuse the public query shape by recomputing directly: with
    // A == B, |ca*nb - cb*na| == 0 for every word, so TVD must be 0
    val counts = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("ca"), count(lit(1)).as("cb"))
    val Seq(na, nb) = counts.agg(sum("ca"), sum("cb")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long])
    val num = counts.select(
        abs(col("ca") * lit(nb) - col("cb") * lit(na)).as("d"))
      .agg(sum("d")).collect()(0).getLong(0)
    assert(num == 0L)
  }
}

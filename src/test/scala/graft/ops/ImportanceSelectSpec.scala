package graft.ops

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q172 importance selection: full driver-side brute force — bigram
  * bucketing, the exact-integer posterior odds table, document scores,
  * and the top-k cut — recomputed independently of every Spark
  * expression, then compared row-for-row. */
class ImportanceSelectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def bucket(bg: String): Int = {
    val d = MessageDigest.getInstance("MD5").digest(bg.getBytes("UTF-8"))
    java.lang.Byte.toUnsignedInt(d(0))
  }

  private lazy val docs =
    T(spark, SparkTestBase.Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  private def brute(): Seq[(Long, Long)] = {
    val perDoc = docs.map { case (id, text) =>
      val w = text.split(" ").filter(_.nonEmpty)
      val bgs = w.iterator.zip(w.iterator.drop(1))
        .map { case (a, b) => bucket(a + " " + b) }.toSeq
      id -> bgs.groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    }
    val t = new Array[Long](256); val r = new Array[Long](256)
    perDoc.foreach { case (id, m) =>
      m.foreach { case (b, c) =>
        if (id % 10 == 0) t(b) += c else r(b) += c
      }
    }
    val st = BigInt(t.sum); val sr = BigInt(r.sum)
    val q = (0 until 256).map { b =>
      val den = BigInt(t(b)) * sr + BigInt(r(b)) * st
      if (den == 0) 0L
      else (((BigInt(1) << 20) * BigInt(t(b)) * sr) / den).toLong
    }
    perDoc.filter(_._1 % 10 != 0)
      .map { case (id, m) =>
        id -> m.map { case (b, c) => c * q(b) }.sum
      }
      .sortBy { case (id, s) => (-s, id) }
      .take(100).toSeq
  }

  test("q172 equals the driver-side brute force, top-100 exact") {
    val got = Curation.q172ImportanceSelect(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = brute()
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("no target-slice doc is ever admitted; scores are non-negative") {
    val got = Curation.q172ImportanceSelect(spark, SparkTestBase.Sf0001)
      .collect()
    assert(got.forall(_.getLong(0) % 10 != 0))
    assert(got.forall(_.getLong(1) >= 0))
  }
}

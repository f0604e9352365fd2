package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q217 (leakage-safe group split) beyond the DuckDB oracle (which
  * re-clusters via the shared recursive CTE): a driver-side union-find
  * over the same candidate pairs, plus the properties the split exists
  * for — NO candidate pair straddles splits (the leakage invariant),
  * every document is assigned exactly once, and the counterfactual is
  * real: per-doc independent hashing (q89's scheme) WOULD have
  * straddled at least one near-dup pair that the group split keeps
  * together. */
class GroupSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private def bucket(seed: String, key: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$key".getBytes("UTF-8"))
    val hex = md.map("%02x".format(_)).mkString.take(12)
    java.lang.Long.parseLong(hex, 16) % 10
  }

  private def splitOf(b: Long): String =
    if (b < 8) "train" else if (b == 8) "val" else "test"

  private lazy val pairs: Seq[(Long, Long)] =
    TrainingData.minhashPairs(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  private lazy val got: Map[Long, (Long, String)] =
    Curation.q217GroupSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  test("q217 equals the driver-side union-find: min-id representative, " +
    "singleton = self, md5-ticket split on the representative") {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val docs = T(spark, dir, "documents").select("doc_id").collect()
      .map(_.getLong(0))
    assert(got.keySet == docs.toSet)
    docs.foreach { d =>
      val rep = find(d)
      val exp = (rep, splitOf(bucket("split", rep)))
      assert(got(d) == exp, s"doc $d: got=${got(d)} exp=$exp")
    }
  }

  test("leakage invariant: no candidate pair straddles splits; the " +
    "per-doc-hash counterfactual WOULD have straddled one") {
    pairs.foreach { case (a, b) =>
      assert(got(a)._2 == got(b)._2, s"pair ($a,$b) straddles splits")
    }
    // counterfactual: q89-style independent per-doc ticket
    val straddled = pairs.filter { case (a, b) =>
      splitOf(bucket("split", a)) != splitOf(bucket("split", b))
    }
    assert(straddled.nonEmpty,
      "fixture degenerate: independent hashing never straddles a pair, " +
        "so the group split protects nothing here")
    // and the fixture has real multi-doc groups + all three splits occur
    assert(got.values.groupBy(_._1).exists(_._2.size > 1))
    assert(got.values.map(_._2).toSet == Set("train", "val", "test"))
  }
}

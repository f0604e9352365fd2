package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q312 — the dedup ROI curve. Independent evidence beyond the DuckDB
  * hash gate: a plain-Scala union-find over the GRADED q72 edge list
  * must reproduce the bucket curve, and the curve must be a complete
  * partition of the corpus (Σ n_docs = |corpus|, Σ tok_mass = total
  * whitespace tokens) with both the singleton bucket and a genuine
  * multi-doc bucket populated — a curve that misses either says nothing
  * about the drop-vs-keep decision it exists to inform. */
class DupMassSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  test("q312 equals a union-find brute force over the graded q72 edges; " +
    "buckets partition the corpus exactly") {
    val docs = T(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = TrainingData.minhashPairs(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val byCluster = docs.keys.groupBy(find)
    val byBucket = byCluster.toSeq.map { case (_, members) =>
      val sz = members.size.toLong
      (63 - java.lang.Long.numberOfLeadingZeros(sz),
        sz, members.map(docs).sum)
    }.groupBy(_._1).map { case (b, cs) =>
      b.toLong -> (cs.size.toLong, cs.map(_._2).sum, cs.map(_._3).sum)
    }
    val ttok = docs.values.sum
    val want = byBucket.map { case (b, (nc, nd, tm)) =>
      (b, nc, nd, tm, tm * 10000L / ttok)
    }.toSet
    val got = Curation.q312DupMassCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want, "curve diverged from the union-find brute force")
    // complete partition of the corpus
    assert(got.toSeq.map(_._3).sum == docs.size.toLong, "docs don't sum")
    assert(got.toSeq.map(_._4).sum == ttok, "token mass doesn't sum")
    // both decision-relevant regions populated
    assert(got.exists(_._1 == 0L), "no singleton bucket — degenerate")
    assert(got.exists(_._1 >= 1L), "no multi-doc bucket — degenerate")
  }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q181 selection flagship: all three stages recomputed driver-side —
  * the q172 selection (spec-verified independently), an independent
  * union-find + quality-argmax for the keeper dedup, and the
  * curriculum sort — then compared row-for-row. Each composition
  * boundary must BIND on the fixture (a stage that never removes or
  * reorders anything is a no-op disguised as a pipeline). */
class SelectionPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val quality: Map[Long, Long] =
    TrainingData.q83QualityScore(spark, SparkTestBase.Sf0001)
      .selectExpr("doc_id", "cast(round(quality * 10000) as bigint)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val keepers: Map[Long, Long] = {
    val pairs = TrainingData.q72DedupMinhash(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(n => (find(n), n)).groupBy(_._1)
      .flatMap { case (_, ms) =>
        val ns = ms.map(_._2).toSeq
        val keep = ns.minBy(n => (-quality(n), n))
        ns.map(_ -> keep)
      }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("pipeline equals the staged driver-side recompute; every stage binds") {
    val selected = Curation.q172ImportanceSelect(spark, SparkTestBase.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val survivors = selected.filter { case (id, _) =>
      keepers.get(id).forall(_ == id)
    }
    assert(survivors.size < selected.size,
      "dedup stage must bind: some selected doc must be a non-keeper")

    val want = survivors.map { case (id, score) =>
      val bucket = quality(id) / 1000
      val skey = java.lang.Long.parseLong(
        md5hex("cur:" + id).substring(0, 12), 16)
      (id, score, bucket, skey)
    }.sortBy { case (id, _, b, k) => (-b, k, id) }
      .zipWithIndex
      .map { case ((id, score, b, _), i) => (i + 1L, id, b, score) }

    val got = Curation.q181SelectionPipeline(spark, SparkTestBase.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.nonEmpty)
    assert(got == want)

    // the curriculum stage must bind too: schedule order differs from
    // both score order and doc_id order
    val byPos = got.map(_._2)
    assert(byPos != survivors.map(_._1))
    assert(byPos != byPos.sorted)
  }
}

package graft.ops

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestBase

/** Independent cross-check for q81's sessionization: the DuckDB oracle
  * runs the same lag+cumsum formulation, so a shared misconception
  * (strict vs inclusive gap, tie order at equal µs, first-session
  * numbering) would pass t2. This compares the production shape with a
  * literal "sort, then split whenever the gap exceeds 30 minutes" scan
  * on generated histories, including exact-30-minute gaps (the
  * boundary: > splits only ABOVE the threshold) and equal-timestamp
  * collisions. */
object SessionizeProps extends Properties("Sessionize") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestBase.spark

  private val GapUs = 1800000000L // 30 min

  // timestamps drawn from multiples of 10 minutes so exact-30-minute
  // gaps (the boundary case) occur constantly
  private val event: Gen[(Long, Long)] = for {
    u <- Gen.chooseNum(0L, 2L)
    slot <- Gen.chooseNum(0L, 18L)
  } yield (u, slot * 600000000L)

  /** (user, session ordinal) → (count, min ts, max ts) by literal
    * sort-and-split. */
  private def brute(evs: Seq[(Long, Long, Long)]) // (id, user, tus)
      : Map[(Long, Long), (Long, Long, Long)] =
    evs.groupBy(_._2).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._1))
      val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
        case (acc, e) =>
          if (e._3 - acc.last.last._3 > GapUs) acc :+ Vector(e)
          else acc.init :+ (acc.last :+ e)
      }
      sessions.zipWithIndex.map { case (s, i) =>
        (u, i + 1L) -> (s.size.toLong, s.map(_._3).min, s.map(_._3).max)
      }
    }

  property("lag+cumsum == sort-and-split scan") =
    Prop.forAllNoShrink(Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, event))) { raw =>
      import spark.implicits._
      val evs = raw.zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      val got = NorthStar.sessionizeCore(
          evs.toDF("event_id", "user_id", "tus"))
        .as[(Long, Long, Long, Long, Long)].collect()
        .map { case (u, sid, cnt, lo, hi) => (u, sid) -> (cnt, lo, hi) }
        .toMap
      got == brute(evs)
    }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q164 (session-sequence training examples) beyond the DuckDB oracle:
  * brute-force recomputation of every example from the raw events, and
  * consistency with q81's sessionization (same sessions, same sizes).
  */
class SessionExamplesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("every example matches the brute-force sessionizer: prefix " +
    "fingerprint, label, and size — and sessions align with q81") {
    val raw = T.events(spark, dir)
      .select("user_id", "event_id", "tus", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // brute-force: per user in (tus, event_id) order, split on >30min gaps
    val expect = raw.groupBy(_._1).flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      val sessions = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String)]]
      var prev = Long.MinValue
      for (e <- sorted) {
        if (sessions.isEmpty || e._3 - prev > 1800000000L)
          sessions += scala.collection.mutable.ArrayBuffer(e)
        else sessions.last += e
        prev = e._3
      }
      sessions.zipWithIndex.collect {
        case (ses, i) if ses.length >= 3 =>
          val types = ses.map(_._4)
          (uid, (i + 1).toLong) ->
            ((ses.length.toLong, md5hex(types.init.mkString(" ")),
              types.last))
      }
    }
    val got = NorthStar.q164SessionExamples(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(got.nonEmpty, "degenerate fixture: no 3+-event sessions")
    assert(got == expect)

    val q81Sizes = NorthStar.q81EventSessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      .filter(_._2 >= 3)
    assert(got.view.mapValues(_._1).toMap == q81Sizes,
      "q164 sessions disagree with q81's sessionization")
  }
}

package graft.ops

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestBase

/** The generated-history row for [[AsofProps]] / CodegenGuardSpec.
  * TOP-LEVEL deliberately (r11): as a member case class of the
  * `AsofProps` object, the Dataset encoder's generated code referenced
  * `AsofProps$Ev.event_id()` in a way Janino could not compile, so
  * EVERY suite run logged a CodeGenerator error and silently fell back
  * to interpreted projection — noise that buried real codegen
  * regressions (and un-codegen'd the very path the property
  * exercises). */
private[ops] case class Ev(event_id: Long, user_id: Long, tus: Long,
                           typ: String)

/** Independent cross-check for the q26 as-of join: the DuckDB oracle
  * runs the SAME union+window formulation, so a misconception shared by
  * both engines (tie discipline, inclusive bound, missing-signup
  * sentinel) would pass t2. This property compares the production
  * union+window shape against a literal per-purchase brute-force scan
  * ("the most recent signup at or before my time; ties at equal time →
  * signup wins, larger event_id wins") on arbitrary generated
  * histories with deliberately colliding timestamps. */
object AsofProps extends Properties("AsofJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestBase.spark

  // few users + tiny time domain → many equal-µs collisions, the case
  // the tie discipline exists for
  private val event: Gen[(Long, Long, String)] = for {
    u <- Gen.chooseNum(0L, 3L)
    t <- Gen.chooseNum(0L, 9L)
    ty <- Gen.oneOf("signup", "purchase", "click")
  } yield (u, t, ty)

  private def brute(events: Seq[Ev]): Map[Long, Long] = {
    val purchases = events.filter(_.typ == "purchase")
    val signups = events.filter(_.typ == "signup")
    purchases.map { p =>
      val eligible = signups.filter(s =>
        s.user_id == p.user_id && s.tus <= p.tus)
      val best =
        if (eligible.isEmpty) -1L
        else eligible.maxBy(s => (s.tus, s.event_id)).event_id
      p.event_id -> best
    }.toMap
  }

  property("union+window == brute-force per-purchase scan") =
    Prop.forAllNoShrink(Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, event))) { raw =>
      import spark.implicits._
      val events = raw.zipWithIndex.map { case ((u, t, ty), i) =>
        Ev(i.toLong, u, t, ty)
      }
      val got = Relational.asofCore(
          events.toDF("event_id", "user_id", "tus", "event_type"))
        .as[(Long, Long)].collect().toMap
      got == brute(events)
    }
}

package graft.ops

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestBase

/** Independent cross-checks for the two Curation ops whose DuckDB
  * oracles run the SAME formulation as the Spark side (q98 lag/lead,
  * q103 chained min-aggregates) — a shared boundary misconception
  * would pass the hash gate on both engines at once, so each gets a
  * literal-scan reference here. */
object CurationProps extends Properties("Curation") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestBase.spark

  // ---- q98 SCD2: run compression over (cust, status, date, key) -------

  // tiny domains → same-date status flips (the tiebreak case) are common
  private val order: Gen[(Long, String, Long)] = for {
    cust <- Gen.chooseNum(0L, 2L)
    status <- Gen.oneOf("O", "F", "P")
    date <- Gen.chooseNum(0L, 6L)
  } yield (cust, status, date)

  private def bruteScd2(rows: Seq[(Long, Long, String, Long)]) // key,cust,st,dt
      : Set[(Long, String, Long, Option[Long], Boolean, Long)] =
    rows.groupBy(_._2).flatMap { case (cust, os) =>
      val sorted = os.sortBy(o => (o._4, o._1))
      val changes = sorted.zipWithIndex.filter { case (o, i) =>
        i == 0 || o._3 != sorted(i - 1)._3
      }.map(_._1)
      changes.zipWithIndex.map { case (c, i) =>
        val validTo = if (i + 1 < changes.size) Some(changes(i + 1)._4) else None
        (cust, c._3, c._4, validTo, validTo.isEmpty, c._1)
      }
    }.toSet

  property("q98 lag/lead == run-compression scan") =
    Prop.forAllNoShrink(Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, order))) { raw =>
      import spark.implicits._
      val rows = raw.zipWithIndex.map { case ((c, s, d), i) =>
        (i.toLong, c, s, d)
      }
      val got = Curation.scd2Core(
          rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"))
        .as[(Long, String, Long, Option[Long], Boolean, Long)]
        .collect().toSet
      got == bruteScd2(rows)
    }

  // ---- q103 funnel: per-user literal scan ------------------------------

  private val WeekUs = 604800000000L
  private val DayUs = 86400000000L

  private val fev: Gen[(Long, Long, String)] = for {
    u <- Gen.chooseNum(0L, 3L)
    day <- Gen.chooseNum(0L, 10L)
    ty <- Gen.oneOf("view", "click", "purchase", "other")
  } yield (u, day * DayUs, ty)

  private def bruteFunnel(evs: Seq[(Long, Long, String)]): (Long, Long, Long) = {
    val byUser = evs.groupBy(_._1)
    val stages = byUser.values.toSeq.flatMap { es =>
      val views = es.filter(_._3 == "view").map(_._2)
      if (views.isEmpty) None
      else {
        val t1 = views.min
        val t2 = es.filter(e => e._3 == "click" && e._2 > t1).map(_._2)
          .minOption
        val t3 = t2.flatMap(t =>
          es.filter(e => e._3 == "purchase" && e._2 > t).map(_._2).minOption)
        val s2 = t2.exists(_ - t1 <= WeekUs)
        val s3 = t3.isDefined && t2.exists(_ - t1 <= WeekUs) &&
          t3.exists(_ - t1 <= WeekUs)
        Some((s2, s3))
      }
    }
    (stages.size.toLong,
      stages.count(_._1).toLong,
      stages.count(_._2).toLong)
  }

  property("q103 chained min-aggs == per-user scan") =
    Prop.forAllNoShrink(Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, fev))) { evs =>
      import spark.implicits._
      val got = Curation.funnelCore(
          evs.toDF("user_id", "tus", "event_type"))
        .as[(String, Long)].collect().toMap
      val (n1, n2, n3) = bruteFunnel(evs)
      got == Map("stage1_view" -> n1, "stage2_click" -> n2,
        "stage3_purchase" -> n3)
    }

  // ---- q101 gap fill: per-user LOCF scan -------------------------------

  // sub-day timestamps with same-µs collisions; value occasionally
  // repeats so "same value, different day" and tie-break paths both run
  private val gev: Gen[(Long, Long, Double)] = for {
    u <- Gen.chooseNum(0L, 2L)
    t <- Gen.chooseNum(0L, 5L * DayUs)
    v <- Gen.chooseNum(0, 3)
  } yield (u, t, v.toDouble)

  private def bruteGapFill(evs: Seq[(Long, Long, Long, Double)]) // id,u,tus,v
      : Map[(Long, Long), Double] =
    evs.groupBy(_._2).flatMap { case (u, es) =>
      val lastPerDay = es.groupBy(_._3 / DayUs).map { case (day, des) =>
        day -> des.maxBy(e => (e._3, e._1))._4
      }
      val days = lastPerDay.keys
      var carried = 0.0
      (days.min to days.max).map { day =>
        carried = lastPerDay.getOrElse(day, carried)
        (u, day) -> carried
      }
    }

  property("q101 spine+fill == per-user LOCF scan") =
    Prop.forAllNoShrink(Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, gev))) { raw =>
      import spark.implicits._
      val evs = raw.zipWithIndex.map { case ((u, t, v), i) =>
        (i.toLong, u, t, v)
      }
      val got = Curation.gapFillCore(
          evs.toDF("event_id", "user_id", "tus", "value"))
        .as[(Long, Long, Double)].collect()
        .map { case (u, d, v) => (u, d) -> v }.toMap
      got == bruteGapFill(evs)
    }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Codegen-fallback canary (r11). Spark's default
  * `spark.sql.codegen.factoryMode = FALLBACK` silently drops to
  * interpreted projection when Janino cannot compile generated code —
  * correct results, an ERROR line in the log, and a hot path quietly
  * running 10×+ slower. The r10 suite carried exactly such a permanent
  * fallback (the `AsofProps$Ev` inner-case-class encoder), which made
  * the log noise useless as a regression signal. This spec re-runs that
  * once-broken path under CODEGEN_ONLY, where a compile failure THROWS
  * instead of falling back — so the canary is deterministic and local,
  * not a scrape of other suites' logs. */
class CodegenGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def withCodegenOnly[A](body: => A): A = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("the AsofProps encoder path compiles under CODEGEN_ONLY " +
    "(no silent interpreted fallback)") {
    import spark.implicits._
    withCodegenOnly {
      val events = Seq(
        Ev(0L, 1L, 5L, "signup"),
        Ev(1L, 1L, 5L, "purchase"),
        Ev(2L, 2L, 3L, "purchase"))
      val got = Relational.asofCore(
          events.toDF("event_id", "user_id", "tus", "event_type"))
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 0L, 2L -> -1L))
    }
  }

  test("the declared-query custom expressions compile under " +
    "CODEGEN_ONLY (VecDot/MinhashSig/Simhash64 hot kernels)") {
    withCodegenOnly {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val df = Seq((Array(1f, 2f), "a b c a")).toDF("v", "t")
      val r = df.select(
        graft.functions.VecDot.dot(col("v"), col("v")).as("d"),
        graft.functions.Simhash64.simhash(col("t")).as("sh"))
        .head
      assert(r.getDouble(0) == 5.0)
      assert(!r.isNullAt(1))
    }
  }

  test("the r12 fixed-point kernels compile under CODEGEN_ONLY and " +
    "match their interpreted eval (FixDot/PqCodes/PqAdc)") {
    withCodegenOnly {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      // 2-subspace × 2-code × 2-dim toy codebook in the 2^16 grid
      val cb: Array[Array[Array[Long]]] = Array(
        Array(Array(65536L, 0L), Array(0L, 65536L)),
        Array(Array(32768L, 32768L), Array(-65536L, 0L)))
      val df = Seq(Array(1f, 0f, 0.5f, 0.5f)).toDF("v")
      val r = df.select(col("v"),
        graft.functions.FixDot.dot(col("v"), col("v")).as("n"),
        graft.functions.PqCodes.codes(col("v"), cb).as("codes"))
        .withColumn("adc",
          graft.functions.PqAdc.adc(col("v"), col("codes"), cb))
        .head
      // normsq = 65536^2 + 0 + 32768^2·2
      assert(r.getLong(1) == 65536L * 65536L + 2L * 32768L * 32768L)
      assert(r.getSeq[Int](2) == Seq(0, 0)) // both subvectors hit entry 0
      assert(r.getLong(3) == 0L) // the vector IS its reconstruction
    }
  }
}

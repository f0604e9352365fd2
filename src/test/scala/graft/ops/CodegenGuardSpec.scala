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

  private def withFactoryMode[A](mode: String)(body: => A): A = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, mode)
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
  private def withCodegenOnly[A](body: => A): A =
    withFactoryMode("CODEGEN_ONLY")(body)

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
    "their interpreted eval (NO_CODEGEN) returns identical rows — " +
    "FixDot/PqCodes/PqAdc") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 2-subspace × 2-code × 2-dim toy codebook in the 2^16 grid, plus
    // degenerate inputs so BOTH paths exercise the NULL branches
    val cb: Array[Array[Array[Long]]] = Array(
      Array(Array(65536L, 0L), Array(0L, 65536L)),
      Array(Array(32768L, 32768L), Array(-65536L, 0L)))
    def run(): Seq[Seq[Any]] =
      Seq(Some(Array(1f, 0f, 0.5f, 0.5f)), Some(Array(1f, 0f, 0.5f)),
          None)
        .toDF("v0")
        .select(col("v0").cast("array<float>").as("v"))
        .select(col("v"),
          graft.functions.FixDot.dot(col("v"), col("v")).as("n"),
          graft.functions.PqCodes.codes(col("v"), cb).as("codes"))
        .withColumn("adc",
          graft.functions.PqAdc.adc(col("v"), col("codes"), cb))
        .collect().toSeq
        .map(r => (1 until 4).map(i =>
          if (r.isNullAt(i)) null else r.get(i) match {
            case s: scala.collection.Seq[_] => s.toList
            case x => x
          }))
    val gen = withCodegenOnly(run())
    val interp = withFactoryMode("NO_CODEGEN")(run())
    assert(gen == interp,
      s"codegen vs interpreted divergence:\n$gen\n$interp")
    // and the well-formed row's values are the hand-computed ones
    // (normsq = 65536^2 + 2·32768^2; both subvectors hit entry 0;
    // the vector IS its own reconstruction)
    assert(gen.head == Seq(65536L * 65536L + 2L * 32768L * 32768L,
      List(0, 0), 0L))
    // the short vector still self-dots (lengths agree) but codes/ADC
    // are NULL, never a prefix; the null vector is NULL throughout
    assert(gen(1) == Seq(65536L * 65536L + 32768L * 32768L, null, null))
    assert(gen(2) == Seq(null, null, null))
  }
}

package graft.ops

import org.scalacheck.{Gen, Prop, Properties}

/** Property-pins the exact half-up 4-dp rounding formula against the
  * JVM's reference implementation (BigDecimal HALF_UP): the integer
  * `(2·num·10⁴ + den) div (2·den)` basis-point arithmetic must agree
  * with `num/den` rounded at scale 4 for every positive rational in the
  * formula's documented domain. This is the formula three queries
  * (q78/q83/q96) and their DuckDB oracles rely on to dodge the
  * engine-divergent `round(double, 4)` — a drift here would be a silent
  * cross-engine mismatch. */
object ExactR4Props extends Properties("Exact.r4") {

  // the queries feed counts: num ∈ [0, den], den ≥ 1, both well under
  // the bigint overflow bound (2·num·10⁴ overflows Long at num ≈ 4.6e14)
  private val fractions = for {
    den <- Gen.chooseNum(1L, 1000000L)
    num <- Gen.chooseNum(0L, den)
  } yield (num, den)

  property("equals BigDecimal HALF_UP at scale 4") =
    Prop.forAll(fractions) { case (num, den) =>
      val viaFormula =
        ((2 * num * 10000L + den) / (2 * den)).toDouble / 10000.0
      val reference = BigDecimal(num)
        .underlying.divide(java.math.BigDecimal.valueOf(den), 4,
          java.math.RoundingMode.HALF_UP)
        .doubleValue
      viaFormula == reference
    }

  // the half-way points that motivated the formula (q83's 0.59825 class)
  property("exact half-way cases round up") = {
    val cases = Seq((11965L, 20000L), (1L, 20000L), (3L, 2000L))
    Prop.all(cases.map { case (num, den) =>
      val viaFormula =
        ((2 * num * 10000L + den) / (2 * den)).toDouble / 10000.0
      val reference = BigDecimal(num)
        .underlying.divide(java.math.BigDecimal.valueOf(den), 4,
          java.math.RoundingMode.HALF_UP).doubleValue
      Prop.propBoolean(viaFormula == reference) :| s"$num/$den"
    }: _*)
  }
}

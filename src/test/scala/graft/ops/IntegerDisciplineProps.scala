package graft.ops

import org.scalacheck.{Gen, Prop, Properties}

/** The r12-session integer disciplines against plain-Scala references
  * on RANDOM inputs — the math identities the cross-engine oracles of
  * q211/q214 (bit-length ⌊log₂⌋), q219 (cross-multiplied ecdf KS),
  * q223 (weighted lower quantiles), q208 (winsorize direction), and
  * q209 (integer RRF grid) lean on. These are engine-independent
  * NUMBER facts: if any property here failed, the corresponding
  * DuckDB-vs-Spark hash matches would be coincidences of the fixture
  * rather than consequences of the arithmetic. Pure JVM — no Spark
  * session. */
object IntegerDisciplineProps extends Properties("IntegerDiscipline") {

  private val pos: Gen[Long] = Gen.chooseNum(1L, Long.MaxValue)

  /** q211/q214's claim: bit length − 1 IS ⌊log₂ n⌋ (cross-checked via
    * numberOfLeadingZeros, a third mechanism besides the two engines'
    * bin()-string length). */
  property("bit-length log2 identity") = Prop.forAll(pos) { n =>
    val viaBin = java.lang.Long.toBinaryString(n).length - 1
    val viaNlz = 63 - java.lang.Long.numberOfLeadingZeros(n)
    // bracket in BigInt: 1L << 63 overflows to negative and would fail
    // the check spuriously at the 2^62 boundary
    viaBin == viaNlz &&
      (BigInt(1) << viaBin) <= BigInt(n) &&
      BigInt(n) < (BigInt(1) << (viaBin + 1))
  }

  /** q214's whole-bit resolution claim: the bit-length surprisal
    * bl(c1) − bl(c2) brackets the true log₂(c1/c2) within ONE bit —
    * 2^(bits−1) ≤ c1/c2 < 2^(bits+1), checked by exact integer
    * cross-multiplication (a wrong bit-length formula fails this; the
    * earlier "bits ≥ 0 for c2 ≤ c1" phrasing was true by construction
    * and tested nothing). */
  property("surprisal bits bracket the true log ratio within one bit") =
    Prop.forAll(Gen.chooseNum(1L, 1L << 40), Gen.chooseNum(1L, 1L << 40)) {
      (a, b) =>
        val (c1, c2) = (a max b, a min b)
        def bl(n: Long) = java.lang.Long.toBinaryString(n).length
        val bits = bl(c1) - bl(c2)
        bits >= 0 &&
          BigInt(c1) * 2 >= BigInt(c2) * (BigInt(1) << bits) &&
          BigInt(c1) < BigInt(c2) * (BigInt(1) << (bits + 1))
    }

  /** q219's KS statistic on the cross-multiplied grid: 0 ≤ D_num ≤
    * n₁·n₂, self-comparison is exactly 0, and D_bp is monotone under
    * adding the SAME value to both samples (pure shift invariance is
    * false in general; identity and bounds are the oracle's load-
    * bearing facts). */
  private val sample: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 100L))
  private def ksNum(a: Seq[Long], b: Seq[Long]): BigInt = {
    val (n1, n2) = (BigInt(a.size), BigInt(b.size))
    (a ++ b).distinct.map { v =>
      (BigInt(a.count(_ <= v)) * n2 - BigInt(b.count(_ <= v)) * n1).abs
    }.max
  }
  property("KS numerator bounds and self-zero") =
    Prop.forAll(sample, sample) { (a, b) =>
      val d = ksNum(a, b)
      d >= 0 && d <= BigInt(a.size) * BigInt(b.size) && ksNum(a, a) == 0
    }

  /** q223's weighted lower quantile: minimality (the previous distinct
    * value misses the mass target) and membership, for random weights
    * and both graded targets. */
  private val weighted: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(1L, 9L)))
  property("weighted lower quantile minimality") =
    Prop.forAll(weighted, Gen.oneOf((1L, 2L), (9L, 10L))) { (xs, t) =>
      val (num, den) = t
      val sorted = xs.sortBy(_._1)
      val w = sorted.map(_._2).sum
      def massLe(v: Long) = sorted.collect { case (x, q) if x <= v => q }.sum
      val values = sorted.map(_._1).distinct
      val pick = values.find(v => massLe(v) * den >= w * num).get
      val prev = values.takeWhile(_ < pick).lastOption
      values.contains(pick) &&
        massLe(pick) * den >= w * num &&
        prev.forall(v => massLe(v) * den < w * num)
    }

  /** q208's winsorize direction facts on random data and any lo ≤ hi
    * band: no clip → identical sum; one-sided clips move the sum only
    * in the allowed direction. */
  property("winsorize direction") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-100L, 100L)),
      Gen.chooseNum(-100L, 100L), Gen.chooseNum(-100L, 100L)) {
      (xs, a, b) =>
        val (lo, hi) = (a min b, a max b)
        val clipped = xs.map(x => (lo max (hi min x)))
        val (nLo, nHi) = (xs.count(_ < lo), xs.count(_ > hi))
        val (raw, win) = (xs.sum, clipped.sum)
        (nLo != 0 || nHi != 0 || win == raw) &&
          (nHi != 0 || win >= raw) && (nLo != 0 || win <= raw)
    }

  /** The r13 q160/IVF quantum's isqrt: the double-sqrt estimate
    * corrected by the ±2 monotone square-compare window lands EXACTLY
    * on ⌊√nn⌋ for every nn up to the 2⁷⁶ domain bound (n₁·n₂ of two
    * 64-dim 2¹⁶-quantized vectors) — the fact that lets both engines
    * share one integer denominator with no double between the dot and
    * the compared key. */
  private val nnGen: Gen[BigInt] = for {
    hi <- Gen.chooseNum(0L, (1L << 38) - 1)
    lo <- Gen.chooseNum(0L, (1L << 38) - 1)
    bump <- Gen.oneOf(-1, 0, 1) // also probe adjacent-to-square points
  } yield {
    val base = BigInt(hi) * BigInt(lo) + bump
    if (base < 0) BigInt(0) else base // 0 included: isqrt(0) = 0 is
                                      // part of the contract (r13
                                      // review — the square-only
                                      // indicator returned −1 there)
  }
  private def isqrtCorrected(nn: BigInt): BigInt = {
    val t0 = BigInt(math.floor(math.sqrt(nn.toDouble)).toLong)
    (-1 to 2).foldLeft(t0 - 2) { (acc, k) =>
      // the shipped indicator: negative candidates count unconditionally
      acc + (if (t0 + k < 0 || (t0 + k) * (t0 + k) <= nn) 1 else 0)
    }
  }
  property("corrected double estimate is the exact isqrt (incl. 0)") =
    Prop.forAll(nnGen) { nn =>
      val t = isqrtCorrected(nn)
      t >= 0 && t * t <= nn && (t + 1) * (t + 1) > nn &&
        isqrtCorrected(BigInt(0)) == 0
    }

  /** The r13 quantum itself: floorDiv(2·d·scale + t, 2·t) (the
    * mod-complement floor division both engines run) equals the
    * mathematical ⌊d·scale/t + ½⌋ for POSITIVE and NEGATIVE dots —
    * round-half-up at every sign, no doubles involved. */
  property("half-up quantum via floor division, both signs") =
    Prop.forAll(nnGen, Gen.chooseNum(-(1L << 38), 1L << 38),
      Gen.oneOf(1L << 20, 1L << 30)) { (nn, d, scale) =>
      val t = isqrtCorrected(nn)
      if (t == 0) Prop.passed // zero-vector branch: quantum DEFINED 0
      else {
        val (num, den) = (2 * BigInt(d) * scale + t, 2 * t)
        val mod = ((num % den) + den) % den
        val q = (num - mod) / den
        // reference: unique integer q with q ≤ d·scale/t + ½ < q + 1,
        // cross-multiplied to avoid any floating point
        Prop.propBoolean((q * den <= num) && ((q + 1) * den > num))
      }
    }

  /** The SHIPPED native quantum ([[graft.functions.FixQuantum]], the
    * multiplyHigh/two-stage-long path) against the BigInt reference on
    * random in-domain inputs (n ≤ 2³⁸, |d| ≤ isqrt(n₁·n₂) — the
    * Cauchy-Schwarz domain FixDot guarantees): the long decomposition
    * must reproduce ⌊d·scale/t + ½⌋ exactly at every sign, and the
    * zero-vector case is DEFINED 0. */
  property("native FixQuantum equals the BigInt reference") =
    Prop.forAll(Gen.chooseNum(0L, (1L << 38) - 1),
      Gen.chooseNum(0L, (1L << 38) - 1),
      Gen.chooseNum(0L, Long.MaxValue), Gen.oneOf(1L << 20, 1L << 30)) {
      (n1, n2, dSeed, scale) =>
        val t = isqrtCorrected(BigInt(n1) * BigInt(n2))
        if (t == 0)
          graft.functions.FixQuantum.quantum(0L, n1, n2, scale) == 0L
        else {
          val d = (dSeed % (2 * t.toLong + 1)) - t.toLong // ∈ [−t, t]
          val (num, den) = (2 * BigInt(d) * scale + t, 2 * t)
          val mod = ((num % den) + den) % den
          graft.functions.FixQuantum.quantum(d, n1, n2, scale) ==
            ((num - mod) / den).toLong
        }
    }

  /** q209's integer RRF grid: ⌊10⁷/(60+r)⌋ is STRICTLY decreasing while
    * (60+r)² ≤ 10⁷ (consecutive floors collide only past r ≈ 3102 —
    * far beyond any usable K; q209's K is 50), so integer fusion can
    * never invert two ranks the real-valued RRF separates. */
  property("RRF grid strictly decreasing through rank 3000") =
    Prop.forAll(Gen.chooseNum(1L, 3000L)) { r =>
      10000000L / (60L + r) > 10000000L / (60L + r + 1L)
    }
}

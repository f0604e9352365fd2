package graft.ops

import org.scalacheck.{Gen, Prop, Properties}

/** q186's apportionment kernel on arbitrary weight vectors: Hamilton
  * largest-remainder must spend the budget EXACTLY and satisfy the
  * QUOTA RULE (every allocation is ⌊B·w/W⌋ or ⌈B·w/W⌉ — the property
  * that distinguishes largest-remainder from divisor methods, which
  * can violate it), with deterministic ties. Driver-side pure
  * function — no Spark session needed. */
object HamiltonProps extends Properties("HamiltonApportion") {

  private val weightsGen: Gen[List[(String, BigInt)]] = for {
    n <- Gen.chooseNum(1, 12)
    ws <- Gen.listOfN(n, Gen.chooseNum(0L, 1L << 40))
    if ws.sum > 0
  } yield ws.zipWithIndex.map { case (w, i) => (s"s$i", BigInt(w)) }

  private val budgetGen: Gen[Long] = Gen.chooseNum(0L, 1000000L)

  property("budget spent exactly and quota rule holds") =
    Prop.forAll(weightsGen, budgetGen) { (ws, budget) =>
      val alloc = TrainingData.hamiltonApportion(budget, ws).toMap
      val wSum = ws.map(_._2).sum
      val spent = alloc.values.sum == budget
      val quota = ws.forall { case (k, w) =>
        val lo = (BigInt(budget) * w) / wSum
        val hi = if ((BigInt(budget) * w) % wSum == 0) lo else lo + 1
        alloc(k) >= lo.toLong && alloc(k) <= hi.toLong
      }
      spent && quota
    }

  property("deterministic: same inputs, same allocation, any input " +
    "order") =
    Prop.forAll(weightsGen, budgetGen) { (ws, budget) =>
      val a = TrainingData.hamiltonApportion(budget, ws)
      val b = TrainingData.hamiltonApportion(budget, ws.reverse)
      a.toMap == b.toMap
    }
}

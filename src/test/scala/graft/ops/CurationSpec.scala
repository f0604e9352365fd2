package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Unit-level guards for the curation suite beyond the DuckDB oracle:
  * the connected-components fixpoint must equal brute-force components
  * on arbitrary graphs (the oracle only sees the one graph the testdata
  * produces), and the q88 aggregate caps must actually fire. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Reference implementation: union-find over the edge list. */
  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra.max(rb)) = ra.min(rb)
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  test("connectedComponents equals brute-force union-find on random graphs " +
    "(incl. a chain, whose diameter forces multiple propagation rounds)") {
    import spark.implicits._
    val rnd = new scala.util.Random(100)
    def randomGraph(): Seq[(Long, Long)] = {
      val n = 2 + rnd.nextInt(23) // node id space
      Seq.fill(1 + rnd.nextInt(30)) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
    }
    // a long chain on top of the random cases: 0-1-2-...-15
    val chain = (0L until 15L).map(i => (i, i + 1))
    val cases = chain +: Seq.fill(8)(randomGraph()).filter(_.nonEmpty)
    for (es <- cases) {
      val got = Curation.connectedComponents(es.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(got == bruteComponents(es), s"edges: $es")
    }
  }

  test("connectedComponentsStar equals union-find on the same graphs and " +
    "converges in O(log n) rounds on a 256-link chain (the adversarial " +
    "diameter where hash-to-min would need ~256 propagation rounds)") {
    import spark.implicits._
    val rnd = new scala.util.Random(200)
    def randomGraph(): Seq[(Long, Long)] = {
      val n = 2 + rnd.nextInt(23)
      Seq.fill(1 + rnd.nextInt(30)) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
    }
    for (es <- Seq.fill(6)(randomGraph()).filter(_.nonEmpty)) {
      val got = Curation.connectedComponentsStar(es.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(got == bruteComponents(es), s"edges: $es")
    }

    val chain = (0L until 256L).map(i => (i, i + 1))
    val (labels, rounds) = Curation.starWithRounds(chain.toDF("a", "b"))
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == (0L to 256L).map(_ -> 0L).toMap)
    assert(rounds <= 15, s"star contraction took $rounds rounds on a chain")
  }

  test("Exact.r4's actual SQL expression matches BigDecimal HALF_UP " +
    "(ExactR4Props pins the formula in Scala; this pins the production " +
    "Column, so a typo in the SQL string cannot hide)") {
    import spark.implicits._
    val rnd = new scala.util.Random(4)
    val halfway = Seq((11965L, 20000L), (1L, 20000L), (3L, 2000L))
    val cases = halfway ++ Seq.fill(200) {
      val den = 1L + rnd.nextInt(1000000)
      (math.abs(rnd.nextLong()) % (den + 1), den)
    }
    val got = cases.toDF("num", "den")
      .select(Exact.r4("num", "den").as("r"))
      .as[Double].collect()
    cases.zip(got).foreach { case ((num, den), r) =>
      val ref = BigDecimal(num)
        .underlying.divide(java.math.BigDecimal.valueOf(den), 4,
          java.math.RoundingMode.HALF_UP).doubleValue
      assert(r == ref, s"$num/$den: got $r, want $ref")
    }
  }

  test("q88's assertFilter fires loudly past the cap and passes under it") {
    import spark.implicits._
    val df = Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq(4L)))
      .toDF("id", "ds")
    // under the cap: all rows pass through
    assert(TrainingData.assertFilter(df, "size(ds) <= 3", "unreachable")
      .count() == 2)
    // over the cap: the job fails with the message, not a silent trim
    // (SparkRuntimeException locally; wrapped in SparkException when it
    // happens inside a task on a cluster — intercept the common parent)
    val e = intercept[Exception] {
      TrainingData.assertFilter(df, "size(ds) <= 2", "cluster over cap")
        .count()
    }
    assert(e.getMessage.contains("cluster over cap") ||
      Option(e.getCause).exists(_.getMessage.contains("cluster over cap")))
  }
}

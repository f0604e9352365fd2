package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q109 (representative simhash clusters) against q88 (the pair
  * variant) on the same corpus: the cluster view must account for every
  * doc the pair view names, without ever expanding pairs itself. The
  * semantic ground truth is the recursive-CTE DuckDB oracle (driver
  * CORRECTNESS); this spec pins the cross-operator invariants. */
class SimhashClusterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("clusters cover exactly the docs that q88 pairs name, shape " +
    "invariants hold") {
    val clusters = TrainingData.q109SimhashClusters(spark,
      SparkTestBase.Sf0001).collect()
    assert(clusters.nonEmpty, "sf0.001 has near-dup docs; none clustered")
    clusters.foreach { r =>
      assert(r.getString(0).matches("[01]{64}"), "cluster_fp not a simhash")
      assert(r.getLong(1) >= 1, "empty cluster")       // n_fps
      assert(r.getLong(2) >= 2, "singleton emitted")   // n_docs
    }
    // a doc appears in a q88 pair iff it shares a cluster with another
    // doc, so the pair view's doc set size is bounded by the cluster
    // view's doc mass; hamming-0 pairs alone already require every
    // multi-doc fingerprint to be inside some cluster
    val pairs = TrainingData.q88SimhashHamming(spark, SparkTestBase.Sf0001)
      .select(explode(array(col("da"), col("db"))).as("d"))
      .distinct().count()
    val docMass = clusters.map(_.getLong(2)).sum
    assert(pairs <= docMass,
      s"q88 names $pairs docs but q109 clusters only cover $docMass")
  }

  test("pairs linked by q88 have fingerprints in one q109 cluster " +
    "(edge-level containment)") {
    // fingerprint per doc, then check every q88 pair's two fingerprints
    // either coincide (hamming 0) or differ by <= 3 bits — the edge
    // relation q109's components close over
    val fp = TrainingData.simhashes(spark, SparkTestBase.Sf0001)
      .select(col("doc_id"), col("simhash"))
    val pairs = TrainingData.q88SimhashHamming(spark, SparkTestBase.Sf0001)
    val joined = pairs
      .join(fp.select(col("doc_id").as("da"), col("simhash").as("fa")), "da")
      .join(fp.select(col("doc_id").as("db"), col("simhash").as("fb")), "db")
      .withColumn("diff", expr(
        "size(filter(sequence(1, 64), i -> substring(fa, i, 1) != substring(fb, i, 1)))"))
    assert(joined.filter(col("diff") > 3).count() == 0,
      "a q88 pair's fingerprints exceed the q109 linking threshold")
    assert(joined.filter(col("hamming") === 0 && col("fa") =!= col("fb"))
      .count() == 0, "hamming-0 pair with distinct fingerprints")
  }
}

package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q246 (phrase search via positional postings) beyond the DuckDB
  * oracle: a driver-side adjacency brute force over the raw corpus,
  * index faithfulness (the persisted positions equal a fresh
  * posexplode), and the plan contract — the probe touches ONLY the
  * index table, with both term scans bucket-pruned. */
class PhraseSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  /** (doc_id, 1-based positions of "data join" adjacency). */
  private lazy val expect: Map[Long, Seq[Int]] =
    T(spark, dir, "documents").select("doc_id", "text")
      .collect().flatMap { r =>
        val toks = r.getString(1).split(" ", -1).filter(_.nonEmpty)
        val pos = toks.indices.dropRight(1)
          .filter(i => toks(i) == "data" && toks(i + 1) == "join")
          .map(_ + 1)
        if (pos.nonEmpty) Some(r.getLong(0) -> pos) else None
      }.toMap

  test("q246 equals the driver-side adjacency brute force — doc set, " +
    "occurrence counts, first positions") {
    val rows = TrainingData.q246PhraseSearch(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(rows.keySet == expect.keySet)
    expect.foreach { case (d, pos) =>
      assert(rows(d) == ((pos.size.toLong, pos.min)), s"doc $d")
    }
    assert(expect.nonEmpty, "phrase absent from fixture — pins nothing")
  }

  test("index faithfulness: the persisted positional postings equal a " +
    "fresh posexplode of the corpus") {
    val idx = spark.table(TrainingData.ensurePositionalIndex(spark, dir))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet
    val fresh = T(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(expr("filter(split(text, ' '), x -> x != '')")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        col("col").as("term"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet
    assert(idx == fresh)
  }

  test("plan contract: the probe scans ONLY the index table (never the " +
    "corpus), and both term probes are bucket-pruned") {
    // AQE hides the static scan behind unexecuted query stages
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try { planAssertions() }
    finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  private def planAssertions(): Unit = {
    val df = TrainingData.q246PhraseSearch(spark, dir)
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      val loc = s.relation.location.rootPaths.mkString(",")
      assert(loc.contains("graft_postings_pos_"),
        s"probe scans a non-index path: $loc")
      val pruned = s.metadata.get("SelectedBucketsCount")
      assert(pruned.exists(_.contains("1 out of 8")),
        s"term probe not bucket-pruned: $pruned")
    }
  }
}

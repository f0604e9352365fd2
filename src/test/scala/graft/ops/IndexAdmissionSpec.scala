package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The q107 admission contract: two consecutive ingest batches driven
  * through screen → admit → screen against the PERSISTED band index.
  * Batch 2 must observe batch 1's admitted docs through the index alone
  * (the corpus is never rescanned), and the probe join must stay
  * exchange-free on the index side even after the append.
  *
  * Uses a path alias of the same testdata so its index table never
  * collides with q107's own (the index name digests the dataset dir
  * string, and this suite MUTATES its index by appending). */
class IndexAdmissionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // same files as Sf0001; distinct dir string => distinct index table
  private val aliasDir = SparkTestBase.Sf0001 + "/."

  /** The q104/q107 "new batch" is doc_id % 10 == 0; split it into two
    * consecutive ingests: batch 0 = % 20 == 0, batch 1 = % 20 == 10. */
  private def batchBands(parity: Int): DataFrame =
    TrainingData.minhashBands(spark, aliasDir)
      .filter(col("doc_id") % 20 === 10 * parity)
      .select(col("doc_id"), col("band"), col("k1"), col("k2"))

  test("two consecutive batches: batch 2 probes an index that contains " +
    "batch 1's admitted docs, with no corpus rescan") {
    val idx = Curation.ensureBandIndex(spark, aliasDir)
    val before = spark.table(idx).count()

    val batch1 = batchBands(0)
    val batch2 = batchBands(1)
    val nB1 = batch1.count()
    assert(nB1 > 0 && batch2.count() > 0, "both batches must be non-empty")

    // screen batch 1 against the pristine corpus index, then admit ALL
    // of it (admission policy is the caller's; admit-all exercises the
    // append deterministically)
    Curation.screenAgainstIndex(spark, idx, batch1).collect()
    Curation.admitToBandIndex(spark, idx, batch1)

    // the index grew by exactly batch 1's band rows — nothing else was
    // rewritten or rescanned
    assert(spark.table(idx).count() == before + nB1)

    // guaranteed visibility: probe with batch 1's OWN band rows under
    // renamed doc_ids — every probe doc must collide with its admitted
    // original (self-collisions are excluded by the probe, so the
    // renamed ids are what make the hit deterministic)
    val probe = batch1.withColumn("doc_id", col("doc_id") + 1000000L)
    val rescreened = Curation.screenAgainstIndex(spark, idx, probe)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b1Ids = batch1.select("doc_id").distinct()
      .collect().map(_.getLong(0))
    b1Ids.foreach { id =>
      assert(rescreened.contains(id + 1000000L),
        s"admitted doc $id invisible to the index probe")
      assert(rescreened(id + 1000000L) <= id,
        "first_dup must be ≤ the admitted original")
    }

    // semantic check: screening batch 2 against the updated index equals
    // screening it against (original corpus ∪ batch 1) computed directly
    val refIdx = TrainingData.minhashBands(spark, aliasDir)
      .filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").as("o_doc"), col("band"), col("k1"), col("k2"))
      .union(batch1.select(col("doc_id").as("o_doc"), col("band"),
        col("k1"), col("k2")))
    val expected = batch2.join(refIdx, Seq("band", "k1", "k2"))
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.countDistinct(col("o_doc"))
        .as("n_dups"),
        org.apache.spark.sql.functions.min(col("o_doc")).as("first_dup"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val got = Curation.screenAgainstIndex(spark, idx, batch2)
      .collect().map(_.toSeq).toSeq
    assert(got == expected)
  }

  test("cross-session admission visibility: a second session that " +
    "resolved the index before an append lists the pre-append files " +
    "until refreshTable, and the appended rows after (the documented " +
    "admitToBandIndex contract)") {
    // own alias => own index; this test appends
    val dir = SparkTestBase.Sf0001 + "/./"
    val stale = Curation.ensureBandIndex(spark, dir)
    spark.sql(s"DROP TABLE $stale")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), stale)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    val idx = Curation.ensureBandIndex(spark, dir)
    val before = spark.table(idx).count()

    // session B: a REAL second session (own analyzer state and relation
    // cache, shared catalog + warehouse — the multi-writer deployment
    // shape) resolves and reads the table pre-append
    val sessionB = spark.newSession()
    assert(sessionB.table(idx).count() == before)

    // session A admits a batch
    val batch = TrainingData.minhashBands(spark, dir)
      .filter(col("doc_id") % 20 === 10)
      .select(col("doc_id"), col("band"), col("k1"), col("k2"))
    val nB = batch.count()
    assert(nB > 0)
    Curation.admitToBandIndex(spark, idx, batch)

    // the writing session sees its own append...
    assert(spark.table(idx).count() == before + nB)
    // ...session B still lists the PRE-append files (stale side of the
    // contract — the documented hazard, not a bug)
    assert(sessionB.table(idx).count() == before,
      "session B saw the append without refreshTable — the documented " +
        "contract (and this test) are stale")
    // ...until it refreshes (the contract's required call)
    sessionB.catalog.refreshTable(idx)
    assert(sessionB.table(idx).count() == before + nB,
      "session B must see the appended rows after refreshTable")
  }

  test("after the append, the probe join still reads the index without " +
    "an exchange") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val idx = Curation.ensureBandIndex(spark, aliasDir)
      def assertExchangeFree(df: DataFrame): Unit = {
        val plan = df.queryExecution.executedPlan
        def hasBucketedScan(p: org.apache.spark.sql.execution.SparkPlan) =
          p.collectFirst {
            case f: FileSourceScanExec if f.relation.bucketSpec.nonEmpty => f
          }.nonEmpty
        val probe = plan.collect { case j: SortMergeJoinExec => j }
          .find(j => Seq(j.left, j.right).exists(hasBucketedScan))
        assert(probe.nonEmpty, s"no SMJ against the bucketed index:\n$plan")
        val idxSide = Seq(probe.get.left, probe.get.right)
          .find(hasBucketedScan).get
        assert(idxSide.collect { case e: ShuffleExchangeLike => e }.isEmpty,
          s"index side shuffles after append:\n$idxSide")
      }
      assertExchangeFree(Curation.screenAgainstIndex(spark, idx,
        batchBands(1)))
      // the streaming probe's batch-id exclusion is a broadcast
      // anti-join on the index side — narrow, so still no exchange
      assertExchangeFree(Curation.aggScreenReport(
        Curation.indexCollisionPairs(spark, idx, batchBands(1),
          Some(batchBands(1).select("doc_id")))))
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}

package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.Curation

/** Streaming ingest dedup end to end: two micro-batches of documents
  * screened against (and admitted into) the persisted band index. Batch
  * 2 must collide with a batch-1 doc THROUGH THE INDEX — the admission
  * is what carries batch 1 forward — and clean docs keep flowing in.
  * Uses its own path alias of the testdata so its index table is
  * disjoint from q107's and the other index suites'. */
class IngestDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // distinct dir string => distinct (isolated, mutable) index table
  private val aliasDir = SparkTestBase.Sf0001 + "//"

  private def sentence(seed: String): String =
    (0 until 24).map(i => s"$seed$i").mkString(" ")

  test("batch 2 collides with batch 1's admitted doc through the index; " +
    "clean docs admit and grow it") {
    // admissions PERSIST in the warehouse (that is the point of the
    // index) — reset this suite's isolated index so a previous test
    // JVM's admitted batches don't pre-populate it
    val stale = Curation.ensureBandIndex(spark, aliasDir)
    spark.sql(s"DROP TABLE $stale")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), stale)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(wh, true)
    val idx = Curation.ensureBandIndex(spark, aliasDir) // fresh corpus-only
    val n0 = spark.table(idx).count()

    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val reports = mutable.Map[Long, Array[org.apache.spark.sql.Row]]()
    val q = IngestDedup.start(in.toDF().toDF("doc_id", "text"), idx,
      (rows, id) => reports.synchronized { reports(id) = rows })
    try {
      // batch 0: two docs with vocabulary disjoint from the corpus —
      // no index collisions, both admitted (8 band rows)
      in.addData((10001L, sentence("qqa")), (10002L, sentence("qqb")))
      q.processAllAvailable()
      // batch 1: one exact copy of doc 10001's text (collides via the
      // bands ADMITTED in batch 0) and one fresh doc
      in.addData((10003L, sentence("qqa")), (10004L, sentence("qqc")))
      q.processAllAvailable()
    } finally q.stop()

    val r0 = reports.synchronized(reports(0L))
    assert(r0.isEmpty, s"batch 0 must screen clean, got ${r0.toSeq}")
    val r1 = reports.synchronized(reports(1L))
    assert(r1.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((10003L, 10001L)),
      s"batch 1 must flag 10003 against admitted 10001, got ${r1.toSeq}")

    // index growth: batches 0 and 1 admitted 3 clean docs × 4 bands;
    // the flagged doc's bands were NOT admitted. The appends ran in
    // foreachBatch's CLONED sessions, so this session's cached file
    // listing is stale — refresh before reading (the documented
    // admitToBandIndex cross-session contract)
    spark.catalog.refreshTable(idx)
    assert(spark.table(idx).count() == n0 + 3 * 4)

    // replay stability: re-running a batch whose clean docs were
    // already admitted (the foreachBatch crash-replay case) must
    // produce the SAME report — self-collisions are excluded and
    // countDistinct absorbs the duplicate band rows
    import spark.implicits._
    val replay = Seq((10003L, sentence("qqa")), (10004L, sentence("qqc")))
      .toDF("doc_id", "text")
    val again = IngestDedup.ingestBatch(spark, idx, replay)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == Seq((10003L, 1L, 10001L)),
      s"replayed report drifted: ${again.toSeq}")
  }

  /** Resets (and returns) an isolated index for `alias` — admissions
    * persist in the warehouse, so each mutating test starts fresh. */
  private def freshIndex(alias: String): String = {
    val stale = Curation.ensureBandIndex(spark, alias)
    spark.sql(s"DROP TABLE $stale")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), stale)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(wh, true)
    Curation.ensureBandIndex(spark, alias)
  }

  test("a batch carrying its own near-dup pair: the default contract " +
    "passes it unflagged, and a crash-replay still reports identically") {
    val idx = freshIndex(SparkTestBase.Sf0001 + "/./.")
    val n0 = spark.table(idx).count()
    import spark.implicits._
    val batch = Seq((20001L, sentence("zza")), (20002L, sentence("zza")))
      .toDF("doc_id", "text")

    val first = IngestDedup.ingestBatch(spark, idx, batch).collect()
    assert(first.isEmpty,
      s"default contract: batch-local dups pass unflagged, got ${first.toSeq}")
    spark.catalog.refreshTable(idx)
    assert(spark.table(idx).count() == n0 + 2 * 4, "both docs admitted")

    // the replay-stability case the per-row self-filter can NOT cover:
    // each doc's batchmate-dup bands are in the index now; only the
    // whole-batch id exclusion keeps the replayed report empty
    val replay = IngestDedup.ingestBatch(spark, idx, batch).collect()
    assert(replay.isEmpty,
      s"replayed intra-dup batch must screen identically: ${replay.toSeq}")
  }

  test("intraBatch=true flags a doc against its smaller-id batchmate " +
    "(keep-first), admits the survivor, and replays stably") {
    val idx = freshIndex(SparkTestBase.Sf0001 + "/././.")
    val n0 = spark.table(idx).count()
    import spark.implicits._
    val batch = Seq((30001L, sentence("yya")), (30002L, sentence("yya")),
        (30003L, sentence("yyb")))
      .toDF("doc_id", "text")

    val first = IngestDedup.ingestBatch(spark, idx, batch, intraBatch = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(first.toSeq == Seq((30002L, 1L, 30001L)),
      s"the LATER dup must flag against the earlier one: ${first.toSeq}")
    spark.catalog.refreshTable(idx)
    assert(spark.table(idx).count() == n0 + 2 * 4,
      "the survivor and the clean doc admit; the flagged doc does not")

    val replay = IngestDedup
      .ingestBatch(spark, idx, batch, intraBatch = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(replay.toSeq == first.toSeq,
      s"replayed intraBatch report drifted: ${replay.toSeq}")
  }

  test("doc_id contract: re-ingesting an indexed id is treated as a " +
    "replay (never self-flags), so id reuse with DIFFERENT text skips " +
    "exactly that one doc — and still flags against every other") {
    val idx = freshIndex(SparkTestBase.Sf0001 + "//./")
    import spark.implicits._
    // seed the index with two distinct admitted docs
    val seed = Seq((50001L, sentence("vva")), (50002L, sentence("vvb")))
      .toDF("doc_id", "text")
    assert(IngestDedup.ingestBatch(spark, idx, seed).collect().isEmpty)

    // replay side of the contract: same id + same text → not flagged
    val sameText = Seq((50001L, sentence("vva"))).toDF("doc_id", "text")
    assert(IngestDedup.ingestBatch(spark, idx, sameText).collect().isEmpty,
      "a true replay must never flag against its own admitted bands")

    // reuse side (the documented under-screening): 50001 reused for
    // text near-identical to ITS OWN old text → the exclusion hides
    // the one legitimate collision and the doc passes unflagged
    val reusedOwn = Seq((50001L, sentence("vva"))).toDF("doc_id", "text")
    assert(IngestDedup.ingestBatch(spark, idx, reusedOwn).collect().isEmpty)

    // but reuse does NOT blind screening to the REST of the corpus:
    // 50001 reused for text duplicating doc 50002 still flags
    val reusedOther = Seq((50001L, sentence("vvb"))).toDF("doc_id", "text")
    val flagged = IngestDedup.ingestBatch(spark, idx, reusedOther)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(flagged.toSeq == Seq((50001L, 50002L)),
      s"id reuse must still screen against other docs: ${flagged.toSeq}")
  }

  test("compactEvery: the stream compacts its own index back to one " +
    "file per bucket and screening keeps working across the swap") {
    val idx = freshIndex(SparkTestBase.Sf0001 + "/.///")
    def filesPerBucket: Set[Int] = {
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), idx)
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val re = "_(\\d{5})\\.".r
      fs.listStatus(wh).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("part-"))
        .flatMap(n => re.findFirstMatchIn(n).map(_.group(1)))
        .groupBy(identity).values.map(_.size).toSet
    }
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val reports = mutable.Map[Long, Array[org.apache.spark.sql.Row]]()
    val q = IngestDedup.start(in.toDF().toDF("doc_id", "text"), idx,
      (rows, id) => reports.synchronized { reports(id) = rows },
      compactEvery = 1)
    try {
      in.addData((40001L, sentence("wwa")), (40002L, sentence("wwb")))
      q.processAllAvailable()
      // batch 2 screens against the COMPACTED index (admissions from
      // batch 1 must have survived the swap)
      in.addData((40003L, sentence("wwa")))
      q.processAllAvailable()
    } finally q.stop()
    assert(reports.synchronized(reports(0L)).isEmpty)
    assert(reports.synchronized(reports(1L))
      .map(r => (r.getLong(0), r.getLong(2))).toSeq == Seq((40003L, 40001L)),
      "screening across a compaction lost the admitted doc")
    spark.catalog.refreshTable(idx)
    assert(filesPerBucket == Set(1),
      s"compactEvery=1 must leave 1 file per bucket, got $filesPerBucket")
  }
}

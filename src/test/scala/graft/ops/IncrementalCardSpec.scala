package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Incremental data card: after every append the maintained card must
  * equal the one-shot q166 computed directly over the union of
  * ingested batches; a replayed batch id is a no-op; and the card
  * reads ONLY the state directory — never the ingested data. */
class IncrementalCardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def direct(upTo: Int): Seq[Any] = {
    T(spark, SparkTestBase.Sf0001, "documents")
      .filter(col("doc_id") % 3 <= upTo)
      .select(col("lang"), col("source"),
        size(expr("filter(split(text, ' '), x -> x != '')")).cast("long")
          .as("ws"),
        graft.functions.Bpe.count(col("text")).as("btok"),
        md5(col("text")).as("digest"))
      .agg(count(lit(1)), countDistinct(col("lang")),
        countDistinct(col("source")), sum("ws"), sum("btok"),
        (count(lit(1)) - countDistinct(col("digest"))), max("btok"))
      .collect()(0).toSeq
  }

  test("card equals the direct one-shot after every append; replay is " +
    "a no-op; the card never rescans the batches") {
    val st = IncrementalCard.init(
      Files.createTempDirectory("graft-inccard-").toString)
    def batch(i: Int) = T(spark, SparkTestBase.Sf0001, "documents")
      .filter(col("doc_id") % 3 === i)
      .select("lang", "source", "text")

    (0 to 2).foreach { i =>
      assert(IncrementalCard.append(spark, st, i.toLong, batch(i)))
      val got = IncrementalCard.card(spark, st).collect()(0).toSeq
      assert(got == direct(i), s"after batch $i")
    }

    // replaying batch 1 must change nothing
    assert(!IncrementalCard.append(spark, st, 1L, batch(1)))
    assert(IncrementalCard.card(spark, st).collect()(0).toSeq == direct(2))

    // the card's scan set is the state dir only
    val files = IncrementalCard.card(spark, st).inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains(st.root)), files.mkString("\n"))
  }

  test("r13: the graded q228 row equals q166's one-shot card and " +
    "re-reads are stable (the bench-reps contract)") {
    val got = Corpus.q228IncrementalCard(spark, SparkTestBase.Sf0001)
      .collect()(0)
    val direct = Corpus.q166DataCard(spark, SparkTestBase.Sf0001)
      .collect()(0)
    assert(got.toSeq == direct.toSeq,
      s"q228 ${got.toSeq} != q166 ${direct.toSeq}")
    val again = Corpus.q228IncrementalCard(spark, SparkTestBase.Sf0001)
      .collect()(0)
    assert(again.toSeq == got.toSeq, "q228 re-read must be stable")
  }

  test("a torn append (partials written, batch id never recorded) is " +
    "invisible to the card, and its replay converges without " +
    "double-counting (ADVICE r10)") {
    val st = IncrementalCard.init(
      Files.createTempDirectory("graft-inccard-t-").toString)
    def batch(i: Int) = T(spark, SparkTestBase.Sf0001, "documents")
      .filter(col("doc_id") % 3 === i)
      .select("lang", "source", "text")
    assert(IncrementalCard.append(spark, st, 0L, batch(0)))
    val afterB0 = IncrementalCard.card(spark, st).collect()(0).toSeq

    // simulate the crash window: batch 1's partials and digests land
    // but the batch-id record never does
    batch(1).select(col("lang"), col("source"),
        size(expr("filter(split(text, ' '), x -> x != '')")).cast("long")
          .as("ws"),
        graft.functions.Bpe.count(col("text")).as("btok"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("ws").as("ws_tokens"),
        sum("btok").as("bpe_tokens"), max("btok").as("max_btok"))
      .withColumn("batch_id", lit(1L))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(st.partials)
    batch(1).select(md5(col("text")).as("digest")).distinct()
      .withColumn("batch_id", lit(1L))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(st.digests)

    // torn rows are invisible: the card still equals the batch-0 state
    assert(IncrementalCard.card(spark, st).collect()(0).toSeq == afterB0,
      "uncommitted partials leaked into the card")

    // the replay re-runs the full append (gate says not recorded) and
    // must converge to the exact two-batch card — no double count
    assert(IncrementalCard.append(spark, st, 1L, batch(1)))
    assert(IncrementalCard.card(spark, st).collect()(0).toSeq == direct(1))
  }

  test("maintain() checkpoints in the state dir: a RESTARTED stream " +
    "continues batch ids instead of restarting at 0 and dropping new " +
    "micro-batches (ADVICE r10)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val st = IncrementalCard.init(
      Files.createTempDirectory("graft-inccard-r-").toString)
    val rows = T(spark, SparkTestBase.Sf0001, "documents")
      .select("lang", "source", "text")
      .as[(String, String, String)].collect().toSeq
    val (first, second) = rows.splitAt(rows.size / 2)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String, String)]
    val stream = in.toDF().toDF("lang", "source", "text")
    val q1 = IncrementalCard.maintain(st, stream)
    try {
      in.addData(first)
      q1.processAllAvailable()
    } finally q1.stop()
    // RESTART against the same source and the same (default, durable)
    // checkpoint: the recovered query continues batch ids where q1
    // stopped. With the r10 bug (no checkpointLocation → a fresh temp
    // checkpoint) the restarted query's ids restarted at 0, collided
    // with recorded batches, and the replay gate silently dropped
    // `second` — this assertion is exactly that data loss.
    val q2 = IncrementalCard.maintain(st, stream)
    try {
      in.addData(second)
      q2.processAllAvailable()
    } finally q2.stop()
    val got = IncrementalCard.card(spark, st).collect()(0).toSeq
    assert(got == direct(2),
      "restart dropped micro-batches through the replay gate")
  }

  test("streaming maintenance: micro-batches keep the card current " +
    "through the same replay-gated protocol") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val st = IncrementalCard.init(
      Files.createTempDirectory("graft-inccard-s-").toString)
    val rows = T(spark, SparkTestBase.Sf0001, "documents")
      .select("lang", "source", "text")
      .as[(String, String, String)].collect().toSeq
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String, String)]
    val q = IncrementalCard.maintain(st,
      in.toDF().toDF("lang", "source", "text"))
    try {
      rows.grouped((rows.size + 1) / 2).foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = IncrementalCard.card(spark, st).collect()(0).toSeq
    assert(got == direct(2)) // every doc fed → equals the full table
  }
}

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

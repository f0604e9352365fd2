package graft.sources.rfc

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.rfc.MockRfcBackend.MockTable

/** R12 — the `sap-rfc` scan's observable telemetry (the DSv2 rendering
  * of the reference's per-page stdout counters,
  * `pyrfc_read_table.py:119-122,151-153`): pages fetched, WA rows read,
  * malformed rows, aggregated by Spark from every task's
  * `currentMetricsValues()` and visible on the listener bus — asserted
  * here from real `SparkListenerTaskEnd` accumulables, not from reader
  * internals. */
class RfcMetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val fields = Seq(RfcField("ID", "N"), RfcField("NAME", "C"))

  test("a multi-page read reports non-zero page/row/err counts " +
    "through SparkListener task accumulables") {
    MockRfcBackend.clear()
    MockRfcBackend.register("ZMET", MockTable(fields,
      (1 to 5).map(i => Seq(f"$i%03d", s"row $i")),
      rawWa = Seq("only-one-cell"))) // 6 WA rows total, 1 malformed
    val sums = TrieMap.empty[String, Long]
    val listener = new SparkListener {
      override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit =
        taskEnd.taskInfo.accumulables.foreach { a =>
          (a.name, a.update) match {
            case (Some(n), Some(u: java.lang.Long))
                if n.startsWith("RFC") =>
              sums.updateWith(n)(prev =>
                Some(prev.getOrElse(0L) + u.longValue()))
            case _ =>
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // pageSize 2 over 6 WA rows → three planned pages, three tasks
      val n = spark.read.format("sap-rfc")
        .option("table", "ZMET").option("pageSize", "2")
        .load().count()
      assert(n == 5) // DROPMALFORMED drops the raw WA row
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (sums.getOrElse("RFC pages fetched", 0L) < 3 &&
        System.nanoTime() < deadline) Thread.sleep(50)
      assert(sums.getOrElse("RFC pages fetched", 0L) == 3,
        s"got $sums — expected one page per planned partition")
      assert(sums.getOrElse("RFC WA rows read", 0L) == 6, s"got $sums")
      assert(sums.getOrElse("RFC malformed WA rows", 0L) == 1, s"got $sums")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("the scan declares the three custom metrics (stable names for " +
    "dashboards)") {
    val names = new RfcScan(
      new org.apache.spark.sql.types.StructType(),
      RfcOptions(Map("table" -> "ZMET")), Nil, None)
      .supportedCustomMetrics().map(_.name()).toSeq
    assert(names == Seq("rfcPagesFetched", "rfcWaRowsRead", "rfcErrRows"))
  }
}

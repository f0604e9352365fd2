package graft.sink

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.TrainingData

/** The q153 sharded-export layout contract: per-shard directories whose
  * files hold pos-ASCENDING rows over DISJOINT CONTIGUOUS pos ranges
  * (so a loader streams a shard in global training order with no sort),
  * ±1-row shard balance, round-robin membership, and exact row
  * preservation of q149's permutation. */
class ShardedWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val Sf = SparkTestBase.Sf0001

  private lazy val outDir = ShardedExport.ensureEpochExport(spark, Sf)
  private lazy val epoch = TrainingData.q149EpochShuffle(spark, Sf)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getInt(3)))

  test("round trip preserves the permutation exactly") {
    val back = spark.read.parquet(outDir)
      .select(col("doc_id"), col("skey"), col("pos"),
        col("shard").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    assert(back.sortBy(_._3).toSeq == epoch.sortBy(_._3).toSeq)
  }

  test("shards balance to ±1 row and membership is pos % 8") {
    val sizes = epoch.groupBy(_._4).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0 until ShardedExport.EpochShards).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    epoch.foreach { case (_, _, pos, shard) =>
      assert(pos % ShardedExport.EpochShards == shard)
    }
  }

  test("each file is pos-ascending over a contiguous range, and a " +
    "shard's files cover disjoint ranges in manifest order") {
    import spark.implicits._
    val manifest = ShardedExport.manifest(spark, outDir)
      .as[(Int, String, Long, Long, Long)].collect()
    assert(manifest.length > ShardedExport.EpochShards,
      "filesPerShard > 1 never produced a multi-file shard — the " +
        "parallel-writer half of the layout is untested")
    // per file: rows ascending, range matches the manifest
    manifest.foreach { case (shard, file, lo, hi, n) =>
      val rows = spark.read.parquet(file)
        .select("pos").collect().map(_.getLong(0))
      assert(rows.length == n)
      assert(rows.toSeq == rows.sorted.toSeq, s"$file not pos-ascending")
      assert(rows.head == lo && rows.last == hi)
      assert(file.contains(s"shard=$shard"))
    }
    // per shard: manifest ranges disjoint; union = the shard's rows
    manifest.groupBy(_._1).foreach { case (shard, files) =>
      val ordered = files.sortBy(_._3)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._4 < b._3,
          s"shard $shard files overlap: $a vs $b")
        case _ =>
      }
      val expect = epoch.filter(_._4 == shard).map(_._3).sorted
      assert(ordered.map(_._5).sum == expect.length)
      assert(ordered.head._3 == expect.head && ordered.last._4 == expect.last)
    }
  }
}

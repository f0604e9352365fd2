package graft.sink

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.T

/** Bloom manifest: the two halves of the shared ticket chain agree
  * (Spark build expression == driver probe math — this is what makes
  * false negatives structurally impossible), no key with rows is ever
  * missed, pruning genuinely binds on the date-clustered layout, and
  * the graded q251 read equals a raw recompute. */
class BloomManifestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  private lazy val fixture = BloomManifest.ensureBloom(spark, dir)

  test("no false negatives: every custkey's candidate set covers every " +
    "file that actually holds its rows") {
    val (data, man) = fixture
    val truth = spark.read.parquet(data)
      .select(input_file_name().as("file"), col("o_custkey"))
      .distinct().collect()
      .groupBy(_.getLong(1)).map { case (k, rs) =>
        k -> rs.map(_.getString(0)).toSet
      }
    truth.foreach { case (key, files) =>
      val cand = BloomManifest.candidateFiles(spark, man, key).toSet
      assert(files.subsetOf(cand),
        s"bloom missed files for key $key: ${files -- cand}")
    }
  }

  test("pruning binds: a point key's candidates are a small fraction " +
    "of the 48 files") {
    val (data, man) = fixture
    val nFiles = spark.read.parquet(man).count()
    // sample of keys: candidates should track the TRUE file count
    // (plus rare false positives), far below the file total
    val keys = T(spark, dir, "orders").select("o_custkey")
      .distinct().limit(20).collect().map(_.getLong(0))
    val trueCounts = spark.read.parquet(data)
      .select(input_file_name().as("file"), col("o_custkey"))
      .filter(col("o_custkey").isin(keys: _*))
      .distinct().groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      val cand = BloomManifest.candidateFiles(spark, man, k).size
      assert(cand <= trueCounts.getOrElse(k, 0L) + 4,
        s"key $k: $cand candidates vs ${trueCounts.getOrElse(k, 0L)} true files")
      assert(cand < nFiles / 2, s"key $k: bloom prunes less than half")
    }
  }

  test("driver probe math equals the Spark build expression") {
    import spark.implicits._
    val keys = Seq(1L, 74L, 999L, 123456789L)
    val probeCols = col("k") +: (0 until 3).map(i =>
      expr(s"cast(conv(substring(md5(concat(cast(k as string), ':$i')), " +
        "1, 15), 16, 10) as bigint) % 8192").as(s"p$i"))
    val sparkSide = keys.toDF("k")
      .select(probeCols: _*)
      .collect().map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    keys.foreach { k =>
      assert(BloomManifest.probePositions(k) == sparkSide(k),
        s"ticket chain diverged for key $k")
    }
  }

  test("q251 graded read equals the raw recompute") {
    val got = graft.SparkEntry.queries("q251_bloom_prune")(spark, dir).collect()(0)
    val key = T(spark, dir, "orders")
      .agg((max("o_custkey") / 2).cast("long")).collect()(0).getLong(0)
    val want = T(spark, dir, "orders")
      .filter(col("o_custkey") === key)
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("s"),
        min(expr("cast(o_orderdate as date)")).as("f"),
        max(expr("cast(o_orderdate as date)")).as("l"))
      .collect()(0)
    assert(got.getLong(0) == want.getLong(0) && got.getLong(0) > 0)
    assert(got.getLong(1) == want.getLong(1))
    assert(got.getDate(2) == want.getDate(2))
    assert(got.getDate(3) == want.getDate(3))
  }
}

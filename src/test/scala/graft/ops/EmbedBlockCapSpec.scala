package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the q79 hot-block cap:
  *
  *  - a synthetic ONE-label corpus (the adversarial case: label blocking
  *    alone would be all-pairs) never forms a comparison block larger
  *    than the cap — the SRP sub-key splits it;
  *  - labels within the cap keep subkey 0, so the default-cap output is
  *    byte-identical to plain label blocking (the oracle's formulation).
  */
class EmbedBlockCapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** 2000 vectors under a single label, 64-dim, fixed seed. */
  private lazy val oneLabel = {
    import spark.implicits._
    val rnd = new scala.util.Random(79)
    (0 until 2000).map { i =>
      (i.toLong, "hot", Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "label", "embedding")
  }

  test("a one-label corpus never forms a block larger than the cap") {
    val cap = 256
    val blocks = TrainingData.subBlocked(oneLabel, cap)
      .groupBy("label", "subkey").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    // bits = min(16, ceil(log2(2000/256)) + 1) = 4 → 16 sub-blocks
    assert(blocks.length == 16, s"expected 16 sub-blocks, got ${blocks.length}")
    val biggest = blocks.map(_._2).max
    assert(biggest <= cap, s"largest sub-block $biggest exceeds cap $cap")
    assert(blocks.map(_._2).sum == 2000L)
    // and the capped query still returns a neighbor for every query row
    // present in a non-singleton sub-block (deterministic fixture: all
    // 40 queries land with company here)
    val capped = TrainingData.embedNeardupCore(oneLabel, cap)
    assert(capped.count() == 40L)
  }

  test("below the cap, subkey is 0 everywhere and the output equals plain " +
    "label blocking") {
    val emb = T(spark, SparkTestBase.Sf0001, "embeddings")
    val sub = TrainingData.subBlocked(emb, 1 << 16)
    assert(sub.filter(col("subkey") =!= 0).count() == 0L)
    // plain label blocking (the pre-r5 shape, also the oracle's)
    val e = emb.withColumn("nrm",
      sqrt(graft.functions.FixDot.normSq(col("embedding")).cast("double")))
    val a = e.filter(col("vec_id") < 40)
      .select(col("vec_id").as("va"), col("label").as("la"),
        col("embedding").as("ea"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vb"), col("label").as("lb"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("va").orderBy(col("sim_raw").desc, col("vb"))
    val plain = a.join(b, col("la") === col("lb") && col("va") =!= col("vb"))
      .withColumn("sim_raw",
        graft.functions.FixDot.dot(col("ea"), col("eb")).cast("double")
          / (col("na") * col("nb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("va"), col("vb"), round(col("sim_raw"), 4).as("sim"))
      .orderBy("va")
      .collect().map(_.toSeq).toSeq
    val got = TrainingData.q79EmbedNeardup(spark, SparkTestBase.Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got == plain)
    assert(got.nonEmpty)
  }
}

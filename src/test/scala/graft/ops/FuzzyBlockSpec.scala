package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the q102 secondary (length-band) blocking:
  *
  *  - EXACT: banding never loses a pair — every edit changes length by
  *    ≤ 1, so dist ≤ 2 ⟹ |Δlen| ≤ 2 ⟹ same-or-adjacent width-3 band;
  *    output equals the noun-only all-pairs formulation row-for-row;
  *  - BOUNDED: a hot noun's comparison count collapses from C(v,2) to
  *    ~9 names per band window (linear in v), the whole point of the
  *    secondary key at catalog scale.
  */
class FuzzyBlockSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** 120 names sharing the noun "box", lengths spread one apart — the
    * hot-noun block the length band exists to break up. */
  private lazy val hotNames = {
    import spark.implicits._
    (1 to 120).map(i => "x" * i + " box").toDF("p_name")
  }

  test("length banding shrinks the hot-noun comparison count from " +
    "quadratic to linear") {
    val dict = Curation.fuzzyNameDict(hotNames)
    val banded = Curation.fuzzyCandidates(dict).count()
    val allPairs = 120L * 119 / 2
    // names per band = 3, probe window = 3 bands ⇒ ≤ 9 counterparts per
    // name before the name_a < name_b halving — linear in v
    assert(banded <= 120L * 9, s"banded candidates not linear: $banded")
    assert(banded < allPairs / 10,
      s"banded=$banded vs allPairs=$allPairs — band gives no shrink")
  }

  test("banded output equals the noun-only all-pairs ground truth") {
    val dict = Curation.fuzzyNameDict(hotNames)
    // the pre-r5 formulation: block on noun alone (quadratic in the block)
    val a = dict.select(col("p_name").as("name_a"), col("noun"),
      col("n_parts").as("cnt_a"))
    val b = dict.select(col("p_name").as("name_b"), col("noun"),
      col("n_parts").as("cnt_b"))
    val brute = a.join(b, Seq("noun"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 2)
      .select("name_a", "name_b", "dist", "cnt_a", "cnt_b")
      .orderBy("name_a", "name_b")
      .collect().map(_.toSeq).toSeq
    val banded = Curation.fuzzyMatchCore(hotNames)
      .collect().map(_.toSeq).toSeq
    assert(banded == brute)
    assert(banded.nonEmpty) // adjacent lengths differ by 1 edit — matches exist
  }
}

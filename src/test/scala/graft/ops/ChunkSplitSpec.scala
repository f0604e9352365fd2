package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q112 window invariants on real corpus data (the DuckDB oracle pins
  * exact content; this spec pins the geometry contract): every non-empty
  * doc chunks, windows are 64 tokens every 48, only the tail may be
  * short, and chunk count is exactly ceil(n/48). */
class ChunkSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("chunk geometry: 64-token windows, 48 stride, short tail only, " +
    "ceil(n/48) chunks per doc") {
    val chunks = TrainingData.q112ChunkSplit(spark, SparkTestBase.Sf0001)
      .collect().groupBy(_.getLong(0))
    val tokens = T(spark, SparkTestBase.Sf0001, "documents")
      .select(col("doc_id"),
        size(expr("filter(split(text, ' '), x -> x != '')")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.nonEmpty)
    tokens.foreach { case (doc, n) =>
      val cs = chunks.getOrElse(doc, Array.empty).sortBy(_.getLong(1))
      if (n == 0) assert(cs.isEmpty, s"doc $doc: empty doc chunked")
      else {
        val expected = (n + 47) / 48 // ceil(n / stride)
        assert(cs.length == expected,
          s"doc $doc: $n tokens -> ${cs.length} chunks, want $expected")
        assert(cs.map(_.getLong(1)).toSeq == (0L until expected),
          s"doc $doc: chunk_idx not dense")
        cs.zipWithIndex.foreach { case (c, i) =>
          val ct = c.getLong(2)
          val start = i * 48
          val want = math.min(64, n - start)
          assert(ct == want,
            s"doc $doc chunk $i: $ct tokens, want $want (n=$n)")
        }
      }
    }
    // overlap really exists somewhere: at least one doc long enough to
    // produce a 64-token window followed by another chunk
    assert(tokens.values.exists(_ > 64), "fixture too short — vacuous")
  }

  test("the subword-tokenizer variant keeps the same geometry contract " +
    "over bpe token counts, and genuinely differs from whitespace") {
    val chunks = TrainingData.chunkSplit(spark, SparkTestBase.Sf0001,
        transform(graft.functions.Bpe.tokens(col("text")),
          x => x.cast("string")))
      .collect().groupBy(_.getLong(0))
    val tokens = T(spark, SparkTestBase.Sf0001, "documents")
      .select(col("doc_id"),
        graft.functions.Bpe.count(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.nonEmpty)
    tokens.foreach { case (doc, n) =>
      val cs = chunks.getOrElse(doc, Array.empty).sortBy(_.getLong(1))
      val expected = ((n + 47) / 48).toInt
      assert(cs.length == expected,
        s"doc $doc: $n bpe tokens -> ${cs.length} chunks, want $expected")
      cs.zipWithIndex.foreach { case (c, i) =>
        assert(c.getLong(2) == math.min(64L, n - i * 48L), s"doc $doc/$i")
      }
    }
    // subword counts exceed whitespace counts (fertility ≥ 1 with the
    // space-prefixed vocab), so at least one doc must chunk differently
    val ws = TrainingData.q112ChunkSplit(spark, SparkTestBase.Sf0001)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sub = chunks.view.mapValues(_.length.toLong).toMap
    assert(sub.exists { case (d, c) => ws.get(d).exists(_ != c) },
      "subword chunking never differed from whitespace — vacuous variant")
  }
}

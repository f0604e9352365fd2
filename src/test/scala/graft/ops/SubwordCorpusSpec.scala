package graft.ops

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q165 (the composed subword-corpus flagship) beyond the DuckDB
  * oracle: a full driver-side recomputation of all four stages from
  * the raw documents, plus the binding property — every language's
  * budget actually cuts (a non-binding budget would make the pipeline
  * a no-op disguised as an admission policy).
  */
class SubwordCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q165 equals the brute-force four-stage pipeline and every " +
    "language's budget binds") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    // stage 1: q83 quality gate at 0.6 (exact r4 rational)
    val gated = docs.filter { case (_, _, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      ws.nonEmpty && {
        val n = ws.length.toLong
        val k = ws.distinct.length.toLong
        val st = ws.count(w => w == "the" || w == "a").toLong
        val num = 10 * math.min(n, 100) * n + 750 * k + 750 * (n - st)
        val den = 2500 * n
        ((2 * num * 10000 + den) / (2 * den)).toDouble / 10000.0 >= 0.6
      }
    }
    // stage 2: exact dedup by md5(text), first doc_id wins
    val deduped = gated.groupBy(d => md5hex(d._3)).values
      .map(_.minBy(_._1)).toSeq
    // stage 3: per-lang subword budget admission in md5-shuffled order
    val keyed = deduped.map { case (id, lang, text) =>
      val tok = graft.functions.Bpe
        .countTokens(UTF8String.fromString(text))
      val skey = java.lang.Long.parseLong(
        md5hex(s"mix:$id").substring(0, 12), 16)
      (lang, skey, id, tok)
    }
    val budgets = TrainingData.LangBudgets.toMap
    val admitted = keyed.groupBy(_._1).toSeq.flatMap { case (lang, xs) =>
      budgets.get(lang).toSeq.flatMap { budget =>
        var cum = 0L
        xs.sortBy(x => (x._2, x._3)).takeWhile { x =>
          val in = cum < budget; cum += x._4; in
        }
      }
    }
    val expect = admitted.groupBy(_._1).map { case (lang, xs) =>
      val toks = xs.map(_._4).sum
      lang -> ((xs.length.toLong, toks, (toks + 1999) / 2000))
    }

    val got = TrainingData.q165SubwordCorpus(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    assert(got.keySet == budgets.keySet)

    // binding: per language, strictly fewer docs admitted than gated
    val gatedPerLang = keyed.groupBy(_._1).view.mapValues(_.size).toMap
    got.foreach { case (lang, (n, _, _)) =>
      assert(n < gatedPerLang(lang), s"$lang budget does not bind")
    }
  }
}

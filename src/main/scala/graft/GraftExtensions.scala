package graft

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BpeCount, BpeTokens, DeflateLen, HtmlCleanStrict, MinhashSig, NgramSet, Simhash64, SrpBucket, VecDot, WinnowFp}
import graft.ops.TrainingData

/** `SparkSessionExtensions` entry point: registers the library's native
  * expressions so SQL users reach them without the Scala Column API —
  * `SELECT srp_bucket(embedding)` and `SELECT vec_dot(a, b)` work in
  * plain `spark.sql`.
  *
  * Wire-up (either):
  *  - `SparkSession.builder.withExtensions(new GraftExtensions)` in code;
  *  - `spark.sql.extensions=graft.GraftExtensions` in config — the path a
  *    cluster deployment uses, no code changes.
  *
  * `srp_bucket(vec)` uses the library's seeded default sign matrix (the
  * one q86 and its DuckDB oracle share); programmatic callers who need
  * custom planes keep using [[SrpBucket.bucket]] directly. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.srpBucketDescriptor)
    ext.injectFunction(GraftExtensions.vecDotDescriptor)
    ext.injectFunction(GraftExtensions.fixDotDescriptor)
    ext.injectFunction(GraftExtensions.simhash64Descriptor)
    ext.injectFunction(GraftExtensions.minhashSigDescriptor)
    ext.injectFunction(GraftExtensions.winnowFpDescriptor)
    ext.injectFunction(GraftExtensions.ngramSetDescriptor)
    ext.injectFunction(GraftExtensions.bpeCountDescriptor)
    ext.injectFunction(GraftExtensions.bpeTokensDescriptor)
    ext.injectFunction(GraftExtensions.deflateLenDescriptor)
    ext.injectFunction(GraftExtensions.htmlCleanStrictDescriptor)
  }
}

object GraftExtensions {
  private[graft] val srpBucketDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("srp_bucket"),
    new ExpressionInfo(classOf[SrpBucket].getName, "srp_bucket"),
    (children: Seq[Expression]) => {
      // Spark's standard wrong-arity UX: an AnalysisException with the
      // WRONG_NUM_ARGS error class (what built-in functions raise), not
      // a bare IllegalArgumentException escaping analysis.
      if (children.length != 1) {
        throw new AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "`srp_bucket`",
            "expectedNum" -> "1",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }
      SrpBucket(children.head, TrainingData.lshPlanes)
    })

  private[graft] val vecDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => {
      if (children.length != 2) {
        throw new AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "`vec_dot`",
            "expectedNum" -> "2",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }
      VecDot(children.head, children(1))
    })

  /** `fix_dot(a, b)` — the r12 determinism kernel as SQL: 2¹⁶
    * fixed-point INTEGER dot of two float vectors (order-invariant —
    * see [[graft.functions.FixDot]]); `fix_dot(v, v)` is the integer
    * squared norm. */
  private[graft] val fixDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("fix_dot"),
    new ExpressionInfo(classOf[graft.functions.FixDot].getName, "fix_dot"),
    (children: Seq[Expression]) => {
      if (children.length != 2) {
        throw new AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "`fix_dot`",
            "expectedNum" -> "2",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }
      graft.functions.FixDot(children.head, children(1))
    })

  private def unaryDescriptor(name: String, cls: Class[_],
                              build: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (children: Seq[Expression]) => {
      if (children.length != 1) {
        throw new AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> s"`$name`",
            "expectedNum" -> "1",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }
      build(children.head)
    })

  private[graft] val simhash64Descriptor =
    unaryDescriptor("simhash64", classOf[Simhash64], Simhash64(_))

  private[graft] val minhashSigDescriptor =
    unaryDescriptor("minhash_sig", classOf[MinhashSig], MinhashSig(_))

  private[graft] val winnowFpDescriptor =
    unaryDescriptor("winnow_fp", classOf[WinnowFp], WinnowFp(_))

  private[graft] val ngramSetDescriptor =
    unaryDescriptor("ngram_hash_set", classOf[NgramSet], NgramSet(_))

  private[graft] val bpeCountDescriptor =
    unaryDescriptor("bpe_count", classOf[BpeCount], BpeCount(_))

  private[graft] val bpeTokensDescriptor =
    unaryDescriptor("bpe_tokens", classOf[BpeTokens], BpeTokens(_))

  private[graft] val deflateLenDescriptor =
    unaryDescriptor("deflate_len", classOf[DeflateLen], DeflateLen(_))

  private[graft] val htmlCleanStrictDescriptor =
    unaryDescriptor("html_clean_strict", classOf[HtmlCleanStrict],
      HtmlCleanStrict(_))

  /** Same registration against an already-built session (tests, REPL). */
  def register(registry: FunctionRegistry): Unit = {
    Seq(srpBucketDescriptor, vecDotDescriptor, fixDotDescriptor,
      simhash64Descriptor,
      minhashSigDescriptor, winnowFpDescriptor, ngramSetDescriptor,
      bpeCountDescriptor, bpeTokensDescriptor, deflateLenDescriptor,
      htmlCleanStrictDescriptor)
      .foreach { case (id, info, builder) =>
        registry.registerFunction(id, info, builder)
      }
  }
}

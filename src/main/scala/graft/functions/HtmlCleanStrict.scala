package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The q205 STRICT extraction tier: a single-pass, quote-aware HTML
  * tag/boilerplate stripper for pages that violate the regex tier's
  * contract (`graft.ops.Corpus.htmlClean` — attribute values containing
  * a literal `>`, or unclosed drop-containers). The regex tier stays
  * the 100 TB fast path; rows the gate (`Corpus.htmlRegexSafe`) rejects
  * take this expression INSIDE THE SAME PROJECTION — a
  * `when(gate, regexTier).otherwise(strictTier)` branch, so routing
  * costs no second scan, no union, no exchange, and the whole chain
  * stays in one WholeStageCodegen span (codegen emits a static call to
  * [[HtmlStrict.clean]], the same pattern as Spark's own string
  * builtins).
  *
  * Semantics (deliberately mirrors the regex tier wherever the
  * contract holds, so the two tiers are interchangeable on
  * contract-satisfying pages — HtmlExtractSpec's differential property
  * pins that):
  *  - a tag spans `<` to the first `>` NOT inside a quoted attribute
  *    value; a quote opens only directly after `=` (HTML attribute
  *    grammar), so a stray quote in text cannot derail the scan;
  *  - an opened script/style/nav/footer drops content through its
  *    FIRST case-insensitive `</name[ \t\n\r]*>` close — or to EOF
  *    when unclosed (real-parser semantics; the regex tier would leave
  *    the content, which is exactly why such pages route here);
  *  - every tag / dropped span emits one space; then the five core
  *    entities decode (`&amp;` last) and `[ \t\n\r]+` runs collapse,
  *    identical to the regex tier's tail. */
object HtmlStrict {

  /** THE canonical drop-container list — the regex tier
    * (`graft.ops.Corpus.htmlClean`), its admission gate, and this
    * strict tier all read this one constant (r13 review: a tag added
    * to one copy but not the other would leak boilerplate exactly on
    * the routed pages). Immutable by type — a mutable shared Array
    * would let any caller silently desync the three consumers. */
  val DropTags: Vector[String] = Vector("script", "style", "nav", "footer")

  private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /** Index of the `>` ending the tag opened at `lt` (quote-aware), or
    * -1 when the tag never closes. */
  private def tagEnd(html: String, lt: Int): Int = {
    val n = html.length
    var j = lt + 1
    var q: Char = 0
    var last: Char = 0
    while (j < n) {
      val c = html.charAt(j)
      if (q != 0) {
        if (c == q) { q = 0; last = c }
      } else if (c == '>') {
        return j
      } else {
        if ((c == '"' || c == '\'') && last == '=') q = c
        if (!isWs(c)) last = c
      }
      j += 1
    }
    -1
  }

  /** Index AFTER the first `</name[ \t\n\r]*>` at or past `from`
    * (case-insensitive), or -1. */
  private def findClose(html: String, from: Int, name: String): Int = {
    val n = html.length
    var k = from
    while (k >= 0 && k < n) {
      k = html.indexOf('<', k)
      if (k < 0) return -1
      if (k + 1 < n && html.charAt(k + 1) == '/') {
        val s = k + 2
        if (s + name.length <= n &&
            html.regionMatches(true, s, name, 0, name.length)) {
          var e = s + name.length
          while (e < n && isWs(html.charAt(e))) e += 1
          if (e < n && html.charAt(e) == '>') return e + 1
        }
      }
      k += 1
    }
    -1
  }

  /** The full strict tier: strip + drop + decode + collapse. Total —
    * never throws, any string input yields a string. */
  def clean(html: String): String = {
    val n = html.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        val end = tagEnd(html, i)
        if (end < 0) { sb.append(html, i, n); i = n }
        else {
          val inner = i + 1
          val isClose = inner < end && html.charAt(inner) == '/'
          val nameStart = if (isClose) inner + 1 else inner
          var ne = nameStart
          while (ne < end && isNameChar(html.charAt(ne))) ne += 1
          sb.append(' ')
          var dropped = false
          if (!isClose && (ne == end || isWs(html.charAt(ne)) ||
              html.charAt(ne) == '/')) {
            val len = ne - nameStart
            var d = 0
            while (!dropped && d < DropTags.length) {
              val t = DropTags(d)
              if (t.length == len &&
                  html.regionMatches(true, nameStart, t, 0, len)) {
                val after = findClose(html, end + 1, t)
                i = if (after < 0) n else after
                dropped = true
              }
              d += 1
            }
          }
          if (!dropped) i = end + 1
        }
      } else { sb.append(c); i += 1 }
    }
    var s = sb.toString
    s = s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")
    collapseWs(s)
  }

  /** Linear cross-type container-interleave detector — the gate's
    * third violation check, previously a tempered-dot regex
    * (`<A…>((?!</A…>).)*</?(B|C|D)`) whose per-position lookahead +
    * backtracking is superlinear on large/adversarial pages (r13
    * advice) — unacceptable for a predicate that runs on every row of
    * a 100 TB corpus. This is the same decision computed exactly:
    * TRUE iff some completed open container tag `<A …>` is followed by
    * an open-or-close tag of a DIFFERENT container type strictly
    * before A's first full close `</A[ \t\n\r]*>`.
    *
    * One tokenizing pass over the page (each `<` classifies against
    * the four [[DropTags]] names in O(1)), then O(tokens) suffix
    * bookkeeping + O(anchors·log tokens) binary searches — worst-case
    * near-linear regardless of input shape. Token grammar mirrors the
    * regex exactly:
    *  - anchor (the regex's `<A(>|[ \t\n\r/][^>]*>)`): an OPEN of A
    *    whose tag completes with a `>`;
    *  - close-of-A lookahead (`</A[ \t\n\r]*>`): a FULL close;
    *  - target (`</?(B|C|D)[ \t\n\r/>]`): any open-or-close of another
    *    type — completion NOT required, a boundary char suffices.
    * Total: never throws, any string yields a boolean. */
  def crossNest(html: String): Boolean = {
    import scala.collection.mutable.ArrayBuffer
    val n = html.length
    val nT = DropTags.length
    val loosePos = new ArrayBuffer[Int]; val looseT = new ArrayBuffer[Int]
    val closeByT = Array.fill(nT)(new ArrayBuffer[Int])
    val anchEnd = new ArrayBuffer[Int];  val anchT = new ArrayBuffer[Int]
    var i = 0
    while (i < n) {
      if (html.charAt(i) == '<') {
        var j = i + 1
        val isClose = j < n && html.charAt(j) == '/'
        if (isClose) j += 1
        var t = 0
        var hit = -1
        while (hit < 0 && t < nT) {
          val name = DropTags(t)
          val ne = j + name.length
          if (ne < n && html.regionMatches(true, j, name, 0, name.length)) {
            val c = html.charAt(ne)
            if (isWs(c) || c == '/' || c == '>') hit = t
          }
          t += 1
        }
        if (hit >= 0) {
          val ne = j + DropTags(hit).length
          loosePos += i; looseT += hit
          if (isClose) {
            var k = ne
            while (k < n && isWs(html.charAt(k))) k += 1
            if (k < n && html.charAt(k) == '>') closeByT(hit) += i
          } else {
            val c = html.charAt(ne)
            val end = if (c == '>') ne else html.indexOf('>', ne + 1)
            if (end >= 0) { anchEnd += end; anchT += hit }
          }
        }
      }
      i += 1
    }
    val m = loosePos.length
    if (anchEnd.isEmpty || m == 0) return false
    val lp = loosePos.toArray
    val lt = looseT.toArray
    // nxtOther(t)(k): first loose-token index >= k whose type != t
    val nxtOther = Array.fill(nT, m + 1)(m)
    var k = m - 1
    while (k >= 0) {
      var t = 0
      while (t < nT) {
        nxtOther(t)(k) = if (lt(k) != t) k else nxtOther(t)(k + 1)
        t += 1
      }
      k -= 1
    }
    // first index in sorted `arr` with value > e (arrays are
    // position-sorted by construction of the left-to-right scan)
    def upper(arr: Array[Int], e: Int): Int = {
      var lo = 0; var hi = arr.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid) <= e) lo = mid + 1 else hi = mid
      }
      lo
    }
    val closeArr = closeByT.map(_.toArray)
    var a = 0
    while (a < anchEnd.length) {
      val t = anchT(a); val e = anchEnd(a)
      val oi = nxtOther(t)(upper(lp, e))
      val otherPos = if (oi < m) lp(oi) else Int.MaxValue
      val cs = closeArr(t)
      val ci = upper(cs, e)
      val closePos = if (ci < cs.length) cs(ci) else Int.MaxValue
      if (otherPos < closePos) return true
      a += 1
    }
    false
  }

  /** `[ \t\n\r]+` → one space, then trim — the regex tier's exact
    * collapse, as one pass. */
  private def collapseWs(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}

/** Column-level wrapper for [[HtmlStrict.clean]] — a codegen'd unary
  * string expression (no UDF: stays inside whole-stage codegen next to
  * the regex tier it backstops). */
case class HtmlCleanStrict(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"html_clean_strict requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "html_clean_strict"

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      HtmlStrict.clean(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.HtmlStrict.clean($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): HtmlCleanStrict =
    copy(child = newChild)
}

object HtmlCleanStrict {
  def clean(c: Column): Column =
    ColumnBridge.column(HtmlCleanStrict(ColumnBridge.expression(c)))
}

/** Column-level wrapper for [[HtmlStrict.crossNest]] — the gate's
  * cross-type interleave detector as a codegen'd boolean expression
  * (replaces the superlinear tempered-dot `rlike` alternation; stays in
  * the same WholeStageCodegen span as the rest of the gate). */
case class HtmlCrossNest(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"html_cross_nest requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "html_cross_nest"

  override protected def nullSafeEval(v: Any): Any =
    HtmlStrict.crossNest(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HtmlStrict.crossNest($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): HtmlCrossNest =
    copy(child = newChild)
}

object HtmlCrossNest {
  def apply(c: Column): Column =
    ColumnBridge.column(HtmlCrossNest(ColumnBridge.expression(c)))
}

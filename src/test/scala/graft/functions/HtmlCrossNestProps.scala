package graft.functions

import java.util.regex.Pattern

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck pin for the linear cross-nest scanner
  * ([[HtmlStrict.crossNest]]): it must compute EXACTLY the decision the
  * r13 tempered-dot regex alternation encoded —
  * `(?is)<A(>|[ \t\n\r/][^>]*>)((?!</A[ \t\n\r]*>).)*</?(B|C|D)[ \t\n\r/>]`
  * over the four container types — on arbitrary container soups. The
  * regex stays here as the test-side reference ONLY (its superlinear
  * backtracking is why the shipped gate replaced it; on these bounded
  * fixtures it is safe to evaluate). Pure JVM, no Spark session. */
object HtmlCrossNestProps extends Properties("HtmlCrossNest") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(300)

  private val tags = HtmlStrict.DropTags

  /** The original gate regex, per anchor type. */
  private val refPatterns: Seq[Pattern] = tags.map { a =>
    val others = tags.filterNot(_ == a).mkString("|")
    Pattern.compile(s"(?is)<$a(>|[ \\t\\n\\r/][^>]*>)" +
      s"((?!</$a[ \\t\\n\\r]*>).)*</?($others)[ \\t\\n\\r/>]")
  }

  private def ref(html: String): Boolean =
    refPatterns.exists(_.matcher(html).find())

  // Fragment soup biased toward the constructs the decision hinges on:
  // complete/incomplete opens, sloppy closes, case flips, boundary
  // near-misses (<navbar>), attribute junk, quoted '>'.
  private val frag: Gen[String] = {
    val tag = Gen.oneOf(tags)
    val cased = tag.flatMap(t => Gen.oneOf(t, t.toUpperCase, t.capitalize))
    Gen.oneOf(
      cased.map(t => s"<$t>"),
      cased.map(t => s"</$t>"),
      cased.map(t => s"</$t >"),
      cased.map(t => s"<$t class=\"x\">"),
      cased.map(t => s"<$t/>"),
      cased.map(t => s"<$t"),          // incomplete open (no '>')
      cased.map(t => s"<$t x=\">\">"), // quoted '>' inside the open tag
      cased.map(t => s"</$t"),         // incomplete close
      cased.map(t => s"<${t}bar>"),    // boundary near-miss
      Gen.oneOf("text", " ", "\n", "<p>", "</p>", "<", ">", "</",
        "a<b", "&amp;", "<a href=\"/x\">", "x > y"))
  }

  private val page: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n, frag)).map(_.mkString)

  property("scanner == reference regex on container soups") =
    Prop.forAll(page) { html =>
      val got = HtmlStrict.crossNest(html)
      val want = ref(html)
      if (got != want)
        println(s"crossNest mismatch on ${html.replace("\n", "\\n")}: " +
          s"scanner=$got regex=$want")
      got == want
    }

  property("scanner == reference regex on hand-picked orderings") = {
    val cases = Seq(
      "", "<nav>", "</nav>", "<nav></nav>",
      "<footer>a<nav>b</footer>c</nav>d</footer>KEEP",
      "<footer>y<nav>x</footer>z</nav>",
      "</nav>A<nav>never closes",
      "<nav><nav></nav>",                  // same-type nesting: no flag
      "<nav>x</nav><footer>y</footer>",    // sequential: no flag
      "<nav x=\"<footer \">text</nav>",    // other-open inside markup
      "<script>if (1 < 2) {}</script><style>p{}</style>",
      "<NAV>a<Footer>b</NAV>", "<nav", "<nav ", "<nav x=1",
      "<nav></nav",                        // incomplete close: no close
      "<nav>a</nav x>b<footer>",           // sloppy close is NOT a close
      "<nav>a</nav >b<footer>")            // ws-only close IS a close
    Prop.all(cases.map { html =>
      Prop(HtmlStrict.crossNest(html) == ref(html)) :| s"on: $html"
    }: _*)
  }
}

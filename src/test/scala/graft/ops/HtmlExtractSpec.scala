package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** q205 (HTML boilerplate extraction) beyond the DuckDB oracle (which
  * runs the identical regex pipeline): the spec proves the EXTRACTION
  * SEMANTICS independently — the expected clean text is reconstructed
  * driver-side from the raw document fields with plain string code (no
  * regex), so a pipeline that mangled content while agreeing with its
  * own oracle twin would fail here. Plus adversarial unit cases on the
  * shared `htmlClean` core for the behaviors the corpus render cannot
  * exercise. */
class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.Sf0001

  /** Independent whitespace collapse — char-by-char, no regex. */
  private def collapse(s: String): String = {
    val sb = new StringBuilder
    var inWs = false
    s.foreach { c =>
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') inWs = true
      else { if (inWs && sb.nonEmpty) sb += ' '; inWs = false; sb += c }
    }
    sb.toString
  }

  test("q205 clean text equals the driver-side reconstruction: title + " +
    "decoded h1 + round-tripped body; nav/script/style/footer gone") {
    val raw = T(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val got = Corpus.q205HtmlExtract(spark, dir).collect()
    assert(got.length == raw.size)
    got.foreach { r =>
      val (source, text) = raw(r.getLong(0))
      val expected = collapse(
        s"""$source $source & "Co.'s" <guide> $text""")
      assert(r.getString(3) == expected,
        s"doc ${r.getLong(0)}:\n got=${r.getString(3)}\n exp=$expected")
      assert(r.getLong(2) == expected.length.toLong)
      // render emits 24 fixed tags per doc (independent hand count of
      // the template; body text is entity-encoded so it adds none)
      assert(r.getLong(1) == 24L, s"n_tags=${r.getLong(1)}")
    }
  }

  test("htmlClean unit cases: double-encoded entities round-trip, " +
    "multiline drop-containers vanish, attributes strip with the tag") {
    import spark.implicits._
    val cases = Seq(
      // &amp;lt; must decode to the LITERAL &lt; (amp decodes last)
      ("<p>&amp;lt; &amp;amp;</p>", "&lt; &amp;"),
      ("<script>\nvar a = 1;\nif (a < 2) {}\n</script>ok", "ok"),
      ("<SCRIPT>x</SCRIPT>tail", "tail"), // (?i) on the container tag
      ("<nav class=\"top\" data-x='1'>menu</nav>kept", "kept"),
      ("<a href=\"/x\" title=\"t\">link</a>", "link"),
      ("a\t\tb\r\nc   d", "a b c d"),
      ("<footer>f1</footer>mid<footer>f2</footer>", "mid"), // non-greedy
      // tag-name boundary: <navbar>/<footer-nav> are NOT containers —
      // their content survives (tags themselves strip) and they must
      // not swallow text through a later real close tag
      ("<navbar>A</navbar> keep <nav>B</nav> end", "A keep end"),
      ("<footer-nav>menu</footer-nav>ok", "menu ok"),
      // regex-tier contract: a self-closing <nav/> counts as an opener
      // and pairs with the next </nav> (the documented stub boundary)
      ("<nav/>chrome</nav>after", "after"),
      ("<nav\n data-x=\"1\">multi\nline</nav>z", "z") // whitespace after name
    )
    val got = cases.map(_._1).toDF("html")
      .select(Corpus.htmlClean(col("html"))).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, e) => assert(g == e) }
  }

  test("r13 strict tier: gate admits the whole graded fixture (so the " +
    "regex-only oracle stays a complete check) and both tiers agree on " +
    "every contract-satisfying page") {
    import spark.implicits._
    // the graded corpus routes 100% through the regex tier
    val enc = expr(
      "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')")
    val html = concat(
      lit("<html><head><title>"), col("source"),
      lit("</title><style>p{margin:0}</style>" +
        "<script type=\"text/javascript\">if (1 < 2) { x(\"&amp;\"); }" +
        "</script></head><body>" +
        "<nav><a href=\"/\">Home</a> | <a href=\"/about\">About</a></nav>" +
        "<h1>"),
      col("source"),
      lit(" &amp; &quot;Co.&#39;s&quot; &lt;guide&gt;</h1><p>"), enc,
      lit("</p><footer>Copyright &quot;2026&quot; &amp; Co.</footer>" +
        "</body></html>"))
    val fixture = T(spark, dir, "documents").select(html.as("html"))
    assert(fixture.filter(!Corpus.htmlRegexSafe(col("html"))).count() == 0L,
      "a fixture page tripped the gate — the oracle would no longer " +
        "prove the shipped (routed) output")
    // differential property: on every safe page above plus the unit
    // cases, strict == regex (the tiers are interchangeable exactly
    // where the gate admits)
    val safePages = fixture.limit(50).as[String].collect() ++ Seq(
      "<p>&amp;lt; &amp;amp;</p>", "<SCRIPT>x</SCRIPT>tail",
      "<nav class=\"top\" data-x='1'>menu</nav>kept",
      "<navbar>A</navbar> keep <nav>B</nav> end",
      "<nav/>chrome</nav>after", "a\t\tb\r\nc   d",
      "text with 1 < 2 loose and a 'stray' \"quote\"",
      "<footer>f1</footer>mid<footer>f2</footer>")
    val both = safePages.toSeq.toDF("html")
      .select(Corpus.htmlRegexSafe(col("html")).as("safe"),
        Corpus.htmlClean(col("html")).as("rx"),
        graft.functions.HtmlCleanStrict.clean(col("html")).as("st"))
      .collect()
    both.foreach { r =>
      assert(r.getBoolean(0), "differential corpus must be gate-safe")
      assert(r.getString(1) == r.getString(2),
        s"tiers diverged on a safe page: rx=${r.getString(1)} st=${r.getString(2)}")
    }
  }

  test("r13 strict tier: contract-violating pages route to the state " +
    "machine, which extracts what the regex tier would mangle") {
    import spark.implicits._
    val cases = Seq(
      // literal '>' inside a quoted attribute value: the quote-unaware
      // strip would cut the tag at that '>' and leak `y">` into text
      ("<a href=\"x>y\">link</a>", false, "link"),
      ("<img alt='a > b'>pic", false, "pic"),
      // unclosed drop-container: the regex tier cannot match the span,
      // boilerplate would leak; the strict tier drops to EOF
      ("<p>body</p><nav>menu never closes", false, "body"),
      // footer unclosed → everything after it drops to EOF
      ("<footer>chrome<p>tail", false, ""),
      // quoted '>' inside a drop container's OPEN tag: both violations
      ("<nav data-x=\"a>b\">menu</nav>kept", false, "kept"),
      // r13 review: ORDERING violations an open/close COUNT cannot see
      // — close before open (1–1 balanced, span regex can't match)
      ("</nav>A<nav>boilerplate never closes", false, "A"),
      // — interleaved containers (per-tag balanced; the nav span
      //   swallows footer's close, so footer chrome would leak in the
      //   regex tier; the strict tier drops footer to its real close)
      ("<footer>y<nav>x</footer>z</nav>", false, "z"),
      // r13 review, second pass: cross-type interleave with a SECOND
      // outer close — the fold consumes all container markup but pairs
      // the wrong spans (regex tier would emit only KEEP, silently
      // dropping 'c d'); the crossNest clause must route it
      ("<footer>a<nav>b</footer>c</nav>d</footer>KEEP", false, "c d KEEP"),
      // and a safe page for contrast
      ("<p>plain</p>", true, "plain"))
    val got = cases.map(_._1).toDF("html")
      .select(Corpus.htmlRegexSafe(col("html")).as("safe"),
        Corpus.htmlCleanRouted(col("html")).as("clean"))
      .collect()
    got.zip(cases).foreach { case (r, (in, expSafe, expClean)) =>
      assert(r.getBoolean(0) == expSafe, s"gate on: $in")
      assert(r.getString(1) == expClean,
        s"routed clean on: $in → got ${r.getString(1)}")
    }
  }
}

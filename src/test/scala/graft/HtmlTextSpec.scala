package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.HtmlText

class HtmlTextSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def extract(htmls: String*): Seq[String] =
    htmls.toDF("h").select(HtmlText.extractText(col("h")))
      .as[String].collect().toSeq

  test("script/style/comment bodies vanish, including braces and '<'") {
    assert(extract(
      "<p>a b.</p><script>if (x < 2) { bad(); }</script><p>c d.</p>",
      "<style>p { color: red }</style><p>keep.</p>",
      "<!-- <p>not content</p> --><p>real.</p>") ===
      Seq("a b.\nc d.", "keep.", "real."))
  }

  test("block tags break lines; inline tags strip in place") {
    assert(extract(
      "<div>one</div><div>two</div>",
      "x<br>y",
      "<p>a <b>bold</b> word</p>",
      "<table><tr><td>c1</td><td>c2</td></tr></table>") ===
      Seq("one\ntwo", "x\ny", "a bold word", "c1\nc2"))
  }

  test("entities decode after tag strip; single-pass semantics") {
    // &lt;p&gt; must surface as literal text, never become a tag
    assert(extract("<p>a &lt;p&gt; b</p>") === Seq("a <p> b"))
    // single-pass: &amp;lt; decodes its &amp; once, never re-scans
    assert(extract("<p>x &amp;lt; y</p>") === Seq("x &lt; y"))
    assert(extract("<p>a&nbsp;&nbsp;b &quot;q&quot; &#39;s&#39;</p>") ===
      Seq("a b \"q\" 's'"))
  }

  test("numeric character references decode; malformed pass through") {
    assert(extract("<p>a&#8212;b &#x2014; c</p>") === Seq("a—b — c"))
    // supplementary-plane code point (surrogate pair in the output)
    assert(extract("<p>ok &#x1F600;</p>") === Seq("ok 😀"))
    // maximum-length bodies: U+10FFFF decimal and hex (8-char bodies)
    val mx = new String(Character.toChars(0x10FFFF))
    assert(extract("<p>m &#1114111; &#x10FFFF; m</p>") ===
      Seq(s"m $mx $mx m"))
    // malformed forms stay literal: bad digits, surrogate range,
    // unknown name, bare ampersand, unterminated reference
    assert(extract("<p>a &#zz; &#xD800; &unknown; b & c &gt</p>") ===
      Seq("a &#zz; &#xD800; &unknown; b & c &gt"))
  }

  test("whitespace collapses per line; blank lines drop") {
    assert(extract("<p>  a \t b  </p><p>   </p><p>c</p>") ===
      Seq("a b\nc"))
  }

  private def c4(texts: Seq[String], minWords: Int = 5, minSent: Int = 3) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    HtmlText.c4Filter(df, "t", minWords, minSent)
      .orderBy("id")
      .select("c4_text", "n_lines_kept", "n_sentences", "c4_keep")
      .as[(String, Long, Long, Int)].collect().toSeq
  }

  test("line rule: terminal punctuation, min words, javascript word") {
    val r = c4(Seq(Seq(
      "this line has five words.",   // kept: 5 words, '.'
      "only four words here.",       // dropped: 4 words
      "no terminal punctuation on this line", // dropped
      "a quote ended line counts too\"", // kept: ends '"'
      "please enable JavaScript to continue now.", // dropped: word filter
      "third sentence makes the page pass!").mkString("\n")))
    assert(r === Seq((
      "this line has five words.\n" +
        "a quote ended line counts too\"\n" +
        "third sentence makes the page pass!",
      3L, 2L, 0))) // '"' is not a sentence mark: 2 sentences < 3 → drop
  }

  test("page rules: lorem ipsum, braces (even in dropped lines), min sentences") {
    val good = "one good sentence sits here.\n" +
      "two good sentences sit here.\nthree good sentences sit here."
    val lorem = good + "\nLorem Ipsum dolor sit amet filler."
    val brace = good + "\nfunction f() { short }"  // line dropped, page dies
    val short2 = "one good sentence sits here.\ntwo good sentences sit here."
    val r = c4(Seq(good, lorem, brace, short2))
    assert(r.map(_._4) === Seq(1, 0, 0, 0))
    // the brace page still reports its retained lines and sentences
    assert(r(2)._2 === 3L && r(2)._3 === 3L)
    // sentence threshold is on RETAINED text only
    assert(r(3)._3 === 2L)
  }

  test("sentence count reads retained text, not the raw page") {
    // the dropped four-word line contributes no sentence
    val t = "drop this short line.\n" + // 4 words → dropped
      "first real sentence goes right here. and a second one follows it!\n" +
      "the third sentence arrives at last."
    val r = c4(Seq(t))
    assert(r.head._3 === 3L && r.head._4 === 1)
  }

  private def rows(html: String): Seq[(Long, Long, Long, String)] =
    HtmlText.tableRows(Seq((1L, html)).toDF("id", "h"), "id", col("h"))
      .orderBy("table_idx", "row_idx")
      .select("table_idx", "row_idx", "n_cells", "row_text")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("tableRows linearizes cells with inner tags and entities") {
    val html = """<p>x</p><table><tr><th>Name</th><th>City &amp; Zip</th></tr>
      |<tr><td>A <b>bold</b> name</td><td> Berlin&nbsp;10115 </td></tr>
      |</table>""".stripMargin
    assert(rows(html) === Seq(
      (0L, 0L, 2L, "Name | City & Zip"),
      (0L, 1L, 2L, "A bold name | Berlin 10115")))
  }

  test("tableRows: multiple tables index independently; comments ignored") {
    val html = "<table><!-- <tr>decoy</tr> --><tr><td>a</td></tr></table>" +
      "<p>gap</p><table><tr><td>b</td><td>c</td></tr></table>"
    assert(rows(html) === Seq(
      (0L, 0L, 1L, "a"),
      (1L, 0L, 2L, "b | c")))
  }

  test("tableRows: no tables or malformed tables yield no rows") {
    assert(rows("<p>plain</p>") === Seq())
    // unclosed table: the lazy (?s) match finds no </table>
    assert(rows("<table><tr><td>a</td></tr>") === Seq())
    // row with no cells still surfaces (n_cells 0, empty text)
    assert(rows("<table><tr>bare</tr></table>") ===
      Seq((0L, 0L, 0L, "")))
  }
}

package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.HtmlText

/** HTML→text + C4 line-filter surface ([[graft.operators.HtmlText]]).
  * The fixtures carry clean text (verified: no newlines, no `<`/`&`,
  * no braces, no punctuation), so each query SYNTHESIZES a
  * deterministic HTML page around the doc's text — title, nav
  * boilerplate, a styled/script head whose bodies contain braces, a
  * bare `<` and the word "javascript" (which extraction must remove
  * BEFORE the C4 page rules look for them), entities (`&amp;`,
  * `&nbsp;`, and a stripped-tags-then-decode `&lt;cite&gt;` probe),
  * plus doc_id-keyed optional lines: a JavaScript warning (dropped by
  * the line rule), the doc text as a content line, a lorem-ipsum
  * line and a curly-brace line (each dropping the whole page). The
  * Spark side runs the REAL extractor + filter over the markup; the
  * oracle constructs the expected clean text and verdicts
  * independently from the planted components — the PiiQueries
  * discipline, so a parser bug on either side breaks the hash.
  */
object HtmlQueries {

  private def a = col("doc_id") % 3 // 0 → JavaScript warning line
  private def b = col("doc_id") % 5 // 2 → omit the doc-text line
  private def c = col("doc_id") % 11 // 0 → lorem ipsum (page drop)
  private def d = col("doc_id") % 13 // 5 → curly line (page drop)

  /** The planted page, Spark side. Shared with the curation pipeline's
    * head stage. */
  private[queries] def plantedHtml: Column = {
    val id = col("doc_id").cast("string")
    concat(
      lit("<html><head><title>Doc "), id, lit("</title>"),
      lit("<style>body { color: red; }</style>"),
      lit("<script type=\"text/javascript\">" +
        "var x = 1; if (x < 2) { alert(\"&amp;\"); }</script>"),
      lit("</head><body><!-- nav below, with <p>fake tags</p> -->"),
      lit("<div id=\"nav\">Home | About | Contact</div>"),
      lit("<h1>Doc "), id, lit("</h1>"),
      lit("<p><b>Article</b> "), id,
      lit(" begins &amp; ends&nbsp;&nbsp;with a short sentence.</p>"),
      when(a === 0,
        lit("<p>Please enable JavaScript to view the comments.</p>"))
        .otherwise(lit("")),
      when(b =!= 2, concat(lit("<p>"), col("text"), lit(".</p>")))
        .otherwise(lit("")),
      lit("<p>Read more</p>"),
      when(c === 0,
        lit("<p>Lorem ipsum dolor sit amet, consectetur adipiscing elit.</p>"))
        .otherwise(lit("")),
      when(d === 5, lit("<p>function f() { return 1; }</p>"))
        .otherwise(lit("")),
      lit("<p>A closing remark &lt;cite&gt; ends the page properly!</p>" +
        "</body></html>"))
  }

  /** Shared oracle preamble: doc + variant selectors. */
  private val uCte =
    """SELECT doc_id, text, CAST(doc_id AS VARCHAR) AS id,
      |         doc_id % 3 AS a, doc_id % 5 AS b,
      |         doc_id % 11 AS c, doc_id % 13 AS d
      |  FROM documents""".stripMargin

  /** Extraction: tag strip + entity decode + line assembly. The
    * oracle never parses HTML — it rebuilds the expected visible text
    * line by line from the planted components. */
  private val htmlExtract = QuerySpec(
    "q_html_extract",
    s"""WITH u AS (
       |  $uCte)
       |SELECT doc_id,
       |  'Doc ' || id || chr(10) ||
       |  'Home | About | Contact' || chr(10) ||
       |  'Doc ' || id || chr(10) ||
       |  'Article ' || id || ' begins & ends with a short sentence.' ||
       |  CASE WHEN a = 0 THEN chr(10) || 'Please enable JavaScript to view the comments.' ELSE '' END ||
       |  CASE WHEN b != 2 THEN chr(10) || text || '.' ELSE '' END ||
       |  chr(10) || 'Read more' ||
       |  CASE WHEN c = 0 THEN chr(10) || 'Lorem ipsum dolor sit amet, consectetur adipiscing elit.' ELSE '' END ||
       |  CASE WHEN d = 5 THEN chr(10) || 'function f() { return 1; }' ELSE '' END ||
       |  chr(10) || 'A closing remark <cite> ends the page properly!' AS html_text,
       |  CAST(6 + CASE WHEN a = 0 THEN 1 ELSE 0 END
       |         + CASE WHEN b != 2 THEN 1 ELSE 0 END
       |         + CASE WHEN c = 0 THEN 1 ELSE 0 END
       |         + CASE WHEN d = 5 THEN 1 ELSE 0 END AS BIGINT) AS n_lines
       |FROM u ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        HtmlText.extractText(plantedHtml).as("html_text"))
      .withColumn("n_lines",
        size(split(col("html_text"), "\n")).cast("long"))
      .orderBy("doc_id")
  }

  /** C4 line + page rules over the extracted text. Expected retained
    * lines, sentence counts and the page verdict all derive from the
    * plant: the Article line and the closing line always survive, the
    * doc-text line when planted, the lorem line survives the LINE
    * rules but kills the PAGE, the curly line is dropped by the line
    * rule yet still kills the page (rules read the extracted text),
    * and the JavaScript warning dies to the word filter. */
  private val c4LineFilter = QuerySpec(
    "q_c4_line_filter",
    s"""WITH u AS (
       |  $uCte)
       |SELECT doc_id,
       |  'Article ' || id || ' begins & ends with a short sentence.' ||
       |  CASE WHEN b != 2 THEN chr(10) || text || '.' ELSE '' END ||
       |  CASE WHEN c = 0 THEN chr(10) || 'Lorem ipsum dolor sit amet, consectetur adipiscing elit.' ELSE '' END ||
       |  chr(10) || 'A closing remark <cite> ends the page properly!' AS c4_text,
       |  CAST(2 + CASE WHEN b != 2 THEN 1 ELSE 0 END
       |         + CASE WHEN c = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_lines_kept,
       |  CAST(2 + CASE WHEN b != 2 THEN 1 ELSE 0 END
       |         + CASE WHEN c = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_sentences,
       |  CASE WHEN b != 2 AND c != 0 AND d != 5 THEN 1 ELSE 0 END AS c4_keep
       |FROM u ORDER BY doc_id""".stripMargin) { (s, d) =>
    val extracted = Tables.documents(s, d)
      .select(col("doc_id"),
        HtmlText.extractText(plantedHtml).as("_html_text"))
    HtmlText.c4Filter(extracted, "_html_text")
      .select("doc_id", "c4_text", "n_lines_kept", "n_sentences", "c4_keep")
      .orderBy("doc_id")
  }

  /** Linearized table extraction ([[HtmlText.tableRows]]): each doc
    * plants 0-2 tables (doc_id%3) whose row/cell counts and cell
    * contents are pure doc_id arithmetic — headers carry an entity
    * probe (`H&amp;c` must decode to `H&c`), a comment sits inside
    * the table element, and every structural number (table/row
    * indices, cell counts, the `" | "` linearization) replays in the
    * oracle from the same arithmetic, never by re-parsing HTML. Docs
    * with no table contribute no rows. */
  private val htmlTables = QuerySpec(
    "q_html_tables",
    """WITH u AS (SELECT doc_id, doc_id % 3 AS t_cnt FROM documents),
      |t AS (SELECT doc_id, unnest(range(0, t_cnt)) AS table_idx FROM u),
      |r AS (SELECT doc_id, table_idx,
      |        unnest(range(0, 2 + (doc_id + table_idx) % 3)) AS row_idx,
      |        2 + table_idx % 2 AS n_c
      |      FROM t)
      |SELECT doc_id, table_idx, row_idx,
      |       CAST(n_c AS BIGINT) AS n_cells,
      |       CASE WHEN row_idx = 0
      |            THEN array_to_string(list_transform(range(0, n_c),
      |                   c -> 'H&' || c), ' | ')
      |            ELSE array_to_string(list_transform(range(0, n_c),
      |                   c -> 'v ' || doc_id || '-' || row_idx || '-' || c),
      |                 ' | ')
      |       END AS row_text
      |FROM r ORDER BY doc_id, table_idx, row_idx""".stripMargin) { (s, d) =>
    val id = col("doc_id")
    def tableHtml(t: Column): Column = {
      val nRows = lit(2) + pmod(id + t, lit(3))
      val nCells = lit(2) + pmod(t, lit(2))
      val header = concat(lit("<tr>"),
        array_join(transform(sequence(lit(0), nCells - 1),
          c => concat(lit("<th>H&amp;"), c.cast("string"), lit("</th>"))), ""),
        lit("</tr>"))
      val dataRows = array_join(transform(sequence(lit(1), nRows - 1), r =>
        concat(lit("<tr class=\"d\">"),
          array_join(transform(sequence(lit(0), nCells - 1), c =>
            concat(lit("<td> v "), id.cast("string"), lit("-"),
              r.cast("string"), lit("-"), c.cast("string"), lit(" </td>"))), ""),
          lit("</tr>"))), "")
      concat(lit("<table class=\"x\"><!-- not a row: <tr> -->"),
        header, dataRows, lit("</table>"))
    }
    val html = concat(lit("<html><body><p>before</p>"),
      when(pmod(id, lit(3)) >= 1, tableHtml(lit(0))).otherwise(lit("")),
      when(pmod(id, lit(3)) === 2, tableHtml(lit(1))).otherwise(lit("")),
      lit("<p>after</p></body></html>"))
    HtmlText.tableRows(
        Tables.documents(s, d).select(col("doc_id"), html.as("_html")),
        "doc_id", col("_html"))
      .orderBy("doc_id", "table_idx", "row_idx")
  }

  def all: Seq[QuerySpec] = Seq(htmlExtract, c4LineFilter, htmlTables)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML→text extraction + C4 line-level boilerplate filtering — the
  * stage a real crawl pipeline runs BEFORE any host/text-level
  * curation (reference README.md:33 "optional object storage (raw
  * logs)" is the declared analogue; the rules themselves are public
  * knowledge from Raffel et al. 2020 (C4, §2.2) and its released
  * c4_utils implementation).
  *
  * Extraction (`extractText`): drop `<script>`/`<style>` blocks and
  * comments, convert block-level tags to line breaks, strip remaining
  * inline tags, decode the common named entities (`&amp;` LAST so
  * double-encoded text stays single-encoded, per HTML semantics —
  * tags are stripped BEFORE entity decode, so `&lt;tag&gt;` surfaces
  * as literal text, never as a tag), then per line: collapse
  * whitespace runs, trim, drop empties. Output is the visible text,
  * one extracted line per block element, joined with `\n`.
  *
  * C4 filtering (`c4Filter`), the published rules:
  *  - LINE rules: keep a line only if it ends in a terminal
  *    punctuation mark (`.` `!` `?` `"` — c4_utils' `_END_MARKS`),
  *    has ≥ `minWords` whitespace words (default 5), and does not
  *    contain the word "javascript" (case-insensitive).
  *  - PAGE rules, evaluated on the EXTRACTED page text (so a brace
  *    hidden in a dropped line still counts, but script/style blocks
  *    removed by extraction don't): drop pages containing
  *    "lorem ipsum" (case-insensitive), pages containing a curly
  *    brace, and pages whose RETAINED text has fewer than
  *    `minSentences` sentences (terminal `.`/`!`/`?` occurrences —
  *    c4_utils' `_MIN_NUM_SENTENCES` = 3).
  *
  * Scale shape: both stages are PURE PROJECTIONS — regexp builtins
  * plus array higher-order functions over the per-row line array (no
  * explode, no shuffle, no UDF); at 100 TB this runs entirely
  * map-side in the scan stage, exactly like [[PiiRedact]].
  */
object HtmlText {

  private val blockTags =
    "br|p|div|li|h[1-6]|tr|td|th|ul|ol|table|blockquote|section|article|" +
      "header|footer|nav|aside|title|pre|form|hr"

  /** Visible text of an HTML page, one line per block element, `\n`
    * joined; blank lines dropped, whitespace runs collapsed. Entity
    * decoding is the SINGLE-PASS native expression
    * ([[graft.plans.HtmlEntityDecodeExpr]]): one left-to-right scan
    * whose output is never re-scanned — `&amp;lt;` → literal `&lt;`,
    * browser semantics — covering the named cleaning set AND numeric
    * character references (`&#8212;`, `&#x2014;`), which a fixed
    * regexp_replace chain cannot express. `&nbsp;` decodes to U+00A0
    * and the per-line whitespace normalization here folds it with the
    * ASCII whitespace it sits among. */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val broke = regexp_replace(noComment,
      s"(?i)</?(?:$blockTags)\\b[^>]*>", "\n")
    val noTags = regexp_replace(broke, "<[^>]*>", "")
    val decoded = graft.plans.TextHashNative.htmlEntityDecode(noTags)
    val clean = filter(
      transform(split(decoded, "\n"),
        l => trim(regexp_replace(l, "[\\s\\u00A0]+", " "))),
      l => l =!= "")
    array_join(clean, "\n")
  }

  /** Linearized HTML tables — the structured-content complement of
    * [[extractText]] (tables carry a large share of the factual text
    * a training corpus wants, and flattening them through the line
    * extractor destroys the row/column structure): one output row per
    * `<tr>`, cells tag-stripped, entity-decoded, whitespace-normalized
    * and joined with `" | "` (the markdown-ish linearization public
    * curation stacks emit). Output columns: `table_idx`, `row_idx`
    * (both 0-based within the document), `n_cells`, `row_text`.
    * Non-nested tables only (the overwhelming web case; a nested
    * table's inner rows surface as their own rows of the OUTER match
    * region's row list — documented, not silent).
    *
    * Scale shape: regexp_extract_all + two posexplodes — map-side
    * generators in the scan stage, no shuffle, no UDF; entity decode
    * is the single-pass native expression. */
  def tableRows(df: DataFrame, idCol: String, html: Column): DataFrame = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val tables = expr_extract_all(noComment, "(?is)<table\\b[^>]*>(.*?)</table>")
    val withTable = df
      .select(col(idCol), posexplode(tables).as(Seq("table_idx", "_t")))
    val rows = expr_extract_all(col("_t"), "(?is)<tr\\b[^>]*>(.*?)</tr>")
    val withRow = withTable
      .select(col(idCol), col("table_idx"),
        posexplode(rows).as(Seq("row_idx", "_r")))
    val cells = expr_extract_all(col("_r"), "(?is)<t[dh]\\b[^>]*>(.*?)</t[dh]>")
    val cleanCells = transform(cells, c =>
      trim(regexp_replace(
        graft.plans.TextHashNative.htmlEntityDecode(
          regexp_replace(c, "<[^>]*>", " ")),
        "[\\s\\u00A0]+", " ")))
    withRow.select(col(idCol),
      col("table_idx").cast("long").as("table_idx"),
      col("row_idx").cast("long").as("row_idx"),
      size(cells).cast("long").as("n_cells"),
      array_join(cleanCells, " | ").as("row_text"))
  }

  /** `regexp_extract_all(col, pattern, 1)` (group 1 per match). */
  private def expr_extract_all(c: Column, pattern: String): Column =
    regexp_extract_all(c, lit(pattern), lit(1))

  /** The C4 line predicate (see class doc). */
  def keepLine(line: Column, minWords: Int): Column =
    line.rlike("[.!?\"]$") &&
      size(filter(split(line, " "), w => w =!= "")) >= minWords &&
      !lower(line).contains("javascript")

  /** Apply the C4 line + page rules to extracted text in `textCol`.
    * Adds `c4_text` (retained lines, `\n` joined), `n_lines_kept`,
    * `n_sentences` (terminal-punct count in the retained text) and
    * `c4_keep` (1 when every page rule passes). Keeps every input row
    * — callers filter on `c4_keep`; the per-line verdicts stay
    * inspectable for dropped pages too. */
  def c4Filter(df: DataFrame, textCol: String,
      minWords: Int = 5, minSentences: Int = 3): DataFrame = {
    val kept = filter(split(col(textCol), "\n"), l => keepLine(l, minWords))
    val retained = array_join(kept, "\n")
    val nSent = regexp_count(retained, lit("[.!?]"))
    val pageOk = !lower(col(textCol)).contains("lorem ipsum") &&
      !col(textCol).contains("{") && !col(textCol).contains("}") &&
      nSent >= minSentences
    df.withColumn("c4_text", retained)
      .withColumn("n_lines_kept", size(kept).cast("long"))
      .withColumn("n_sentences", nSent.cast("long"))
      .withColumn("c4_keep", when(pageOk, 1).otherwise(0))
  }
}

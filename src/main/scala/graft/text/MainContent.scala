package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D104 (r15): WITHIN-page main-content extraction — the jusText/
  * trafilatura stage every crawl pipeline runs between D68's markup
  * strip (which keeps nav text) and D27's cross-document boilerplate
  * removal (which only catches lines repeated ACROSS documents): a
  * single page's navigation, sidebar, and footer chrome has to go
  * even when it is unique to that page. The published heuristics
  * (jusText, Kohlschütter's boilerpipe) classify BLOCKS by link
  * density and text mass; this is their deterministic rule-based
  * core, kept RE2-portable (inline flags, non-greedy spans, NO
  * backreferences) so an external SQL engine re-derives every block
  * decision — the D68 oracle discipline extended to block arithmetic.
  *
  * The rules, in order:
  *  1. SEMANTIC ELEMENTS OUT: `<script> <style> <nav> <footer>
  *     <aside> <header>` subtrees are removed with their content —
  *     HTML5 landmark semantics are the strongest signal there is
  *     (each tag via its own non-greedy span; nested SAME-tag
  *     elements are beyond regex and documented out of scope — real
  *     pages virtually never nest nav-in-nav).
  *  2. BLOCK SPLIT: the remainder splits at block-level tag
  *     boundaries (`p div h1-6 li ul ol table tr td th br section
  *     article main blockquote`), the boilerpipe segmentation rule.
  *  3. PER-BLOCK SCORE: `text` = tag-stripped whitespace-collapsed
  *     block; `link_len` = the same normalization applied to the
  *     concatenation of the block's `<a>` contents. A block is
  *     CONTENT iff `len(text) >= minLen` AND
  *     `link_len * 100 <= maxLinkPct * len(text)` — integer
  *     arithmetic, no float compare at the boundary.
  *  4. The page's main content = content blocks joined by `\n`.
  *
  * Scale shape: one scan-local expression chain per row (split +
  * higher-order transform/filter/aggregate) — map-only at any scale,
  * no UDF, no shuffle.
  */
object MainContent {

  private val BlockTagRe =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|br|section|article|main|blockquote)\\b[^>]*>"

  private val ElementOut = Seq("script", "style", "nav", "footer", "aside", "header")

  /** Tag-strip + whitespace-collapse (the D68 normalization without
    * entity decoding — entities are content, not structure, and
    * decoding belongs to [[Boilerplate.stripMarkup]] downstream).
    */
  private def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "(?s)<[^>]*>", " "), "\\s+", " "))

  /** Total normalized length of the block's link texts. */
  private def linkLen(b: Column): Column =
    aggregate(
      regexp_extract_all(b, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)),
      lit(0), (acc, x) => acc + length(normText(x)))

  /** The filtered content-block array (each element the normalized
    * block text) — the shared core of both entry points.
    */
  private def keptBlocks(html: Column, minLen: Int, maxLinkPct: Int): Column = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    require(maxLinkPct >= 0 && maxLinkPct <= 100, s"maxLinkPct out of [0,100]: $maxLinkPct")
    val noChrome = ElementOut.foldLeft(html) { (c, t) =>
      regexp_replace(c, s"(?is)<$t\\b[^>]*>.*?</$t>", " ")
    }
    val scored = transform(split(noChrome, BlockTagRe), b =>
      struct(normText(b).as("t"), linkLen(b).as("l")))
    transform(
      filter(scored, st =>
        length(st.getField("t")) >= minLen &&
          st.getField("l") * 100 <= lit(maxLinkPct) * length(st.getField("t"))),
      st => st.getField("t"))
  }

  /** The main-content text of an HTML page column. */
  def mainContent(html: Column, minLen: Int = 25, maxLinkPct: Int = 33): Column =
    array_join(keptBlocks(html, minLen, maxLinkPct), "\n")

  /** Frame form: adds `content` (the extracted main text) and
    * `n_blocks_kept` next to `idCol`.
    */
  def extractMainContent(df: DataFrame, htmlCol: String, idCol: String,
                         minLen: Int = 25, maxLinkPct: Int = 33): DataFrame = {
    val kept = keptBlocks(col(htmlCol), minLen, maxLinkPct)
    df.select(col(idCol),
      size(kept).cast("long").as("n_blocks_kept"),
      array_join(kept, "\n").as("content"))
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document repeated-line ("boilerplate") removal — the
  * CommonCrawl-style cleanup step that strips navigation chrome,
  * cookie banners, and footers before training: a LINE that recurs
  * across many distinct documents is template, not content.
  * (ref: the reference has no corpus-level ops; this is part of the
  * LLM-pipeline extension set, SURVEY §2 D.)
  *
  * Scale shape: one explode (doc → lines), one distinct on
  * (line, doc) — hash-shuffle, well spread even for a line present in
  * every document — then a per-line count whose partial aggregation
  * collapses each map partition's contribution to one row per line
  * before the shuffle. The hot-line set is small BY CONSTRUCTION
  * (only lines repeated across ≥ minRepeatDocs documents survive), so
  * the strip join broadcasts it; the corpus never self-joins.
  */
object Boilerplate {

  private def lines(df: DataFrame, textCol: String, idCol: String,
                    delim: String): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim)))
      .as(Seq("pos", "line")))

  /** (line, doc_freq): number of DISTINCT documents containing each
    * line. Occurrences inside one document count once — a document
    * repeating its own line must not promote that line to corpus
    * boilerplate.
    */
  /** Markup stripping (the C4/CommonCrawl "text extraction" repair in
    * its rule-based form): script/style blocks removed WITH their
    * content, remaining tags removed, the common HTML entities
    * decoded (`&amp;` LAST, so `&amp;lt;` correctly yields `&lt;` and
    * not `<`), whitespace collapsed. Entirely scan-local
    * regexp_replace chains — map-only at any scale — and every
    * pattern is RE2-portable (inline `(?is)` flags, non-greedy
    * spans, NO backreferences), so an external SQL engine re-derives
    * the cleaning byte-for-byte. A real extraction pipeline would
    * parse HTML; this is the deterministic rule-based subset that
    * handles the overwhelmingly common crawl shapes.
    */
  def stripMarkup(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val ent = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&" // amp last — see scaladoc
    ).foldLeft(noTags) { case (col0, (e, r)) =>
      regexp_replace(col0, java.util.regex.Pattern.quote(e),
        java.util.regex.Matcher.quoteReplacement(r))
    }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  def stripMarkup(df: DataFrame, column: String): DataFrame =
    df.withColumn(column, stripMarkup(col(column)))

  def lineDocFreq(df: DataFrame, textCol: String, idCol: String,
                  delim: String = "\n"): DataFrame =
    lines(df, textCol, idCol, delim)
      .select(col("line"), col(idCol)).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("doc_freq"))

  /** Documents with boilerplate lines removed: every line whose
    * document frequency EXCEEDS `minRepeatDocs` is dropped from every
    * document; surviving lines are reassembled in original order.
    * Documents made entirely of boilerplate come back with empty
    * text (the caller decides whether empty docs survive — that is
    * [[graft.quality.Detector]] territory).
    */
  def stripBoilerplate(df: DataFrame, textCol: String, idCol: String,
                       minRepeatDocs: Long, delim: String = "\n"): DataFrame = {
    val ls = lines(df, textCol, idCol, delim)
    val hot = lineDocFreq(df, textCol, idCol, delim)
      .filter(col("doc_freq") > minRepeatDocs).select("line")
    val kept = ls.join(broadcast(hot), Seq("line"), "left_anti")
    reassemble(df, kept, textCol, idCol, delim)
  }

  // reassembly shared by both line-removal operators: per-doc ordered
  // fold of (pos, line) structs — sort_array orders by pos; the
  // transform lambda is interpreted, but it touches one short array
  // per DOCUMENT (not per token/pair), so it is not a hot path. Docs
  // whose every line was removed drop out of the aggregation; the
  // left join restores them with empty text so the output covers
  // every input doc.
  private def reassemble(df: DataFrame, kept: DataFrame, textCol: String,
                         idCol: String, delim: String): DataFrame = {
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")),
        delim).as(textCol))
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }

  /** C4-style KEEP-FIRST line deduplication (Raffel et al. 2020 §2.2:
    * "we discarded all but one of any three-sentence span occurring
    * more than once", here at line granularity): every duplicated
    * line keeps exactly ONE occurrence corpus-wide — the one with
    * the globally smallest (id, pos) — and loses the rest; documents
    * reassemble from their surviving lines. Complementary to
    * [[stripBoilerplate]], which removes ALL occurrences of
    * high-frequency lines: keep-first preserves the content once
    * (quotes, shared passages) instead of deleting it everywhere.
    *
    * Lines shorter than `minLineLen` characters are exempt from
    * dedup (kept everywhere): blank lines and one-word separators
    * are structure, not duplicated content.
    *
    * Scale shape: one explode, one per-line `min(struct(id, pos))`
    * aggregation (map-side combined — the keeper of each line
    * resolves without materializing occurrence lists), one line-keyed
    * join back, one per-doc reassembly — all shuffles keyed on
    * high-cardinality columns; no broadcast of corpus-sized state,
    * no pairwise joins. The keeper rule is a total order, so the
    * result is partitioning/engine-invariant.
    */
  def keepFirstLineOccurrence(df: DataFrame, textCol: String, idCol: String,
                              delim: String = "\n",
                              minLineLen: Int = 1): DataFrame = {
    val ls = lines(df, textCol, idCol, delim)
    val dedupable = ls.filter(length(col("line")) >= minLineLen)
    val keeper = dedupable
      .groupBy(col("line"))
      .agg(min(struct(col(idCol), col("pos"))).as("_keep"))
    val keptDedupable = dedupable.join(keeper, Seq("line"))
      .filter(col(idCol) === col("_keep").getField(idCol) &&
        col("pos") === col("_keep").getField("pos"))
      .select(col(idCol), col("pos"), col("line"))
    val kept = keptDedupable
      .unionByName(ls.filter(length(col("line")) < minLineLen))
    reassemble(df, kept, textCol, idCol, delim)
  }
}

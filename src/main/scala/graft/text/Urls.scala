package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization + per-domain statistics and capping (SURVEY
  * §2 D70) — the crawl-curation steps between raw URLs and dedup/mix
  * policy: re-crawled pages differ only in tracking params / fragment
  * / case / default port, so URL-keyed dedup without canonicalization
  * under-merges; and per-domain caps (a standard web-corpus policy —
  * no single domain dominates the mixture) need a registered-domain
  * key.
  *
  * Entirely scan-local regexp chains; every pattern is RE2-portable
  * (no backreferences, no lookaround) so the SQL oracle mirrors the
  * chain regexp-for-regexp (the D68 discipline). The tracking-param
  * removal is ONE global pass (`[?&]param=value` removed wherever it
  * sits) plus ONE anchored separator-promotion pass
  * (`^([^?&]*)&` → `$1?` — anchored, so it fires at most once even
  * under global replace) — no fixed-point iteration, and consecutive
  * tracking params are handled because the global pass consumes each
  * `[?&]` with its own param.
  */
object Urls {

  private val trackingParams = "(utm_[A-Za-z0-9_]*|gclid|fbclid)"
  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val hostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val restRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"

  /** Canonical form: lowercase scheme + host, default port stripped
    * (:80 for http, :443 for https), fragment dropped, tracking
    * params (`utm_*`, `gclid`, `fbclid`) removed, and — for
    * query-less URLs — trailing slashes trimmed. Path/query case and
    * order are preserved (reordering query params changes semantics
    * on some servers; that aggressiveness is a caller policy, not a
    * default). Non-URL strings (no `scheme://`) pass through
    * unchanged.
    */
  def canonicalUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, schemeRe, 1))
    val hostRaw = lower(regexp_extract(u, hostRe, 1))
    val host = when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .otherwise(hostRaw)
    val noFrag = regexp_replace(regexp_extract(u, restRe, 1), "#.*$", "")
    val dropped = regexp_replace(noFrag, "[?&]" + trackingParams + "=[^&]*", "")
    val promoted = regexp_replace(dropped, "^([^?&]*)&", "$1?")
    val rest = when(!promoted.contains("?"),
      regexp_replace(promoted, "/+$", "")).otherwise(promoted)
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), host, rest))
  }

  /** Registered domain, public-suffix-LITE: hostname minus port and a
    * leading `www.`, last two dot-labels. A deliberate approximation —
    * the real public-suffix list (co.uk, com.au, …) is an external-dim
    * input (the C12/C13 contract: feed a (suffix) table and extend the
    * extraction), not something to hard-code.
    */
  def registeredDomain(u: Column): Column = {
    val host = regexp_replace(
      regexp_replace(lower(regexp_extract(u, hostRe, 1)), ":[0-9]+$", ""),
      "^www\\.", "")
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
  }

  /** Registered domain against a REAL public-suffix table (r12
    * verdict #6 — the external-dim contract [[registeredDomain]]'s
    * LITE approximation points at; feed the published PSL as a
    * one-column `suffix` frame, e.g. "com", "co.uk", "kawasaki.jp").
    * Longest-suffix-match semantics: the registered domain is the
    * matched suffix plus the one label left of it; with NO matching
    * suffix the last label is treated as the public suffix (the
    * PSL's own `*` default rule — degrades to the LITE last-two-
    * labels answer). A host that IS a suffix outright, or an empty
    * host (non-URL input), yields null.
    *
    * Shape for 100 TB: the suffix table (~10k rules) broadcasts;
    * matching is `maxSuffixLabels` chained BROADCAST left joins —
    * one per candidate suffix length, each keyed on a scan-local
    * slice of the host labels — so the corpus never shuffles at all
    * (no explode + re-group round trip). Adds `registered_domain`.
    */
  def registeredDomainFromTable(df: DataFrame, urlCol: String,
                                suffixDim: DataFrame,
                                maxSuffixLabels: Int = 5): DataFrame = {
    require(maxSuffixLabels >= 1,
      s"maxSuffixLabels must be >= 1, got $maxSuffixLabels")
    val host = regexp_replace(
      regexp_replace(lower(regexp_extract(col(urlCol), hostRe, 1)), ":[0-9]+$", ""),
      "^www\\.", "")
    // dedupe ONCE (duplicate suffix rows would fan out corpus rows
    // through the left joins) and pin it — the per-k joins each
    // re-read this dim-sized frame
    val dim = graft.CacheScope.persist(
      suffixDim.select(lower(trim(col("suffix"))).as("suffix"))
        .filter(length(col("suffix")) > 0).distinct())
    val base = df.withColumn("_labels", split(host, "\\."))
      .withColumn("_n", size(col("_labels")))
    val joined = (1 to maxSuffixLabels).foldLeft(base) { (acc, k) =>
      acc.withColumn(s"_c$k",
          // >= : the WHOLE host is a candidate too, so a host that IS
          // a public suffix (e.g. "co.uk" itself) resolves sk = n and
          // falls into the null branch below, per PSL semantics
          when(col("_n") >= k, array_join(slice(col("_labels"), -k, k), ".")))
        .join(broadcast(dim.select(col("suffix").as(s"_c$k"),
          lit(k).as(s"_k$k"))), Seq(s"_c$k"), "left")
    }
    val sk = greatest(
      (1 to maxSuffixLabels).map(k => coalesce(col(s"_k$k"), lit(0))) :+ lit(1): _*)
    val keep = least(sk + 1, col("_n"))
    joined
      .withColumn("registered_domain",
        when(array_join(col("_labels"), ".") === "", lit(null).cast("string"))
          .when(col("_n") <= sk, lit(null).cast("string"))
          .otherwise(array_join(slice(col("_labels"), -keep, keep), ".")))
      .drop(((1 to maxSuffixLabels).flatMap(k => Seq(s"_c$k", s"_k$k")) ++
        Seq("_labels", "_n")): _*)
  }

  /** Per-registered-domain census over canonicalized URLs: pages,
    * distinct canonical URLs (re-crawl dup factor = pages/distinct).
    * One map-side-combined groupBy on the domain.
    */
  def domainStats(df: DataFrame, urlCol: String): DataFrame =
    df.select(registeredDomain(col(urlCol)).as("domain"),
        canonicalUrl(col(urlCol)).as("_canon"))
      .groupBy("domain")
      .agg(count(lit(1)).as("pages"),
        countDistinct(col("_canon")).as("distinct_urls"))
      .orderBy("domain")

  /** Per-domain cap: keep at most `cap` rows per registered domain,
    * best-first by `scoreCol` (desc) with `idCol` asc as the total-
    * order tiebreak. The standard no-domain-dominates mixture rule.
    * One rank window PARTITIONED BY DOMAIN — parallel, no global
    * sort; at 100 TB the window state is per-domain, bounded by the
    * largest single domain (salt a pathological mega-domain first if
    * one exists).
    */
  def capPerDomain(df: DataFrame, urlCol: String, scoreCol: String,
                   idCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"capPerDomain: cap must be positive, got $cap")
    val w = Window.partitionBy(col("_domain"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("_domain", registeredDomain(col(urlCol)))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= cap)
      .drop("_rk", "_domain")
  }
}

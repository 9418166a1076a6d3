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

  /** Parse the published public-suffix-list FILE format (r13 verdict
    * #7 — the loader [[registeredDomainFromTable]]'s external-dim
    * contract was missing) into a (suffix, kind) rules frame for
    * [[registeredDomainPsl]]. The PSL grammar, per its published
    * spec: each line is read only up to the first whitespace; lines
    * starting with `//` are comments; blank lines are ignored; a
    * leading `!` marks an exception rule; a leading `*.` marks a
    * wildcard rule (the `*` matches exactly one label). Rules are
    * lowercased. `kind` ∈ exact | wildcard | exception; for
    * wildcards `suffix` stores the TAIL (the labels right of the
    * `*`), for exceptions the rule minus the `!`.
    *
    * Exact rows alone (`kind = 'exact'`) are the
    * [[registeredDomainFromTable]] dim shape; the full frame drives
    * the faithful matcher. A bare `*` rule (the algorithm's implicit
    * default — never printed in the list itself) parses to an empty
    * tail and is dropped: the default rule is built into both
    * matchers already.
    *
    * REFRESH CONTRACT (r15): the PSL changes roughly monthly, so the
    * rules frame is an external dim with a lifecycle. The update
    * story: parse the new snapshot, diff against the one in
    * production via the D85 census —
    * `Merge.snapshotDiff(parsePublicSuffixList(old),
    * parsePublicSuffixList(new), keyCols = Seq("suffix"))` — which
    * yields rows_added / rows_removed / changed_kind counts (a rule
    * FLIPPING kind — e.g. `jp` → `*.jp` — surfaces as changed_kind,
    * the subtlest class of PSL churn), review the delta, then swap
    * the frame atomically (persist the new rules and repoint readers
    * — the [[graft.sources.SnapshotLog]] single-pointer commit is the
    * natural home). Spec-gated: a two-snapshot diff with an added, a
    * removed, and a kind-flipped rule reports exactly those counts.
    */
  def parsePublicSuffixList(lines: DataFrame, lineCol: String = "line"): DataFrame = {
    val r = lower(regexp_extract(trim(col(lineCol)), "^(\\S+)", 1))
    lines.select(r.as("_r"))
      .filter(col("_r") =!= "" && !col("_r").startsWith("//"))
      .select(
        when(col("_r").startsWith("!"), lit("exception"))
          .when(col("_r").startsWith("*."), lit("wildcard"))
          .otherwise(lit("exact")).as("kind"),
        regexp_replace(col("_r"), "^!|^\\*\\.", "").as("suffix"))
      .filter(length(col("suffix")) > 0 && col("suffix") =!= "*")
      .distinct()
  }

  /** Registered domain under FULL public-suffix-list semantics
    * (exact + wildcard + exception rules, the published algorithm):
    * the prevailing rule is the matching exception if any, else the
    * longest matching rule, else the default `*` (last label is
    * public); an exception rule's public suffix is the rule minus
    * its leftmost label; a wildcard `*` consumes exactly one host
    * label. Registered domain = public suffix + one label; a host
    * that IS a public suffix (or an empty/non-URL input) yields
    * null. Unlike [[registeredDomain]]'s LITE form, `www.` is NOT
    * pre-stripped — under real PSL rules `www` is an ordinary label
    * (and `!www.ck` needs to see it).
    *
    * `rules` is [[parsePublicSuffixList]]'s (suffix, kind) shape.
    * Shape for 100 TB: same as [[registeredDomainFromTable]] — the
    * rules table broadcasts and matching is chained BROADCAST left
    * joins (one per kind per candidate label count), so the corpus
    * never shuffles. Adds `registered_domain`.
    */
  def registeredDomainPsl(df: DataFrame, urlCol: String, rules: DataFrame,
                          maxSuffixLabels: Int = 5): DataFrame = {
    require(maxSuffixLabels >= 1,
      s"maxSuffixLabels must be >= 1, got $maxSuffixLabels")
    val host = regexp_replace(
      lower(regexp_extract(col(urlCol), hostRe, 1)), ":[0-9]+$", "")
    val dim = graft.CacheScope.persist(
      rules.select(lower(trim(col("suffix"))).as("suffix"),
          lower(trim(col("kind"))).as("kind"))
        .filter(length(col("suffix")) > 0).distinct()
        .withColumn("_sl", size(split(col("suffix"), "\\."))))
    val base = df.withColumn("_labels", split(host, "\\."))
      .withColumn("_n", size(col("_labels")))
    val withKeys = (1 to maxSuffixLabels).foldLeft(base) { (acc, k) =>
      acc.withColumn(s"_c$k",
        when(col("_n") >= k, array_join(slice(col("_labels"), -k, k), ".")))
    }
    def kindDim(kind: String, sl: Int, keyName: String, flagName: String,
                flag: Int) =
      broadcast(dim.filter(col("kind") === kind && col("_sl") === sl)
        .select(col("suffix").as(keyName), lit(flag).as(flagName)))
    // exact rule of k labels: match on the last-k key, suffix len k
    val joined0 = (1 to maxSuffixLabels).foldLeft(withKeys) { (acc, k) =>
      acc.join(kindDim("exact", k, s"_c$k", s"_e$k", k), Seq(s"_c$k"), "left")
    }
    // wildcard tail of k-1 labels: `*` consumes one more host label,
    // so the rule has k labels; match on the last-(k-1) key and
    // require the host to HAVE the extra label (_n >= k)
    val joined1 = (2 to maxSuffixLabels).foldLeft(joined0) { (acc, k) =>
      acc.join(kindDim("wildcard", k - 1, s"_c${k - 1}", s"_w$k", k),
        Seq(s"_c${k - 1}"), "left")
    }
    // exception rule of k labels: prevails outright; its public
    // suffix is the rule minus the leftmost label -> k-1
    val joined2 = (1 to maxSuffixLabels).foldLeft(joined1) { (acc, k) =>
      acc.join(kindDim("exception", k, s"_c$k", s"_x$k", k - 1),
        Seq(s"_c$k"), "left")
    }
    val excSk = greatest(
      (1 to maxSuffixLabels).map(k => coalesce(col(s"_x$k"), lit(-1))): _*)
    val plainSk = greatest(
      lit(1) +:
        (1 to maxSuffixLabels).map(k => coalesce(col(s"_e$k"), lit(0))) ++:
        (2 to maxSuffixLabels).map(k =>
          when(col("_n") >= k, coalesce(col(s"_w$k"), lit(0))).otherwise(lit(0))): _*)
    val sk = when(excSk >= 0, excSk).otherwise(plainSk)
    val keep = sk + 1
    joined2
      .withColumn("registered_domain",
        when(array_join(col("_labels"), ".") === "", lit(null).cast("string"))
          .when(col("_n") <= sk, lit(null).cast("string"))
          .otherwise(array_join(slice(col("_labels"), -keep, keep), ".")))
      .drop(((1 to maxSuffixLabels).flatMap(k =>
        Seq(s"_c$k", s"_e$k", s"_w$k", s"_x$k")) ++
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

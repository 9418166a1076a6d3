package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate-SPAN detection — the exact-substring-dedup family (Lee
  * et al., "Deduplicating Training Data Makes Language Models
  * Better", ACL 2022): repeated L-token spans across (and within)
  * documents are the contamination signal document-level near-dup
  * (D2-D4) misses — licensing boilerplate, quoted passages, and
  * templated fragments embedded in otherwise-distinct documents.
  *
  * Spark-first shape: the paper's suffix array is a single-node
  * device and does not distribute; the scalable equivalent is hashed
  * fixed-length span fingerprints. Span construction is MAP-ONLY
  * inside the scan stage (token array + index sequence + slices, the
  * same arithmetic as [[graft.pipeline.Pipeline.chunkDocs]]); the
  * only shuffles are ONE span-fingerprint groupBy (map-side combined)
  * and ONE fingerprint-keyed join back. Everything is corpus-linear —
  * Σ (tokens − L)/stride + 1 spans, never pairwise. `stride` trades
  * resolution for volume at 100 TB (stride 1 = every window, the
  * paper's semantics; stride L = disjoint windows, L× cheaper).
  */
object Spans {

  /** 60-bit portable span fingerprint: the first 15 md5 nibbles of
    * the space-joined window. Any engine (or offline auditor)
    * recomputes it from the same bytes — the same portability
    * contract as [[graft.pipeline.Pipeline.hashBucket]] — and 15
    * nibbles keep the value inside a signed long.
    */
  def spanFingerprint(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** One row per L-token window: (id, span_pos, span_hash), span_pos
    * the 0-based token offset, windows advancing by `stride`. Only
    * FULL windows are emitted — a document with fewer than `spanLen`
    * tokens contributes no spans (it cannot contain a duplicated
    * L-token passage). Map-only: no shuffle appears until a caller
    * aggregates.
    */
  def spanHashes(df: DataFrame, textCol: String, idCol: String,
                 spanLen: Int, stride: Int = 1,
                 portableHash: Boolean = true): DataFrame = {
    require(spanLen > 0, s"spanLen must be positive, got $spanLen")
    require(stride > 0, s"stride must be positive, got $stride")
    val base = df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(trim(col(textCol)), " +").as("_toks"))
      .withColumn("_n", size(col("_toks")))
      .filter(col("_n") >= spanLen)
    // last window index: floor((n − L)/stride) — integer-exact
    val lastSpan = floor((col("_n") - spanLen).cast("double") / stride).cast("long")
    base
      .select(col(idCol), col("_toks"),
        explode(sequence(lit(0L), lastSpan)).as("_k"))
      .select(col(idCol),
        (col("_k") * stride).as("span_pos"), {
          val joined = array_join(
            slice(col("_toks"), (col("_k") * stride + 1).cast("int"), lit(spanLen)),
            " ")
          // portableHash=false is the 100 TB knob: xxhash64 beats md5
          // ~20x per span and is deterministic within Spark; only the
          // cross-engine-auditable fingerprint identity is given up
          (if (portableHash) spanFingerprint(joined) else xxhash64(joined))
            .as("span_hash")
        })
  }

  /** Per-document duplicated-span statistics:
    * (id, span_count, dup_span_count, dup_frac). A span OCCURRENCE is
    * duplicated when its fingerprint occurs at least `minCount` times
    * corpus-wide — within-document repeats count toward the total
    * (self-repetition is part of the paper's finding), so a document
    * that repeats its own boilerplate twice is flagged even if no
    * other document shares it. `dup_frac` is the filter signal: docs
    * above a threshold are dominated by text that exists elsewhere.
    *
    * Plan: spans (map-only) → one fingerprint groupBy with map-side
    * combine → one fingerprint-keyed join back → one per-doc agg.
    * Both shuffles key on high-cardinality columns (fingerprint, id);
    * no broadcast of corpus-sized state, no pairwise blowup.
    */
  def duplicatedSpanStats(df: DataFrame, textCol: String, idCol: String,
                          spanLen: Int, stride: Int = 1,
                          minCount: Int = 2,
                          portableHash: Boolean = true): DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    // the span frame feeds BOTH the occurrence groupBy and the join
    // back — pinned so the tokenize+hash explode runs once (the
    // Dsir.importanceWeights pattern; measured at x10, best-of-3:
    // 4.03 s → 2.37 s md5, 3.52 s → 1.25 s xxhash64; at 100 TB the
    // pin trades one redundant full scan+hash pass for
    // MEMORY_AND_DISK span storage ≈ tokens × ~24 B — spill-backed,
    // never OOM-fatal)
    val spans = graft.CacheScope.persist(
      spanHashes(df, textCol, idCol, spanLen, stride, portableHash))
    val occ = spans.groupBy(col("span_hash")).agg(count(lit(1)).as("_occ"))
    spans.join(occ, Seq("span_hash"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("span_count"),
        count(when(col("_occ") >= minCount, 1)).as("dup_span_count"))
      // scale-0 round of ratio*1e4: every tie sits on an exactly-
      // representable z.5 (integers ±.5 are exact doubles), which
      // both engines round away from zero — round(ratio, 4) instead
      // parks ties on unrepresentable 4-decimal doubles where Spark's
      // shortest-string rounding and DuckDB's binary rounding can
      // split (the same mechanism documented at Dsir.log_ratio)
      .withColumn("dup_frac",
        round(col("dup_span_count") * 10000.0 / col("span_count")) / 10000.0)
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
    * 2003 — the MOSS algorithm): from the k-gram span hashes, select
    * the MINIMUM hash in every window of `window` consecutive spans.
    * The winnowing guarantee: any shared token run of length
    * ≥ window + k − 1 contributes at least one shared fingerprint,
    * while only ~2/(window+1) of the span hashes are stored —
    * overlap detection at a fraction of D47's span volume, robust to
    * edits outside the shared run. Documents with at least one span
    * but fewer than `window` of them emit the min of what they have
    * (every fingerprint-able doc gets ≥ 1 fingerprint).
    *
    * Output (id, fingerprint), distinct per doc. Plan: map-only span
    * construction, then ONE window pass partitioned BY DOCUMENT
    * (parallel across docs — never a global sort) and a distinct.
    */
  def winnowFingerprints(df: DataFrame, textCol: String, idCol: String,
                         k: Int, window: Int = 4,
                         portableHash: Boolean = true): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val spans = spanHashes(df, textCol, idCol, k, stride = 1,
      portableHash = portableHash)
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    val fwd = byDoc.orderBy(col("span_pos")).rowsBetween(0, window - 1)
    spans
      .withColumn("_mn", min(col("span_hash")).over(fwd))
      .withColumn("_nspans", count(lit(1)).over(byDoc))
      // windows that would extend past the last span are suffixes of
      // the final full window and can only re-select; keep them ONLY
      // when the doc has no full window at all (short-doc fallback)
      .filter(col("span_pos") <= greatest(col("_nspans") - window, lit(0)))
      .select(col(idCol), col("_mn").as("fingerprint"))
      .distinct()
  }

  /** Candidate overlap pairs via shared winnowing fingerprints:
    * (id_a, id_b, shared_fps) for document pairs sharing at least
    * `minShared` fingerprints — the plagiarism/quotation-detection
    * join at winnowed (not full-span) volume. Pair generation is the
    * inverted-index shape: one self-join WITHIN fingerprint buckets,
    * bounded by Σ df² over fingerprints; `dfCap` drops fingerprints
    * shared by more than `dfCap` documents (template fragments —
    * the same absolute-cap semantics as the Jaccard family: caps
    * affect candidate RECALL, never a reported count, and a pair of
    * near-identical docs still meets on its sub-cap fingerprints).
    */
  def winnowOverlapPairs(df: DataFrame, textCol: String, idCol: String,
                         k: Int, window: Int = 4, minShared: Int = 2,
                         dfCap: Int = 1000,
                         portableHash: Boolean = true): DataFrame = {
    require(minShared > 0, s"minShared must be positive, got $minShared")
    require(dfCap > 1, s"dfCap must be > 1, got $dfCap")
    val fps = winnowFingerprints(df, textCol, idCol, k, window, portableHash)
    val rare = fps.groupBy(col("fingerprint")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= dfCap)
      .select("fingerprint")
    val pruned = fps.join(rare, Seq("fingerprint"))
    val a = pruned.select(col("fingerprint"), col(idCol).as("id_a"))
    val b = pruned.select(col("fingerprint"), col(idCol).as("id_b"))
    a.join(b, Seq("fingerprint"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** The DISTINCT store fingerprint set — materialize (or persist)
    * once and reuse across ingest batches or a stream: this frame IS
    * the span store.
    */
  def storeFingerprints(store: DataFrame, textCol: String, idCol: String,
                        spanLen: Int, stride: Int = 1,
                        portableHash: Boolean = true): DataFrame =
    spanHashes(store, textCol, idCol, spanLen, stride, portableHash)
      .select(col("span_hash")).distinct()

  /** Stale span occurrences of an ingest batch against the store
    * fingerprint set — and the STREAMING ingest guard: `batch` may be
    * a `readStream` source, because span construction is map-only and
    * the membership check is a stateless STREAM-STATIC inner join —
    * append-mode, no watermark, no state store (the D39 ingest-guard
    * shape at span granularity; per-doc ratios aggregate downstream
    * per micro-batch where needed). Output (id, span_pos, span_hash)
    * for every span already present in the store.
    */
  def staleSpans(batch: DataFrame, storeFps: DataFrame,
                 textCol: String, idCol: String,
                 spanLen: Int, stride: Int = 1,
                 portableHash: Boolean = true): DataFrame =
    spanHashes(batch, textCol, idCol, spanLen, stride, portableHash)
      .join(storeFps, Seq("span_hash"))
      .select(col(idCol), col("span_pos"), col("span_hash"))

  /** Incremental span dedup — the batch-vs-store flavor of
    * [[duplicatedSpanStats]] (the D19/D34 ingest pattern at span
    * granularity): for each document of an incoming BATCH, the share
    * of its L-token spans already present in the accumulated STORE
    * corpus. Output (id, span_count, stale_span_count, stale_frac) —
    * a freshness/contamination signal per ingested doc; filter on
    * `stale_frac` to drop re-posts and quote-heavy mirrors before
    * they enter the corpus.
    *
    * Plan: batch spans (map-only) LEFT SEMI-shaped join against the
    * DISTINCT store fingerprint set, keyed on the fingerprint — the
    * store never joins pairwise with itself or the batch; both sides
    * shuffle on the high-cardinality hash (or the store side
    * broadcasts when small). Store fingerprints can be materialized
    * once and reused across batches — they ARE the store.
    */
  def novelSpanStats(batch: DataFrame, store: DataFrame,
                     textCol: String, idCol: String,
                     spanLen: Int, stride: Int = 1,
                     portableHash: Boolean = true): DataFrame = {
    val batchSpans = spanHashes(batch, textCol, idCol, spanLen, stride, portableHash)
    val fps = storeFingerprints(store, textCol, idCol, spanLen, stride, portableHash)
      .withColumn("_in_store", lit(1))
    batchSpans.join(fps, Seq("span_hash"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("span_count"),
        count(col("_in_store")).as("stale_span_count"))
      // tie-safe 4-dp derivation — see dup_frac above
      .withColumn("stale_frac",
        round(col("stale_span_count") * 10000.0 / col("span_count")) / 10000.0)
  }

  /** The flagged occurrences themselves — (id, span_pos, span_hash,
    * occurrences) for every span whose fingerprint repeats at least
    * `minCount` times — the inspection/removal worklist behind
    * [[duplicatedSpanStats]]'s counters. The duplicated-fingerprint
    * frame is typically tiny relative to the corpus (AQE broadcasts
    * it when it is), so the join back is cheap.
    */
  def duplicateSpans(df: DataFrame, textCol: String, idCol: String,
                     spanLen: Int, stride: Int = 1,
                     minCount: Int = 2,
                     portableHash: Boolean = true): DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    // pinned for the same double-consumption as duplicatedSpanStats
    val spans = graft.CacheScope.persist(
      spanHashes(df, textCol, idCol, spanLen, stride, portableHash))
    val dup = spans.groupBy(col("span_hash")).agg(count(lit(1)).as("occurrences"))
      .filter(col("occurrences") >= minCount)
    spans.join(dup, Seq("span_hash"))
      .select(col(idCol), col("span_pos"), col("span_hash"), col("occurrences"))
  }

  /** The REPAIR half of exact-substring dedup (Lee et al. 2022 §4.2
    * remove ALL BUT ONE occurrence of every duplicated passage —
    * [[duplicatedSpanStats]] detects, this rewrites): every span
    * occurrence whose fingerprint repeats ≥ `minCount` times
    * corpus-wide is removed UNLESS it is the canonical keeper (the
    * globally smallest (id, span_pos) — the keep-first rule of
    * [[graft.text.Boilerplate.keepFirstLineOccurrence]] at span
    * granularity). A token is dropped when ANY removed occurrence
    * covers it, so overlapping windows of one long duplicated run
    * merge into a single removed region — exactly the paper's
    * substring-removal semantics for runs ≥ spanLen.
    *
    * Output: (id, text, n_tokens, removed_tokens) for EVERY input
    * document — text rebuilt space-joined from surviving tokens
    * (whitespace runs normalize to one space, the repo-wide
    * normalized-token form), docs shorter than `spanLen` tokens pass
    * through in that normalized form with removed_tokens = 0.
    *
    * Plan (corpus-linear, no pairwise joins): map-only span
    * construction (persisted — feeds the occurrence aggregate and the
    * removal join) → ONE fingerprint groupBy (count + min keeper
    * struct, map-side combined) → join back bounded by the DUPLICATED
    * volume → an L-row coverage explode per removed occurrence
    * (bounded by duplicated volume × spanLen) → distinct coverage
    * anti-joined against the map-only token explode → per-doc ordered
    * reassembly. Shuffles key on span_hash and id only.
    */
  def removeDuplicateSpans(df: DataFrame, textCol: String, idCol: String,
                           spanLen: Int, minCount: Int = 2,
                           portableHash: Boolean = true): DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val spans = graft.CacheScope.persist(
      spanHashes(df, textCol, idCol, spanLen, stride = 1, portableHash))
    val keepers = spans.groupBy(col("span_hash"))
      .agg(count(lit(1)).as("_occ"),
        min(struct(col(idCol), col("span_pos"))).as("_keep"))
      .filter(col("_occ") >= minCount)
    val removedCover = spans.join(keepers, Seq("span_hash"))
      .filter(!(col(idCol) === col("_keep").getField(idCol) &&
        col("span_pos") === col("_keep").getField("span_pos")))
      .select(col(idCol),
        explode(sequence(col("span_pos"), col("span_pos") + (spanLen - 1)))
          .as("_tp"))
      .distinct()
    val toks = df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), posexplode(split(trim(col(textCol)), " +")))
      .withColumnRenamed("pos", "_tp").withColumnRenamed("col", "_tok")
    val kept = toks.join(removedCover, Seq(idCol, "_tp"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("_tp"), col("_tok")))),
          x => x.getField("_tok")), " ").as(textCol),
        count(lit(1)).as("_kept_n"))
    val counts = toks.groupBy(col(idCol)).agg(count(lit(1)).as("n_tokens"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .join(counts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col(textCol), lit("")).as(textCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("n_tokens"), lit(0L)) - coalesce(col("_kept_n"), lit(0L)))
          .as("removed_tokens"))
  }
}

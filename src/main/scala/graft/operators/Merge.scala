package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC merge / latest-wins compaction — the Delta/Hudi/Iceberg
  * "merge-on-read compaction" shape as a plain relational operator:
  * a pile of keyed change records (upserts + deletes, each carrying a
  * version) collapses to the current snapshot, or merges into an
  * existing snapshot.
  *
  * The reference (dataqtor) has no CDC notion — this is a scale
  * extension: any 100 TB ingestion pipeline re-crawls sources, and
  * "keep the newest version of every key, honor deletes" is the first
  * operation between raw ingest and every downstream operator.
  *
  * Spark-first shape: ONE map-side-combined `max(struct(...))`
  * aggregate per key. Struct-typed max plans as a SortAggregate pair
  * (struct buffers can't hash-aggregate), but the property that
  * matters at 100 TB survives: PARTIAL aggregation collapses each map
  * partition to one candidate row per key BEFORE the exchange, so the
  * shuffle carries ≤ |keys| rows per partition — versus a
  * `row_number() OVER (PARTITION BY key ORDER BY version DESC)` plan
  * (the textbook formulation, and what the DuckDB oracle runs), which
  * must shuffle EVERY change record to its key's reducer before any
  * row can be discarded. PlanAuditSpec pins the shape (one key
  * shuffle, partial_max, no Window).
  *
  * Determinism: the winner is the max of `struct(versionCols ++ every
  * remaining non-key column)` — a total order over rows whenever the
  * version tuple is unique per key (a unique change-sequence column
  * makes it so), and still deterministic (field-by-field comparison
  * over the full row) when it is not. Struct comparison treats null as
  * smallest, matching `ORDER BY f DESC NULLS LAST`.
  */
object Merge {

  /** Collapse a change log to the current snapshot: one row per key —
    * the row with the greatest (versionCols, payload) tuple — with
    * rows whose winning op equals `deleteOp` dropped (a delete that is
    * itself superseded by a later upsert does NOT delete).
    *
    * Output columns: keyCols ++ versionCols ++ payload (the input
    * column order), including `opCol` so callers can audit; drop it
    * downstream if unwanted.
    */
  def compactLatest(changes: DataFrame, keyCols: Seq[String],
                    versionCols: Seq[String],
                    opCol: Option[String] = None,
                    deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty, "compactLatest: keyCols must be non-empty")
    require(versionCols.nonEmpty, "compactLatest: versionCols must be non-empty")
    val others = changes.columns.filterNot(keyCols.contains).toSeq
    require(versionCols.forall(others.contains),
      s"compactLatest: versionCols $versionCols must be non-key columns of the frame")
    opCol.foreach(o => require(others.contains(o),
      s"compactLatest: opCol $o must be a non-key column of the frame"))
    // version first, then every remaining column in frame order — a
    // deterministic total order even with duplicate version tuples
    val ordered = versionCols ++ others.filterNot(versionCols.contains)
    val winner = changes
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("_w"))
    val out = winner.select(
      keyCols.map(col) ++ ordered.map(c => col(s"_w.$c").as(c)): _*)
    opCol.fold(out)(o => out.filter(col(o) =!= lit(deleteOp)))
  }

  /** Merge a change batch into an existing snapshot: the store's rows
    * participate as the OLDEST version of their key (any batch change
    * for the key supersedes them; ties on the version tuple go to the
    * batch via a priority field ordered AFTER the version columns),
    * then [[compactLatest]] semantics apply. Store rows need no op
    * column — they are treated as upserts; the batch's `opCol` drives
    * deletes. Output column set = the batch's (store must be a
    * same-schema snapshot, minus the op column if the store lacks it).
    *
    * Tombstones are NOT retained: a winning delete removes the key
    * from the snapshot entirely, so an OUT-OF-ORDER lower-versioned
    * upsert arriving in a LATER batch would resurrect it. Incremental
    * per-batch merging equals one-shot [[compactLatest]] over the full
    * log exactly when batches arrive version-ordered per key (the
    * normal CDC delivery contract — spec'd in R11OpsSpec); feeds that
    * violate it should retain delete rows as explicit tombstone
    * records instead of an opCol.
    */
  def mergeLatest(store: DataFrame, batch: DataFrame, keyCols: Seq[String],
                  versionCols: Seq[String],
                  opCol: Option[String] = None,
                  deleteOp: String = "D"): DataFrame = {
    val storeOp = opCol match {
      case Some(o) if !store.columns.contains(o) => store.withColumn(o, lit("U"))
      case _ => store
    }
    val all = storeOp.withColumn("_src_pri", lit(0))
      .unionByName(batch.withColumn("_src_pri", lit(1)))
    compactLatest(all, keyCols, versionCols :+ "_src_pri", opCol, deleteOp)
      .drop("_src_pri")
  }

  /** Snapshot diff census (SURVEY §2 D85) — "what changed between
    * yesterday's table and today's", answered WITHOUT materializing a
    * row-level diff: one keyed full-outer join, ONE aggregation, and
    * a fixed-size (4 + |columns|)-row report:
    * rows_added / rows_removed / rows_changed / rows_unchanged plus a
    * `changed_<col>` drill-down count per non-key column (which
    * columns drive the churn — the question that decides whether a
    * 100 TB re-ingest is a schema-wide rewrite or one volatile
    * column). Comparisons are null-safe (`<=>`); both sides' non-key
    * columns ride in ONE struct each, so row-changed is a single
    * struct comparison and the join shuffles each side exactly once
    * on the key. `keyCols` must be unique per side (the CDC key
    * contract — pre-compact with [[compactLatest]] otherwise).
    */
  def snapshotDiff(before: DataFrame, after: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff: need >= 1 key column")
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"snapshotDiff: schemas differ: ${before.columns.mkString(",")} vs " +
        s"${after.columns.mkString(",")} — conform first (Sources.conformSchema)")
    val valCols = before.columns.filterNot(keyCols.contains).toSeq
    def pack(df: DataFrame, out: String) =
      df.select(keyCols.map(col) :+ struct(valCols.map(col): _*).as(out): _*)
    val j = pack(before, "_b").join(pack(after, "_a"), keyCols, "full_outer")
    val both = col("_b").isNotNull && col("_a").isNotNull
    // coalesce: sum() over a zero-row join (both snapshots empty) is
    // NULL, and the census must say 0, not null (r12 review)
    def cnt(c: org.apache.spark.sql.Column) =
      coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
    val aggs =
      cnt(col("_b").isNull && col("_a").isNotNull).as("rows_added") +:
      cnt(col("_b").isNotNull && col("_a").isNull).as("rows_removed") +:
      cnt(both && !(col("_b") <=> col("_a"))).as("rows_changed") +:
      cnt(both && (col("_b") <=> col("_a"))).as("rows_unchanged") +:
      valCols.map(c => cnt(both &&
        !(col("_b").getField(c) <=> col("_a").getField(c))).as(s"changed_$c"))
    val row = j.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row to a (metric, value) frame
    val metrics = Seq("rows_added", "rows_removed", "rows_changed",
      "rows_unchanged") ++ valCols.map(c => s"changed_$c")
    row.select(explode(array(metrics.map(m =>
        struct(lit(m).as("metric"), col(m).as("value"))): _*)).as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
  }
}

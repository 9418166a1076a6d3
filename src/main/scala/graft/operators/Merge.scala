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
}

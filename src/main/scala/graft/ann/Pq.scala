package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization — the storage/serving path for billion-scale
  * vector search: a d-dim float vector (256 B at d=64) compresses to
  * `m` small centroid codes (m bytes), and approximate distances are
  * evaluated from an m×k lookup table without touching the original
  * floats. At 100 TB of embeddings this is the difference between
  * scanning vectors and scanning codes.
  *
  * Scale shape: codebooks are TRAINED once and ride as driver-side
  * constants; encoding is a map-only scan (one codegen'd
  * [[graft.functions.NearestCentroidL2]] call per subspace — no
  * shuffle, no join); ADC scoring is a map-only scan over codes plus
  * one TakeOrdered for top-k.
  *
  * Determinism: per-subspace assignment scores are
  * `dot(c,c) − 2·dot(v,c)` with left-to-right double accumulation,
  * and ADC sums its m lookup terms in subspace order — every number
  * here is reproducible bit-for-bit by an external SQL engine
  * (`list_dot_product` + ordered addition), which is what the q_d36
  * oracle does.
  */
object Pq {

  /** Per-subspace codebooks from the first `k` vectors by id
    * (deterministic seeding, same convention as
    * [[Ann.trainCentroidsBySample]]): codebooks(j)(c) is the j-th
    * subvector of sample vector c. Swap in per-subspace Lloyd
    * refinement ([[Ann.trainCentroidsKMeans]] over sliced columns)
    * when codebook quality matters more than oracle-reproducibility.
    */
  def codebooksBySample(emb: DataFrame, vecCol: String, idCol: String,
                        m: Int, k: Int, dim: Int): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    val sample = emb.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    Array.tabulate(m)(j => sample.map(_.slice(j * sub, j * sub + sub)))
  }

  /** Per-subspace Lloyd-refined codebooks (r15, r14 verdict #5):
    * seeded from [[codebooksBySample]], then `iters` rounds of L2
    * assignment + mean update PER SUBSPACE — the textbook PQ training
    * (Jégou et al. §III: k-means independently in each subspace,
    * squared-L2, the SAME metric [[encode]] assigns with). All m
    * subspaces refine in ONE job per iteration: each row explodes to
    * its m (subspace, code, subvector) entries — same total bytes as
    * the vector scan — and one grouped aggregate yields every
    * (subspace, code) mean. Empty clusters keep their previous
    * centroid (the standard dead-centroid rule). Trained codebooks
    * buy ADC fidelity; the GATES keep sampled codebooks because the
    * oracle must re-derive training arithmetic, and a k-means
    * fixpoint chain in SQL is not worth the gate complexity —
    * recall with trained banks is MEASURED instead
    * (`tools/PqRecall`, SCALE_SWEEP).
    */
  def codebooksKMeans(emb: DataFrame, vecCol: String, idCol: String,
                      m: Int, k: Int, dim: Int, iters: Int = 3)
      : Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val sub = dim / m
    var cbs = codebooksBySample(emb, vecCol, idCol, m, k, dim)
    if (cbs.isEmpty || cbs(0).isEmpty) return cbs
    val vecs = graft.CacheScope.persist(
      emb.select(col(vecCol)).filter(col(vecCol).isNotNull))
    val meanAggs = (0 until sub).map(d =>
      avg(element_at(col("sv"), d + 1).cast("double")).as(s"_m$d"))
    for (_ <- 0 until iters) {
      val entries = array((0 until m).map { j =>
        struct(lit(j).as("j"),
          graft.functions.NearestCentroidL2(col(vecCol), cbs(j), j * sub, sub)
            .as("code"),
          slice(col(vecCol), j * sub + 1, sub).as("sv"))
      }: _*)
      val means = vecs.select(explode(entries).as("e"))
        .select(col("e.j").as("j"), col("e.code").as("code"), col("e.sv").as("sv"))
        .groupBy("j", "code")
        .agg(meanAggs.head, meanAggs.tail: _*)
        .collect() // m*k rows — bank-sized, never corpus-sized
        .map(r => (r.getInt(0), r.getInt(1)) ->
          (0 until sub).map(d => r.getDouble(d + 2)).toArray)
        .toMap
      cbs = Array.tabulate(m)(j => Array.tabulate(cbs(j).length)(c =>
        means.getOrElse((j, c), cbs(j)(c))))
    }
    cbs
  }

  /** id + `code_0..code_{m-1}` int columns (the PQ code words). One
    * scan-local projection; at rest the codes are what a serving
    * store persists instead of the vectors.
    */
  def encode(emb: DataFrame, vecCol: String, idCol: String,
             codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val codes = (0 until m).map { j =>
      graft.functions.NearestCentroidL2(col(vecCol), codebooks(j), j * sub, sub)
        .as(s"code_$j")
    }
    emb.select(col(idCol) +: codes: _*)
  }

  private def dotA(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) { s += a(i) * b(i); i += 1 }
    s
  }

  /** The un-truncated ADC score column over an [[encode]]d frame:
    * the query is quantized against each codebook into an m×k lookup
    * table of exact `dot(q_j,q_j) − 2·dot(q_j,c) + dot(c,c)` scores
    * (squared L2 of the query subvector to the centroid); each
    * encoded row costs m table lookups summed in subspace order
    * (left-fold — engine-reproducible, unlike a commutative sum).
    */
  private def adcColumn(codebooks: Array[Array[Array[Double]]],
                        query: Array[Double]): Column = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val luts: Array[Array[Double]] = Array.tabulate(m) { j =>
      val qj = query.slice(j * sub, j * sub + sub)
      val dq = dotA(qj, qj)
      codebooks(j).map(c => dq - 2 * dotA(qj, c) + dotA(c, c))
    }
    val terms = (0 until m).map { j =>
      element_at(array(luts(j).map(lit(_)).toIndexedSeq: _*), col(s"code_$j") + 1)
    }
    terms.reduceLeft(_ + _)
  }

  /** Asymmetric-distance top-k over the whole encoded frame. Returns
    * (id, adc) rounded to 4 decimals, ordered (adc asc, id asc).
    */
  def adcTopK(encoded: DataFrame, idCol: String,
              codebooks: Array[Array[Array[Double]]],
              query: Array[Double], k: Int): DataFrame =
    encoded.select(col(idCol), round(adcColumn(codebooks, query), 4).as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k)

  /** D99: the IVF-PQ index — ONE row per vector: a coarse IVF cell id
    * (min-L2 assignment over the shared `coarse` bank, earlier index
    * on ties) plus the m PQ code words. This is the at-rest serving
    * layout of every billion-scale ANN system (FAISS `IVFx,PQy` with
    * `by_residual=false` — codes quantize the RAW vector, not the
    * cell residual, so the SAME codebooks serve every cell and an
    * external engine can re-derive each code from public arithmetic).
    *
    * Scale shape: building the index is a single map-only scan (two
    * codegen'd bank expressions per row, no shuffle). PERSIST IT
    * PARTITIONED BY CELL (`.write.partitionBy("cell")`) — a probe
    * then reads only `nprobe` of the `nlist` directories via
    * partition pruning, i.e. the scan is nprobe/nlist of the corpus
    * BEFORE any filter runs (spec-audited: the pruned read's plan
    * carries the cell PartitionFilters).
    */
  def ivfPqIndex(emb: DataFrame, vecCol: String, idCol: String,
                 coarse: Array[Array[Double]],
                 codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val dim = codebooks.length * codebooks(0)(0).length
    val cell = graft.functions.NearestCentroidL2(col(vecCol), coarse, 0, dim)
      .as("cell")
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val codes = (0 until m).map { j =>
      graft.functions.NearestCentroidL2(col(vecCol), codebooks(j), j * sub, sub)
        .as(s"code_$j")
    }
    emb.select(col(idCol) +: cell +: codes: _*)
  }

  /** The query's `nprobe` nearest coarse cells by the same min-L2
    * score the index uses (`dot(c,c) − 2·dot(q,c)`; ties → earlier
    * index). Driver-side: the bank is nlist×dim, never corpus-sized.
    */
  def probeCells(coarse: Array[Array[Double]], query: Array[Double],
                 nprobe: Int): Array[Int] =
    coarse.zipWithIndex
      .map { case (c, i) => (dotA(c, c) - 2 * dotA(query, c), i) }
      .sortBy(identity) // (score asc, index asc) — ties earlier-wins
      .take(math.min(nprobe, coarse.length))
      .map(_._2)

  /** D99: IVF-PQ serving — the composed two-stage ANN read path over
    * an [[ivfPqIndex]] frame:
    *
    *  1. PROBE: keep only rows in the query's `nprobe` nearest coarse
    *     cells ([[probeCells]] — partition-pruned when the index is
    *     stored partitioned by cell, a cheap `isin` filter otherwise);
    *  2. ADC: rank the surviving codes by asymmetric distance and
    *     keep the best `rerank` candidates (TakeOrdered — the shuffle
    *     carries `rerank` rows, never the cell contents);
    *  3. RERANK: join the candidate ids back to the float vectors
    *     (broadcast — the candidate set is rerank-bounded by
    *     construction) and order by EXACT squared L2
    *     `dot(q,q) − 2·dot(q,v) + dot(v,v)`.
    *
    * Returns (id, adc, l2) rounded to 4 decimals, ordered
    * (l2 asc, id asc), limit k. Recall contract: a true neighbor
    * assigned outside the probed cells is missed (the IVF trade-off,
    * same as [[Ann.ivfTopK]]); within the probed cells the result is
    * exact for any `rerank ≥ k` whenever ADC ranks the true top-k
    * into the candidate set — with nprobe = nlist AND rerank = |corpus|
    * the output EQUALS the exact scan (spec-gated).
    *
    * Why this is THE 100 TB shape: the float vectors are touched for
    * only `rerank` rows per query; everything corpus-sized reads
    * 1-byte-ish codes from nprobe/nlist of the files.
    */
  def ivfPqTopK(emb: DataFrame, vecCol: String, idCol: String,
                coarse: Array[Array[Double]],
                codebooks: Array[Array[Array[Double]]],
                query: Array[Double], k: Int, nprobe: Int,
                rerank: Int): DataFrame = {
    require(k >= 1 && rerank >= k, s"need rerank ($rerank) >= k ($k) >= 1")
    val index = ivfPqIndex(emb, vecCol, idCol, coarse, codebooks)
    ivfPqTopKIndexed(index, emb, vecCol, idCol, coarse, codebooks, query,
      k, nprobe, rerank)
  }

  /** [[ivfPqTopK]] over a PREBUILT (possibly parquet-materialized,
    * cell-partitioned) index frame — the production entry point: the
    * corpus is encoded once, every query pays only the pruned code
    * scan + a rerank-bounded float lookup.
    */
  def ivfPqTopKIndexed(index: DataFrame, emb: DataFrame, vecCol: String,
                       idCol: String, coarse: Array[Array[Double]],
                       codebooks: Array[Array[Array[Double]]],
                       query: Array[Double], k: Int, nprobe: Int,
                       rerank: Int): DataFrame = {
    require(k >= 1 && rerank >= k, s"need rerank ($rerank) >= k ($k) >= 1")
    val cells = probeCells(coarse, query, nprobe)
    val cands = index
      .filter(col("cell").isin(cells.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col(idCol), round(adcColumn(codebooks, query), 4).as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(rerank)
    val qq = dotA(query, query)
    val qlit = array(query.map(lit(_)).toIndexedSeq: _*)
    val l2 = lit(qq) - lit(2.0) * Ann.dot(col(vecCol), qlit) +
      Ann.dot(col(vecCol), col(vecCol))
    emb.join(broadcast(cands), idCol)
      .select(col(idCol), col("adc"), round(l2, 4).as("l2"))
      .orderBy(col("l2").asc, col(idCol).asc)
      .limit(k)
  }

  // ---------------------------------------------------------------
  // D99b (r15): index MAINTENANCE — the C33 story for vectors. The
  // at-rest IVF-PQ index is append-only: encoding is a deterministic
  // map-only function of (vector, banks), so a day's increment is
  // encoded with the SAME banks and appended — cell-partitioned, no
  // store re-scan, no shuffle — and the merged index is row-for-row
  // EQUAL to a full rebuild (spec- and gate-claimed). The failure
  // mode worth guarding is the silent one: merging indexes encoded
  // with DIFFERENT banks, which no row-level schema check can see —
  // so stamped indexes carry a bank fingerprint column and the merge
  // verifies it in-plan (the mergeNearIndexes discipline).
  // ---------------------------------------------------------------

  /** Deterministic fingerprint of the (coarse, codebooks) bank pair —
    * a positional fold over the raw double bits, so any changed
    * centroid value, order, or shape changes the stamp.
    */
  def bankFingerprint(coarse: Array[Array[Double]],
                      codebooks: Array[Array[Array[Double]]]): Long = {
    var h = 1125899906842597L
    def mix(v: Long): Unit = { h = h * 31L + v }
    mix(coarse.length)
    coarse.foreach { c => mix(c.length); c.foreach(d => mix(java.lang.Double.doubleToLongBits(d))) }
    mix(codebooks.length)
    codebooks.foreach { cb =>
      mix(cb.length)
      cb.foreach { c => mix(c.length); c.foreach(d => mix(java.lang.Double.doubleToLongBits(d))) }
    }
    h
  }

  /** [[ivfPqIndex]] plus the bank fingerprint column (`bank_fp`) —
    * the at-rest layout maintenance operates on. The constant column
    * dictionary-encodes to ~nothing in parquet; serving reads select
    * explicit columns, so the stamp never rides into a query plan.
    */
  def ivfPqIndexStamped(emb: DataFrame, vecCol: String, idCol: String,
                        coarse: Array[Array[Double]],
                        codebooks: Array[Array[Array[Double]]]): DataFrame =
    ivfPqIndex(emb, vecCol, idCol, coarse, codebooks)
      .withColumn("bank_fp", lit(bankFingerprint(coarse, codebooks)))

  /** Merge a stamped store index with a stamped increment index:
    * a pure union (encode is deterministic, ids are globally unique
    * and append-only — the C33 contract), guarded IN-PLAN against the
    * silent killer: indexes encoded with different banks raise loudly
    * instead of serving subtly-wrong shortlists. Cost: zero shuffle —
    * the union is a plan-level concatenation; persisted with
    * `.write.mode("append").partitionBy("cell")` the merge is a
    * partitioned file append.
    */
  def mergeIvfPqIndexes(store: DataFrame, inc: DataFrame): DataFrame = {
    require(store.columns.contains("bank_fp") && inc.columns.contains("bank_fp"),
      "[graft] mergeIvfPqIndexes: both sides must be STAMPED indexes " +
        "(ivfPqIndexStamped) — the bank fingerprint is the merge guard")
    val u = store.unionByName(inc)
    val fp = u.agg(min(col("bank_fp")).as("_fpMin"), max(col("bank_fp")).as("_fpMax"))
    u.crossJoin(broadcast(fp))
      .filter(when(col("_fpMin") === col("_fpMax"), lit(true))
        .otherwise(raise_error(concat(
          lit("mergeIvfPqIndexes: incompatible bank fingerprints: "),
          col("_fpMin").cast("string"), lit(" vs "), col("_fpMax").cast("string")))))
      .drop("_fpMin", "_fpMax")
  }

  /** D99d (r16): the in-plan SERVING guard — the read-side half of
    * the bank_fp discipline. A server holds (coarse, codebooks) in
    * memory and reads the at-rest index; after a re-train swap, an
    * old server's banks no longer match the table, and ADC scores
    * computed with mismatched banks are subtly wrong in a way no
    * schema check can see. This filter raises IN-PLAN when any index
    * row's `bank_fp` differs from the fingerprint of the banks in
    * hand — one broadcast one-row frame, same shape as the
    * [[mergeIvfPqIndexes]] guard — so a mixed-bank serving window is
    * impossible: the stale server fails loudly instead of serving
    * quietly-degraded shortlists.
    */
  def requireBankFp(index: DataFrame, coarse: Array[Array[Double]],
                    codebooks: Array[Array[Array[Double]]]): DataFrame = {
    require(index.columns.contains("bank_fp"),
      "[graft] requireBankFp: index is not STAMPED (ivfPqIndexStamped)")
    val expect = bankFingerprint(coarse, codebooks)
    val fp = index.agg(min(col("bank_fp")).as("_fpMin"),
      max(col("bank_fp")).as("_fpMax"))
    index.crossJoin(broadcast(fp))
      .filter(when(col("_fpMin") === lit(expect) &&
          col("_fpMax") === lit(expect), lit(true))
        .otherwise(raise_error(concat(
          lit(s"requireBankFp: server banks (fp $expect) do not match the "),
          lit("index (fp "), col("_fpMin").cast("string"),
          lit(".."), col("_fpMax").cast("string"),
          lit(") — re-resolve the index version or reload banks")))))
      .drop("_fpMin", "_fpMax")
  }

  /** D99d (r16): EXECUTE the re-train D99c's drift report signals —
    * nothing executed it before (the r15 verdict's engine-gap #7):
    * train fresh banks on the CURRENT corpus (sampled seeding, or
    * Lloyd-refined with `iters > 0` — the SCALE_SWEEP-measured
    * recall buy on drifted data), re-encode map-only (one scan, two
    * codegen'd bank expressions per row, no shuffle), and SWAP
    * ATOMICALLY by committing the stamped index as the next version
    * of its snapshot-log table: readers resolve old-or-new, never a
    * half-re-encoded mix, and pinned old readers keep their files
    * (the C30c isolation contract). The bank fingerprint rides both
    * in every row (`bank_fp`) and in the version meta, so
    * [[requireBankFp]] closes the stale-server window. Returns
    * (coarse, codebooks, committed version).
    */
  def retrainIvfPqIndex(emb: DataFrame, vecCol: String, idCol: String,
                        indexDir: String, nlist: Int, m: Int, kCodes: Int,
                        dim: Int, iters: Int = 0)
      : (Array[Array[Double]], Array[Array[Array[Double]]], Long) = {
    val coarse =
      if (iters > 0) Ann.trainCentroidsKMeans(emb, vecCol, idCol, nlist, iters)
      else Ann.trainCentroidsBySample(emb, vecCol, idCol, nlist)
    val cbs =
      if (iters > 0) codebooksKMeans(emb, vecCol, idCol, m, kCodes, dim, iters)
      else codebooksBySample(emb, vecCol, idCol, m, kCodes, dim)
    val idx = ivfPqIndexStamped(emb, vecCol, idCol, coarse, cbs)
    val v = graft.sources.SnapshotLog.write(idx, indexDir,
      meta = Map("bank_fp" -> bankFingerprint(coarse, cbs).toString))
    (coarse, cbs, v)
  }

  /** Per-cell occupancy + residual mass of a corpus under a coarse
    * bank: (cell, n, resid_sum_micro) where the residual is the exact
    * squared L2 from each vector to its ASSIGNED centroid,
    * micro-quantized per row then summed exactly (long addition —
    * partitioning-independent, SQL-re-derivable). One map-only scan +
    * one nlist-sized aggregate.
    */
  def cellStats(emb: DataFrame, vecCol: String,
                coarse: Array[Array[Double]]): DataFrame = {
    val dim = coarse(0).length
    val cell = graft.functions.NearestCentroidL2(col(vecCol), coarse, 0, dim)
    val v = col(vecCol)
    val dvv = Ann.dot(v, v)
    val scores = array(coarse.map { c =>
      lit(dotA(c, c)) - lit(2.0) * Ann.dot(v, array(c.map(lit(_)).toIndexedSeq: _*)) + dvv
    }.toIndexedSeq: _*)
    emb.select(cell.as("cell"),
        round(element_at(scores, cell + 1) * 1e6).cast("long").as("_r"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), sum(col("_r")).as("resid_sum_micro"))
  }

  /** D99c: the coarse-bank DRIFT report — per-cell occupancy and
    * residual-mass shift between bank-training time (`before`, a
    * persisted [[cellStats]] snapshot) and now (`after`). Growing
    * cells and rising mean residuals are THE signal the coarse bank
    * no longer matches the data distribution and needs re-training —
    * without it an append-only index silently degrades (probes scan
    * ever-fatter cells, ADC shortlists lose recall). Full outer on
    * cell: a cell appearing only in `after` is new mass the bank
    * never saw; only in `before`, drained mass.
    */
  def cellDriftReport(before: DataFrame, after: DataFrame): DataFrame = {
    val b = before.select(col("cell").cast("long").as("cell"),
      col("n").as("_nb"), col("resid_sum_micro").as("_rb"))
    val a = after.select(col("cell").cast("long").as("cell"),
      col("n").as("_na"), col("resid_sum_micro").as("_ra"))
    b.join(a, Seq("cell"), "full_outer")
      .select(col("cell"),
        coalesce(col("_nb"), lit(0L)).as("n_before"),
        coalesce(col("_na"), lit(0L)).as("n_after"),
        coalesce(col("_rb"), lit(0L)).as("resid_sum_micro_before"),
        coalesce(col("_ra"), lit(0L)).as("resid_sum_micro_after"))
  }

  /** D101: BATCH IVF-PQ serving — every query in a (bounded) query
    * frame through the cell-pruned ADC + exact-re-rank read path at
    * once: the production retrieval pattern (score the whole eval
    * set / the day's query log in one job), the [[Ann.batchTopK]]
    * generalization of [[ivfPqTopKIndexed]].
    *
    * Everything per-query is computed RELATIONALLY on the query
    * frame — nothing collected:
    *
    *  1. PROBE (map-only on queries): the nprobe nearest coarse
    *     cells via `array_sort` over (score, cid) structs — the same
    *     `dot(c,c) − 2·dot(q,c)` score and earlier-index tie rule as
    *     [[probeCells]]; the per-query m×k ADC lookup table as array
    *     columns (`dot(q_j,q_j) − 2·dot(q_j,c) + dot(c,c)` per
    *     codebook entry, exact [[adcColumn]] arithmetic).
    *  2. ADC: queries EXPLODE to their probe cells and BROADCAST
    *     against the index (the corpus-sized side never shuffles;
    *     with a cell-partitioned index the probed cells also prune
    *     at the scan when the probe set is statically known); each
    *     (code row, query) pair costs m LUT lookups. Shortlists via
    *     [[graft.functions.TopKPairsAgg]] — k-bounded map-side
    *     combining, NO Window: the shuffle carries at most
    *     partitions × queries × rerank pairs, never the scored frame.
    *  3. RERANK: the queries×rerank shortlist joins back to the
    *     float vectors (broadcast) and re-ranks by exact micro-long
    *     squared L2, again through the k-bounded aggregate.
    *
    * Scores are micro-quantized longs under total orders
    * (adc_micro asc, id asc) then (l2_micro asc, id asc) —
    * partitioning/merge-order independent, exact on any engine.
    * Returns (query_id, rank, id, adc_micro, l2_micro), rank 1..k
    * per query.
    */
  def ivfPqBatchTopK(index: DataFrame, emb: DataFrame, vecCol: String,
                     idCol: String, coarse: Array[Array[Double]],
                     codebooks: Array[Array[Array[Double]]],
                     queries: DataFrame, qIdCol: String, qVecCol: String,
                     k: Int, nprobe: Int, rerank: Int): DataFrame = {
    require(k >= 1 && rerank >= k, s"need rerank ($rerank) >= k ($k) >= 1")
    require(nprobe >= 1, s"need nprobe >= 1, got $nprobe")
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val qv = col(qVecCol)
    // probe cells: sort (score, cid) structs — struct ordering is
    // field-lexicographic, so ties fall to the EARLIER cid, matching
    // probeCells/NearestCentroidL2
    val cellScores = array(coarse.zipWithIndex.map { case (c, i) =>
      struct((lit(dotA(c, c)) - lit(2.0) *
        Ann.dot(qv, array(c.map(lit(_)).toIndexedSeq: _*))).as("s"),
        lit(i).as("cid"))
    }.toIndexedSeq: _*)
    val probed = transform(
      slice(array_sort(cellScores), 1, math.min(nprobe, coarse.length)),
      e => e.getField("cid"))
    // per-query ADC LUT: m array columns of k exact per-centroid terms
    val lutCols = (0 until m).map { j =>
      val qj = slice(qv, j * sub + 1, sub)
      val dqj = Ann.dot(qj, qj)
      array(codebooks(j).zipWithIndex.map { case (c, _) =>
        dqj - lit(2.0) * Ann.dot(qj, array(c.map(lit(_)).toIndexedSeq: _*)) +
          lit(dotA(c, c))
      }.toIndexedSeq: _*).as(s"_lut$j")
    }
    val qFrame = queries.select(
      (col(qIdCol).cast("long").as("query_id") +:
        explode(probed).as("cell") +:
        lutCols): _*)
    // index ⨝ broadcast(exploded queries) on the cell: the corpus
    // side stays map-only
    val adc = (0 until m).map(j =>
      element_at(col(s"_lut$j"), col(s"code_$j") + 1)).reduceLeft(_ + _)
    val shortlist = index.join(broadcast(qFrame), Seq("cell"))
      .select(col("query_id"), col(idCol),
        round(adc * 1e6).cast("long").as("_adc_micro"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKPairsAgg(-col("_adc_micro"),
        col(idCol).cast("long"), rerank).as("_top"))
      .select(col("query_id"), explode(col("_top")).as("_c"))
      .select(col("query_id"), col("_c.id").as(idCol),
        (-col("_c.score_micro")).as("adc_micro"))
    // exact re-rank of the queries×rerank shortlist
    val qVecs = queries.select(col(qIdCol).cast("long").as("query_id"),
      qv.as("_qv"))
    val scored = emb.join(broadcast(shortlist), idCol)
      .join(broadcast(qVecs), Seq("query_id"))
      .select(col("query_id"), col(idCol), col("adc_micro"),
        round((Ann.dot(col("_qv"), col("_qv")) -
          lit(2.0) * Ann.dot(col(vecCol), col("_qv")) +
          Ann.dot(col(vecCol), col(vecCol))) * 1e6).cast("long")
          .as("_l2_micro"))
    val ranked = scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKPairsAgg(-col("_l2_micro"),
        col(idCol).cast("long"), k).as("_top"))
      .select(col("query_id"), posexplode(col("_top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol),
        (-col("col.score_micro")).as("l2_micro"))
    // re-attach the candidate's ADC score (the aggregate carries only
    // (score, id) pairs; the shortlist is queries×rerank — broadcast)
    ranked.join(broadcast(shortlist), Seq("query_id", idCol))
      .select(col("query_id"), col("rank"), col(idCol),
        col("adc_micro"), col("l2_micro"))
  }
}

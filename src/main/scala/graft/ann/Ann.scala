package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the query vector is a literal (broadcast with the
  * plan — no join); cosine is a strict left-fold over zipped arrays
  * (deterministic summation order, double precision); top-k is
  * `orderBy().limit(k)`, which Spark executes as per-partition
  * TakeOrderedAndProject — no global sort, no full shuffle. LSH and
  * IVF variants shrink the candidate set before exact scoring.
  */
object Ann {

  /** Deterministic dot product: left-to-right loop in doubles, as a
    * native codegen'd expression (graft.functions.DotProduct) — the
    * equivalent `aggregate(zip_with(...))` runs interpreted per row.
    */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Zero-norm guard: cosine against a zero vector is undefined —
    * emit null (dropped by any >= threshold filter) instead of the
    * ANSI divide-by-zero runtime error a 100 TB corpus with a few
    * zero embeddings would otherwise throw.
    */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d)
  }

  private def litVec(q: Array[Double]): Column =
    array(q.map(lit(_)).toIndexedSeq: _*)

  /** Brute-force cosine top-k against a literal query vector —
    * the exact baseline (one scan + TakeOrdered).
    */
  def cosineTopK(emb: DataFrame, vecCol: String, idCol: String,
                 query: Array[Double], k: Int, scale: Int = 4): DataFrame =
    emb.select(col(idCol),
        round(cosine(col(vecCol), litVec(query)), scale).as("cosine_sim"))
      .orderBy(desc("cosine_sim"), asc(idCol))
      .limit(k)

  /** Sign-bit key of random-hyperplane LSH: `planes` fixed
    * pseudo-random hyperplanes (deterministic from the seed), each
    * contributing one bit. Vectors in the same bucket are likely
    * angular neighbors.
    */
  def hyperplaneKey(vec: Column, dim: Int, planes: Int, seed: Long): Column =
    element_at(graft.functions.HyperplaneKeys(vec,
      graft.functions.HyperplaneKeys.planeBank(dim, planes, 1, seed)), 1)

  /** LSH-bucketed ANN top-k: score only the vectors falling in the
    * query's bucket (and optionally neighboring buckets via fewer
    * planes). Recall < 1 by construction; candidates shrink ~2^planes.
    */
  def lshTopK(emb: DataFrame, vecCol: String, idCol: String,
              query: Array[Double], k: Int, planes: Int = 6,
              seed: Long = 42L): DataFrame = {
    val dim = query.length
    val qKey = { // query key computed with the same plane family
      val rnd = new scala.util.Random(seed)
      (0 until planes).map { p =>
        val plane = Array.fill(dim)(rnd.nextGaussian())
        val d = query.zip(plane).map { case (x, y) => x * y }.sum
        if (d >= 0) 1L << p else 0L
      }.reduce(_ | _)
    }
    emb.withColumn("_bucket", hyperplaneKey(col(vecCol), dim, planes, seed))
      .filter(col("_bucket") === qKey)
      .select(col(idCol),
        round(cosine(col(vecCol), litVec(query)), 4).as("cosine_sim"))
      .orderBy(desc("cosine_sim"), asc(idCol))
      .limit(k)
  }

  /** Multi-probe LSH top-k: additionally probe the buckets reached by
    * flipping the `probes` sign bits whose hyperplanes the query lies
    * CLOSEST to (smallest |margin| — the flips most likely to hide
    * true neighbors). Candidates grow ~(1+probes)/2^planes of the
    * corpus; recall dominates single-bucket [[lshTopK]] under the
    * same plane family. Margins are computed once at the driver from
    * the query vector; executors still evaluate one hyperplane key
    * per row.
    */
  def lshTopKMultiProbe(emb: DataFrame, vecCol: String, idCol: String,
                        query: Array[Double], k: Int, planes: Int = 6,
                        seed: Long = 42L, probes: Int = 4): DataFrame = {
    val dim = query.length
    val rnd = new scala.util.Random(seed)
    val margins = (0 until planes).map { p =>
      val plane = Array.fill(dim)(rnd.nextGaussian())
      p -> query.zip(plane).map { case (x, y) => x * y }.sum
    }
    val qKey = margins.map { case (p, d) => if (d >= 0) 1L << p else 0L }.reduce(_ | _)
    val probeKeys = qKey +: margins.sortBy { case (_, d) => math.abs(d) }
      .take(math.min(probes, planes)).map { case (p, _) => qKey ^ (1L << p) }
    emb.withColumn("_bucket", hyperplaneKey(col(vecCol), dim, planes, seed))
      .filter(col("_bucket").isin(probeKeys: _*))
      .select(col(idCol),
        round(cosine(col(vecCol), litVec(query)), 4).as("cosine_sim"))
      .orderBy(desc("cosine_sim"), asc(idCol))
      .limit(k)
  }

  /** Index of the max-cosine centroid for a vector column. The
    * centroid matrix rides along as ONE codegen reference object
    * (native expression) instead of k x dim inlined literals: the
    * literal formulation was a ~4000-node tree that cost Janino
    * seconds PER PLAN — and k-means builds a fresh plan per Lloyd
    * iteration (the r2 q_d8 bench regression). Also null-safe and
    * k=1-safe where `greatest(struct...)` was not.
    */
  private def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.NearestCentroid(vec, centroids)

  /** Deterministic centroid seeding: the first `k` ids. Stand-in for
    * a proper clustering pass on small corpora; feed it to
    * [[trainCentroidsKMeans]] to refine.
    */
  def trainCentroidsBySample(emb: DataFrame, vecCol: String, idCol: String,
                             nCentroids: Int): Array[Array[Double]] =
    emb.orderBy(col(idCol)).limit(nCentroids)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** Distributed Lloyd iterations: assign every vector to its nearest
    * centroid (scan-local literal comparison), recompute centroids as
    * per-dimension means computed with `dim` codegen'd
    * `avg(element_at(...))` aggregates in ONE groupBy pass — the
    * shuffle per iteration is k×(dim+1) partial averages, not an
    * exploded (cid, dim, value) row per vector element; only the
    * k×dim centroid matrix ever reaches the driver. A centroid that
    * loses all members keeps its previous position.
    */
  def trainCentroidsKMeans(emb: DataFrame, vecCol: String, idCol: String,
                           nCentroids: Int, iters: Int = 2): Array[Array[Double]] = {
    // training re-scans the corpus once per iteration — pin the (id,
    // vec) projection for the duration of training instead of
    // re-reading the source each pass
    val vecs = graft.CacheScope.persist(
      emb.select(col(idCol), col(vecCol)).filter(col(vecCol).isNotNull))
    var cents = trainCentroidsBySample(vecs, vecCol, idCol, nCentroids)
    if (cents.isEmpty) return cents
    val dim = cents(0).length
    val aggs = (0 until dim).map(d =>
      avg(element_at(col(vecCol), d + 1).cast("double")).as(s"_m$d"))
    for (_ <- 0 until iters) {
      val means = vecs
        .groupBy(nearestCentroid(col(vecCol), cents).as("_cid"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .filter(!_.isNullAt(0)) // null vectors are filtered above; belt+braces
        .map(r => r.getInt(0) -> (0 until dim).map(d => r.getDouble(d + 1)).toArray)
        .toMap
      cents = cents.indices.map(i => means.getOrElse(i, cents(i))).toArray
    }
    cents
  }

  /** Cluster assignment against a FIXED centroid bank (the k-means
    * inference path: embed → assign → route/balance/analyze). One
    * scan-local projection — the whole centroid matrix rides in the
    * single codegen'd [[graft.functions.NearestCentroid]] object, so
    * a 100 TB assignment pass is a map-only job with no shuffle and
    * no per-row plan cost. Assignment = max cosine, later index wins
    * ties (documented on the expression).
    */
  def assignClusters(emb: DataFrame, vecCol: String, idCol: String,
                     centroids: Array[Array[Double]]): DataFrame =
    emb.select(col(idCol),
      nearestCentroid(col(vecCol), centroids).as("cluster_id"))

  def ivfTopK(emb: DataFrame, vecCol: String, idCol: String,
              centroids: Array[Array[Double]], query: Array[Double],
              k: Int, nprobe: Int = 2): DataFrame = {
    def nearest(vec: Column): Column = nearestCentroid(vec, centroids)
    val qTop = centroids.zipWithIndex.map { case (c, i) =>
      val d = {
        val dq = query.zip(c).map { case (x, y) => x * y }.sum
        val nq = math.sqrt(query.map(x => x * x).sum)
        val nc = math.sqrt(c.map(x => x * x).sum)
        dq / (nq * nc)
      }
      (d, i)
    }.sortBy(-_._1).take(nprobe).map(_._2).toSet
    emb.withColumn("_cid", nearest(col(vecCol)))
      .filter(col("_cid").isin(qTop.toSeq: _*))
      .select(col(idCol),
        round(cosine(col(vecCol), litVec(query)), 4).as("cosine_sim"))
      .orderBy(desc("cosine_sim"), asc(idCol))
      .limit(k)
  }

  /** Exact cosine pairs between the full corpus and a small,
    * broadcast subset of it — the safety net to union with
    * [[cosinePairs]] for id ranges where recall MUST be 1 (e.g.
    * re-ingested duplicates): LSH banding has probabilistic recall
    * in general, while this pass is |corpus| x |subset| exact work,
    * linear in the corpus when the subset is a bounded dimension.
    */
  def cosinePairsExact(corpus: DataFrame, subset: DataFrame, vecCol: String,
                       idCol: String, threshold: Double): DataFrame = {
    // norms are per-vector, so compute them once per side BEFORE the
    // pair join — cosine() inside the join would redo both
    // self-dot-products for every one of the |corpus| x |subset| pairs
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("v_a"),
      norm(col(vecCol)).as("n_a"))
    val b = broadcast(subset.select(col(idCol).as("id_b"), col(vecCol).as("v_b"),
      norm(col(vecCol)).as("n_b")))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(when(col("n_a") * col("n_b") > 0,
          dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))), 4).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs via MULTI-TABLE banded
    * hyperplane LSH: `tables` independent plane families of `planes`
    * bits each; candidates are the union over families of same-bucket
    * pairs, verified with exact cosine ≥ threshold.
    *
    * Scale shape: candidate volume is ~tables * n² / 2^planes — with
    * the 12-bit default that is n²/1024, versus the r2 default's
    * n²/16 single shallow table (the VERDICT r2 scale-killer). Deeper
    * keys prune harder; the extra families buy back recall for
    * near-but-not-identical pairs (a cos ≥ 0.99 pair in 64-dim agrees
    * with a random hyperplane w.p. ~0.955, so one 12-bit table keeps
    * ~0.57 of such pairs and 4 independent tables ~0.97 — while
    * identical vectors collide in EVERY table: recall exactly 1 for
    * true re-ingested duplicates regardless of depth). Callers
    * needing guaranteed recall on a known id range union
    * [[cosinePairsExact]] over that range, as q_d5 does.
    */
  def cosinePairs(emb: DataFrame, vecCol: String, idCol: String,
                  threshold: Double, planes: Int = 12, tables: Int = 4,
                  seed: Long = 42L, dim: Int = 64): DataFrame = {
    val bank = graft.functions.HyperplaneKeys.planeBank(dim, planes, tables, seed)
    val keyed = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("_n", norm(col("v"))) // once per vector, not per pair
      .select(col("id"), col("v"), col("_n"),
        posexplode(graft.functions.HyperplaneKeys(col("v"), bank))
          .as(Seq("_t", "_bucket")))
    val a = keyed.select(col("_t"), col("_bucket"),
      col("id").as("id_a"), col("v").as("v_a"), col("_n").as("n_a"))
    val b = keyed.select(col("_t"), col("_bucket"),
      col("id").as("id_b"), col("v").as("v_b"), col("_n").as("n_b"))
    a.join(b, Seq("_t", "_bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(when(col("n_a") * col("n_b") > 0,
          dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))), 4).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
      .distinct()
  }

  /** SemDeDup-style semantic near-duplicate pairs: assign every
    * embedding to its max-cosine centroid (one scan-local pass — the
    * bank rides in the codegen'd `NearestCentroid` object), then
    * verify exact cosine ≥ threshold WITHIN each cluster only. The
    * cluster id is the bucketing that keeps pair volume ~Σ|cluster|²
    * instead of n²; at corpus scale the centroid bank is sized so
    * clusters stay bounded (SemDeDup uses tens of thousands), making
    * the per-cluster verify linear-ish. Norms are computed once per
    * vector BEFORE the join. Deterministic: assignment, pairing, and
    * scores are pure functions of the input — no RNG.
    *
    * Pairs are exhaustive within a cluster but near-dup pairs
    * SPLIT by the cluster boundary are missed — the documented
    * SemDeDup trade-off; raise `nprobe`-style recall by unioning
    * [[cosinePairsExact]] over id ranges that must not be missed.
    */
  def semanticPairs(emb: DataFrame, vecCol: String, idCol: String,
                    centroids: Array[Array[Double]],
                    threshold: Double): DataFrame = {
    val assigned = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("_cid", graft.functions.NearestCentroid(col("v"), centroids))
      .withColumn("_n", norm(col("v")))
    // explicit partitioning on the cluster key: input-tiny,
    // output-heavy self-join (see simhashPairs) — AQE would coalesce
    // the tiny input into one task and serialize pair generation
    val parts = emb.sparkSession.sessionState.conf.numShufflePartitions
    val byCluster = assigned.repartition(parts, col("_cid"))
    val a = byCluster.select(col("_cid"), col("id").as("id_a"),
      col("v").as("v_a"), col("_n").as("n_a"))
    val b = byCluster.select(col("_cid"), col("id").as("id_b"),
      col("v").as("v_b"), col("_n").as("n_b"))
    a.join(b, Seq("_cid"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(when(col("n_a") * col("n_b") > 0,
          dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))), 4).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }

  /** Keep one embedding per semantic near-duplicate component (the
    * smallest id): [[semanticPairs]] → transitive closure → anti-join
    * the losers.
    */
  def semanticDedup(emb: DataFrame, vecCol: String, idCol: String,
                    centroids: Array[Array[Double]],
                    threshold: Double): DataFrame =
    graft.dedup.Components.dedupByPairs(emb, idCol,
      semanticPairs(emb, vecCol, idCol, centroids, threshold), "id_a", "id_b")

  /** SEMANTIC decontamination — the embedding-space counterpart of
    * [[graft.dedup.Dedup.contaminatedIds]]'s n-gram shingle overlap:
    * flag corpus vectors whose max cosine against a BENCHMARK bank
    * reaches `threshold` (paraphrased eval leakage that never shares a
    * 5-gram). Benchmark sets are a bounded dimension by definition
    * (eval suites are thousands of rows, not corpora), so the whole
    * bank rides in ONE codegen'd [[graft.functions.NearestCentroid]]
    * object: a 100 TB decontamination pass is a MAP-ONLY scan — no
    * shuffle, no pair join; the argmax bench row joins back through a
    * broadcast to recover its id and exact cosine.
    *
    * Output: (id, bench_id, max_cosine, contaminated) — bench_id is
    * the argmax bank member (cosine ties: later bank index wins, the
    * expression's documented order; the bank is ordered by bench id
    * ascending); `contaminated` compares the ROUNDED (scale-dp) cosine
    * so both engines threshold the identical display value. Use
    * `.filter(!col("contaminated"))` for the cleansed corpus.
    */
  /** Deterministic ±1 sign matrix for [[randomProject]], derived from
    * md5 so an external SQL engine reproduces it: entry (j, i) is +1
    * iff the first hex nibble of md5("jl:seed:j:i") < 8 — the
    * Achlioptas-style Rademacher variant of the JL projection matrix
    * (±1 entries preserve pairwise distances in expectation exactly
    * like gaussians, at integer-arithmetic cost; Achlioptas 2001).
    */
  def jlSignMatrix(outDim: Int, inDim: Int, seed: String = "jl"): Array[Array[Double]] = {
    require(outDim > 0 && inDim > 0, s"dims must be positive, got $outDim x $inDim")
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim) { j =>
      Array.tabulate(inDim) { i =>
        val h = md.digest(s"jl:$seed:$j:$i".getBytes("UTF-8"))
        // first hex nibble = high nibble of byte 0
        if (((h(0) >> 4) & 0xf) < 8) 1.0 else -1.0
      }
    }
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions:
    * out[j] = Σ_i v[i]·s_ji / √outDim with the deterministic
    * [[jlSignMatrix]]. MAP-ONLY — the matrix rides in one codegen'd
    * [[graft.functions.MatVec]] object, so reducing a 100 TB embedding
    * table is a single scan with no shuffle; the output feeds the ANN/
    * dedup family at outDim/inDim of the distance-computation cost
    * (the standard pre-step before LSH or IVF at extreme scale).
    * Component values are bit-reproducible in SQL as
    * `list_dot_product(v, signs_j) / sqrt(outDim)` (left-to-right
    * accumulation, division applied to the sum).
    */
  def randomProject(emb: DataFrame, vecCol: String, idCol: String,
                    inDim: Int, outDim: Int, seed: String = "jl"): DataFrame =
    emb.select(col(idCol),
      graft.functions.MatVec(col(vecCol), jlSignMatrix(outDim, inDim, seed),
        math.sqrt(outDim.toDouble)).as("projected"))

  /** k-NN neighbor lists for a BOUNDED query set in ONE corpus scan:
    * the queries ride as a single L2-NORMALIZED matrix inside one
    * codegen'd [[graft.functions.MatVec]] (out[q] = dot(v, q/|q|)), so
    * the scan computes every query's dot product per row map-only; a
    * posexplode + per-QUERY rank window (parallel across queries, no
    * global sort) keeps the top k. cosine = out[q]/|v| with |v|
    * computed once per row. Ties on sim break on neighbor id
    * ascending — a total order, and every float op is IEEE-sequential
    * (list_dot_product-reproducible), so the neighbor sets are
    * engine-exact. Output: (query_id, rank, neighbor id, label…).
    */
  def knnNeighbors(corpus: DataFrame, vecCol: String, idCol: String,
                   queries: Array[(Long, Array[Double])], k: Int,
                   excludeSelf: Boolean = true,
                   carryCols: Seq[String] = Seq.empty): DataFrame = {
    require(queries.nonEmpty, "knnNeighbors: empty query set")
    require(k > 0, s"k must be positive, got $k")
    val qnorm = queries.map { case (_, q) =>
      val n = math.sqrt(q.map(x => x * x).sum)
      require(n > 0, "knnNeighbors: zero-norm query vector")
      q.map(_ / n)
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    val qIds = queries.zipWithIndex.map { case ((qid, _), i) => (i, qid) }
      .toSeq.toDF("_qi", "query_id")
    val scored = corpus
      .withColumn("_dots", graft.functions.MatVec(col(vecCol), qnorm, 1.0))
      .withColumn("_vn", norm(col(vecCol)))
      .select(Seq(col(idCol), posexplode(col("_dots")).as(Seq("_qi", "_dot")),
        col("_vn")) ++ carryCols.map(col): _*)
      .withColumn("_sim", when(col("_vn") > 0, col("_dot") / col("_vn")))
      .join(broadcast(qIds), Seq("_qi"))
    val base = if (excludeSelf) scored.filter(col(idCol) =!= col("query_id"))
               else scored
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("_sim").desc_nulls_last, col(idCol).asc)
    base.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(Seq(col("query_id"), col("rank"), col(idCol)) ++
        carryCols.map(col) :+ col("_sim").as("sim"): _*)
  }

  /** k-NN LABEL assignment (the classic embedding-quality eval and
    * pseudo-labeling step): majority vote over [[knnNeighbors]]'
    * label column — vote ties break on the SMALLER label (total
    * order). Output: (query_id, pred_label, votes).
    */
  def knnClassify(corpus: DataFrame, vecCol: String, idCol: String,
                  labelCol: String, queries: Array[(Long, Array[Double])],
                  k: Int, excludeSelf: Boolean = true): DataFrame = {
    val nb = knnNeighbors(corpus, vecCol, idCol, queries, k, excludeSelf,
      carryCols = Seq(labelCol))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col(labelCol).asc)
    nb.groupBy(col("query_id"), col(labelCol))
      .agg(count(lit(1)).as("votes"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("query_id"), col(labelCol).as("pred_label"), col("votes"))
  }

  def semanticContamination(corpus: DataFrame, vecCol: String, idCol: String,
                            bench: DataFrame, benchVecCol: String,
                            benchIdCol: String, threshold: Double,
                            scale: Int = 4): DataFrame = {
    // bounded by the benchmark's size — same collect contract as the
    // centroid banks (and like them, a deliberate, documented bound)
    val bank = bench.select(col(benchIdCol).cast("long"), col(benchVecCol))
      .orderBy(col(benchIdCol).cast("long")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    require(bank.nonEmpty, "semanticContamination: benchmark bank is empty")
    val spark = corpus.sparkSession
    import spark.implicits._
    val bankIds = bank.zipWithIndex
      .map { case ((bid, _), i) => (i, bid) }.toSeq.toDF("_bi", "bench_id")
    // bench-side norms ride the broadcast (computed once per bench
    // row, not once per corpus row — r16); the when() reproduces
    // cosine()'s null-on-zero/null-norm bit-exactly
    val assigned = corpus.select(col(idCol), col(vecCol),
      norm(col(vecCol)).as("_cn"),
      nearestCentroid(col(vecCol), bank.map(_._2)).as("_bi"))
    val benchVecs = bench.select(col(benchIdCol).cast("long").as("bench_id"),
      col(benchVecCol).as("_bv"), norm(col(benchVecCol)).as("_bn"))
    assigned
      .join(broadcast(bankIds), Seq("_bi"))
      .join(broadcast(benchVecs), Seq("bench_id"))
      .select(col(idCol), col("bench_id"),
        round(when(col("_cn") * col("_bn") > 0,
          dot(col(vecCol), col("_bv")) / (col("_cn") * col("_bn"))), scale)
          .as("max_cosine"))
      .withColumn("contaminated", col("max_cosine") >= threshold)
  }

  /** D62b: IVF-bucketed semantic decontamination — the UNBOUNDED-bank
    * path for [[semanticContamination]], whose collect-the-bank
    * contract is right for eval suites (thousands of rows) and a
    * driver-killer for a bank that is itself a corpus (e.g. "remove
    * anything semantically close to the held-out set" at millions of
    * vectors). Nothing is collected or broadcast: corpus AND bank are
    * assigned to IVF cells with one shared centroid bank (two map-only
    * [[graft.functions.NearestCentroid]] scans), and the argmax-cosine
    * bench member is found WITHIN the corpus row's cell via a
    * cell-keyed join + `max(struct(sim, bench_id))` aggregate —
    * map-side partial, so the shuffle carries one (sim, id) pair per
    * corpus id per partition, never the scored frame.
    *
    * Semantics: max(struct) = largest sim, then largest bench_id —
    * the same "later bank index wins" tie rule as the bounded path
    * (whose bank is ordered by bench id ascending). A corpus row
    * whose cell holds no bench vector comes back with null
    * bench_id/max_cosine and contaminated=false; a true neighbor
    * across the cell boundary is invisible (the ivfTopK nprobe=1
    * recall contract). With a single centroid the blocking is vacuous
    * and the output EQUALS the bounded path's on every row with a
    * non-null cosine (spec-gated).
    *
    * Output: (id, bench_id, max_cosine, contaminated).
    */
  def semanticContaminationBlocked(corpus: DataFrame, vecCol: String,
                                   idCol: String, bench: DataFrame,
                                   benchVecCol: String, benchIdCol: String,
                                   centroids: Array[Array[Double]],
                                   threshold: Double,
                                   scale: Int = 4,
                                   saltBuckets: Int = 1): DataFrame = {
    require(centroids.nonEmpty, "semanticContaminationBlocked: empty centroid bank")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    // saltBuckets spreads each cell over S tasks (join parallelism is
    // otherwise capped at the number of distinct cells — see
    // marginMiningBlocked's parallelism note): corpus rows take
    // _salt = pmod(id, S), bench rows explode to all S salts, every
    // same-cell pair still meets exactly once (bit-identical results
    // for any S, spec-gated).
    // per-side norms hoisted out of the pair space + zero/null-norm
    // rows dropped per-side (the batchTopK r16 rule — bit-identical:
    // those rows' pairs were exactly the ones the _sim.isNotNull
    // filter dropped after a 3-dot-products-per-pair cosine)
    val ca = corpus.select(col(idCol), col(vecCol).as("_ev"),
      norm(col(vecCol)).as("_en"),
      graft.functions.NearestCentroid(col(vecCol), centroids).as("_cell"),
      pmod(col(idCol).cast("long"), lit(saltBuckets.toLong)).as("_salt"))
      .filter(col("_en") > 0)
    val ba = bench.select(col(benchIdCol).cast("long").as("bench_id"),
      col(benchVecCol).as("_bv"), norm(col(benchVecCol)).as("_bn"),
      graft.functions.NearestCentroid(col(benchVecCol), centroids).as("_cell"))
      .filter(col("_bn") > 0)
      .withColumn("_salt", explode(lit((0L until saltBuckets.toLong).toArray)))
    // explicit partitioning on the (cell, salt) key (the semanticPairs
    // rule): tiny inputs fanning out into a heavy pair frame must not
    // be AQE-coalesced into one task
    val parts = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val scored = ca.repartition(parts, col("_cell"), col("_salt"))
      .join(ba.repartition(parts, col("_cell"), col("_salt")),
        Seq("_cell", "_salt"))
      .select(col(idCol), col("bench_id"),
        (dot(col("_ev"), col("_bv")) / (col("_en") * col("_bn"))).as("_sim"))
    val best = scored.groupBy(col(idCol))
      .agg(max(struct(col("_sim"), col("bench_id"))).as("_m"))
      .select(col(idCol), col("_m.bench_id").as("bench_id"),
        round(col("_m._sim"), scale).as("max_cosine"))
    corpus.select(col(idCol)).join(best, Seq(idCol), "left")
      .select(col(idCol), col("bench_id"), col("max_cosine"),
        coalesce(col("max_cosine") >= threshold, lit(false)).as("contaminated"))
  }

  /** D90: exact batch top-k retrieval — k nearest corpus vectors by
    * cosine for EVERY query in a (bounded) query frame at once, the
    * retrieval core of a RAG indexing/serving pipeline and the
    * many-query generalization of [[cosineTopK]].
    *
    * Plan shape (the reason this is an operator and not a window):
    * queries BROADCAST against one corpus scan (map-only scoring,
    * no shuffle of the corpus), then grouped top-k via
    * [[graft.functions.TopKPairsAgg]] — a map-side-combining
    * aggregate whose partial buffers are k-bounded, so the shuffle
    * carries AT MOST partitions × queries × k pairs. The idiomatic
    * `row_number` window would shuffle the full |corpus| × |queries|
    * scored frame; at 100 TB that difference is the job. Scores are
    * micro-quantized longs under the total order (score DESC, id
    * ASC) — partitioning/merge-order independent, exact on any
    * engine. Null/zero-norm vectors drop out (no cosine). For
    * corpora too large even to scan per batch, cut candidates first
    * with the LSH/IVF variants and re-score exactly.
    *
    * Returns (query_id, rank, id, score_micro), rank 1..k.
    */
  def batchTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                queries: DataFrame, queryId: String, queryVec: String,
                k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // Norms are per-vector: hoist them out of the pair space (r16 —
    // the cosinePairsExact rule). cosine() inside the join evaluated
    // BOTH self-dot-products per pair, and the isNotNull filter
    // pushed the whole expression into the join condition, where it
    // was evaluated AGAIN — 6 dot products per pair where 1 suffices.
    // Zero/null-norm rows (exactly the rows cosine() nulled out) now
    // drop per-side BEFORE the join: d = n_c·n_q > 0 ⟺ n_c > 0 ∧
    // n_q > 0 for real norms (non-negative), and dot() is non-null on
    // non-null arrays, so the kept-pair set and every score bit are
    // unchanged on NaN-free embeddings. NaN caveat (ADVICE r16): Spark
    // SQL orders NaN above every number, so `_n > 0` KEEPS a NaN-norm
    // row — in the mixed case (NaN norm one side, zero norm the other)
    // the old in-join form kept the pair with a NaN score (which sorts
    // greatest and could win top-k) while the per-side form drops the
    // zero-norm side, never forming the pair. The per-side behavior is
    // the saner one (a zero vector has no cosine neighbors); vectors
    // with NaN components are out of contract for every ANN operator
    // here.
    val q = queries.select(col(queryId).cast("long").as("_qid"),
      col(queryVec).as("_qv"), norm(col(queryVec)).as("_qn"))
      .filter(col("_qn") > 0)
    corpus.select(col(corpusId).cast("long").as("_cid"),
        col(corpusVec).as("_cv"), norm(col(corpusVec)).as("_cn"))
      .filter(col("_cn") > 0)
      .crossJoin(broadcast(q))
      .select(col("_qid"), col("_cid"),
        round(dot(col("_cv"), col("_qv")) / (col("_cn") * col("_qn")) * 1e6)
          .cast("long").as("_sm"))
      .groupBy("_qid")
      .agg(graft.functions.TopKPairsAgg(col("_sm"), col("_cid"), k).as("_top"))
      .select(col("_qid").as("query_id"), posexplode(col("_top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("id"), col("col.score_micro").as("score_micro"))
  }

  /** D97: margin-based bitext mining (Artetxe & Schwenk ACL 2019,
    * the CCMatrix/LASER parallel-corpus mining step — raw cosine
    * over-fires on "hub" vectors that are close to everything;
    * dividing by the average similarity of each side's own
    * neighborhood normalizes hubness away): for source x and target
    * y, margin(x,y) = 2·cos(x,y) / (meanTopK(x→tgt) + meanTopK(y→src));
    * keep each source's best-margin target when the margin clears
    * `thresholdMicro` (ratio margin ×1e6; >1e6 means "closer than
    * the average neighbor").
    *
    * Built ON [[batchTopK]] — two exact retrieval passes (src→tgt,
    * tgt→src), both map-only scans with k-bounded aggregate shuffles;
    * everything after operates on the ≤|src|·k candidate frame.
    * EXACTNESS IS FULLY INTEGER: cosines are the micro longs the
    * retrieval already certifies, per-side neighborhood sums S and T
    * are k-bounded long sums, and the margin is the integer division
    * (2·k·cos_micro·1e6) div (S+T) — no float anywhere, so no
    * boundary guard is even needed (the e2e-8 RRF argument). The
    * per-source argmax rides [[graft.functions.TopKPairsAgg]] with
    * k=1 under (margin desc, tgt asc).
    *
    * Both query sides must be bounded frames (the batchTopK
    * broadcast contract); for corpus×corpus mining at 100 TB, block
    * by LSH/IVF buckets first and margin-mine within blocks.
    *
    * Returns (src_id, tgt_id, cos_micro, margin_micro).
    */
  def marginMining(src: DataFrame, srcId: String, srcVec: String,
                   tgt: DataFrame, tgtId: String, tgtVec: String,
                   k: Int, thresholdMicro: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val fwd = graft.CacheScope.persist(
      batchTopK(tgt, tgtId, tgtVec, src, srcId, srcVec, k)
        .withColumnRenamed("query_id", "src_id")
        .withColumnRenamed("id", "tgt_id"))
    val bwd = batchTopK(src, srcId, srcVec, tgt, tgtId, tgtVec, k)
      .withColumnRenamed("query_id", "tgt_id")
      .withColumnRenamed("id", "src_id")
    marginSelect(fwd, bwd, k, thresholdMicro)
  }

  /** The shared post-retrieval margin math: `fwd` = per-src top-k
    * candidates (src_id, tgt_id, score_micro), `bwd` = per-tgt top-k
    * (tgt_id, src_id, score_micro). Neighborhood sums S and T are
    * k-bounded long sums; margin = (2·k·cos_micro·1e6) div (S+T) —
    * fully integer; per-src argmax via [[graft.functions.TopKPairsAgg]]
    * k=1 under (margin desc, tgt asc).
    */
  private def marginSelect(fwd: DataFrame, bwd: DataFrame, k: Int,
                           thresholdMicro: Long): DataFrame = {
    val s = fwd.groupBy(col("src_id")).agg(sum(col("score_micro")).as("_s"))
    val t = bwd.groupBy(col("tgt_id")).agg(sum(col("score_micro")).as("_t"))
    val scored = fwd
      .join(s, Seq("src_id"))
      .join(t, Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"),
        col("score_micro").as("cos_micro"),
        expr(s"(2L * $k * score_micro * 1000000L) div (_s + _t)")
          .as("margin_micro"))
    scored
      .groupBy(col("src_id"))
      .agg(graft.functions.TopKPairsAgg(col("margin_micro"), col("tgt_id"), 1)
        .as("_top"))
      .select(col("src_id"), col("_top").getItem(0).getField("id").as("tgt_id"),
        col("_top").getItem(0).getField("score_micro").as("margin_micro"))
      .filter(col("margin_micro") >= thresholdMicro)
      .join(scored.select(col("src_id"), col("tgt_id"), col("cos_micro")),
        Seq("src_id", "tgt_id"))
      .select(col("src_id"), col("tgt_id"), col("cos_micro"),
        col("margin_micro"))
  }

  /** D97b: BLOCKED margin mining — the corpus×corpus production path
    * [[marginMining]]'s contract points at ("block by LSH/IVF buckets
    * first"). Both corpora are assigned to IVF cells with ONE shared
    * centroid bank (map-only [[graft.functions.NearestCentroid]]
    * scans — the bank rides in a single codegen object, nothing is
    * collected or broadcast), then mining runs WITHIN each cell: a
    * cell-keyed shuffle join replaces [[batchTopK]]'s query-side
    * broadcast, so candidate volume is Σ_cell |src_c|·|tgt_c| ≪
    * |src|·|tgt| with balanced cells, and both retrieval directions
    * read the ONE persisted within-cell pair frame (the forward and
    * backward scores are the same symmetric cosines).
    *
    * Semantics: the top-k neighborhoods (and therefore the hubness
    * sums S, T) are computed within the cell — a true neighbor that
    * falls across a cell boundary is missed and its margin mass is
    * redistributed (the SemDeDup/IVF trade-off, the same recall
    * contract as [[ivfTopK]] at nprobe=1). With a single centroid the
    * blocking is vacuous and the output EQUALS [[marginMining]]'s
    * exactly (spec-gated). Within-cell math is bit-identical to the
    * exact path: micro-quantized cosines, integer margins, the same
    * (margin desc, tgt asc) argmax.
    *
    * Parallelism: the pair join's natural task count is the number of
    * DISTINCT CELLS — right when cells ≥ cluster parallelism (the
    * production regime: hundreds-plus cells), a ceiling when a
    * coarse bank meets a big corpus (measured: the 4-cell x50 gate
    * dial kept ~4 of 32 cores busy). `saltBuckets` = S spreads each
    * cell over S tasks: the src side takes `_salt = pmod(src_id, S)`,
    * the tgt side EXPLODES to all S salts (tgt shuffle volume ×S —
    * assignment-row-sized, noise next to the pair volume), and the
    * join key becomes (_cell, _salt). Every (src, tgt) same-cell pair
    * still meets exactly once, so the result is bit-identical for any
    * S (spec-gated).
    *
    * Returns (src_id, tgt_id, cos_micro, margin_micro).
    */
  def marginMiningBlocked(src: DataFrame, srcId: String, srcVec: String,
                          tgt: DataFrame, tgtId: String, tgtVec: String,
                          centroids: Array[Array[Double]], k: Int,
                          thresholdMicro: Long,
                          saltBuckets: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(centroids.nonEmpty, "marginMiningBlocked: empty centroid bank")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    // per-side norms hoisted out of the pair space + zero/null-norm
    // rows dropped per-side (the batchTopK r16 rule — bit-identical:
    // those rows' pairs were exactly the ones cosine() nulled out)
    val sa = src.select(col(srcId).cast("long").as("src_id"),
      col(srcVec).as("_sv"), norm(col(srcVec)).as("_sn"),
      graft.functions.NearestCentroid(col(srcVec), centroids).as("_cell"),
      pmod(col(srcId).cast("long"), lit(saltBuckets.toLong)).as("_salt"))
      .filter(col("_sn") > 0)
    val ta = tgt.select(col(tgtId).cast("long").as("tgt_id"),
      col(tgtVec).as("_tv"), norm(col(tgtVec)).as("_tn"),
      graft.functions.NearestCentroid(col(tgtVec), centroids).as("_cell"))
      .filter(col("_tn") > 0)
      .withColumn("_salt", explode(lit((0L until saltBuckets.toLong).toArray)))
    // explicit partitioning on the (cell, salt) key (the semanticPairs
    // rule): input-tiny, output-heavy join — AQE would coalesce the
    // tiny inputs into one task and serialize pair generation
    val parts = src.sparkSession.sessionState.conf.numShufflePartitions
    val pairs = graft.CacheScope.persist(
      sa.repartition(parts, col("_cell"), col("_salt"))
        .join(ta.repartition(parts, col("_cell"), col("_salt")),
          Seq("_cell", "_salt"))
        .select(col("src_id"), col("tgt_id"),
          round(dot(col("_sv"), col("_tv")) / (col("_sn") * col("_tn")) * 1e6)
            .cast("long").as("_sm")))
    val fwd = pairs
      .groupBy(col("src_id"))
      .agg(graft.functions.TopKPairsAgg(col("_sm"), col("tgt_id"), k).as("_top"))
      .select(col("src_id"), posexplode(col("_top")))
      .select(col("src_id"), col("col.id").as("tgt_id"),
        col("col.score_micro").as("score_micro"))
    val bwd = pairs
      .groupBy(col("tgt_id"))
      .agg(graft.functions.TopKPairsAgg(col("_sm"), col("src_id"), k).as("_top"))
      .select(col("tgt_id"), posexplode(col("_top")))
      .select(col("tgt_id"), col("col.id").as("src_id"),
        col("col.score_micro").as("score_micro"))
    marginSelect(fwd, bwd, k, thresholdMicro)
  }
}

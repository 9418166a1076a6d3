package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D93: LSH banding planner — pick the (bands b, rows r) dial for the
  * minhash family (D2 `minhashPairs`, D34b `minhashMatchesAgainstStore`)
  * BEFORE submitting the job, from closed-form collision math plus an
  * optional measured background-similarity histogram. Operationalizes
  * the r13 banding-dial lesson (GATE_r13.md): a 64×2 banding at
  * threshold 0.7 over a corpus whose background similarity sits at
  * ~0.6 is output-quadratic BY CONSTRUCTION — the right dial puts the
  * S-curve midpoint (1/b)^(1/r) ABOVE the background mass, and that
  * is computable from b, r, and a pair-similarity histogram without
  * running anything corpus-sized. The planning-layer sibling of
  * [[CandidateGuard]]: the guard refuses a quadratic job at submit
  * time; the planner chooses the dial that avoids submitting it.
  *
  * Banded-minhash collision probability for a pair at Jaccard s:
  * P(s) = 1 − (1 − s^r)^b (Leskovec/Rajaraman/Ullman, Mining of
  * Massive Datasets ch. 3). A plan is FEASIBLE when its miss
  * probability at the target threshold, 1 − P(t) = (1 − t^r)^b, is
  * within `missBudget`; among feasible plans the planner chooses the
  * highest S-curve midpoint (fewest background collisions), ties on
  * smaller b (cheaper signatures to band).
  *
  * Float discipline: miss probabilities span 1e-15..1 so they are
  * carried in LOG space as micro-nats (ln_miss_micro = round(1e6 ·
  * b·ln(1 − t^r)) — the D44/D46 micro-nat discipline), midpoints and
  * per-histogram-row expected-candidate contributions quantize to
  * micro units, each with a rounding-boundary distance folded into
  * ONE guard row; feasibility and choice are then decided ON the
  * quantized integers, so the plan table is engine-deterministic
  * whenever the guard holds (libm pow/ln drift lives strictly below
  * the guarded boundary). All frames are divisor-count × histogram
  * sized — the whole point is that planning never touches the corpus.
  */
object BandingPlanner {

  /** All (b, r) factorizations of `nSig` (b·r = nSig), b ascending. */
  def factorizations(nSig: Int): Seq[(Int, Int)] = {
    require(nSig >= 1, s"nSig must be >= 1, got $nSig")
    (1 to nSig).filter(nSig % _ == 0).map(b => (b, nSig / b))
  }

  /** Closed-form plan table:
    * (b, r, ln_miss_micro, midpoint_micro, feasible, chosen) — one
    * row per factorization of `nSig`, ordered by b. See object doc
    * for the selection rule. Second frame = ONE guard row
    * (`min_plan_dist`): minimum boundary distance of any quantized
    * value, including the ln-budget constant — `> 1e-7` certifies
    * the integer plan table (and therefore feasible/chosen) is
    * engine-portable.
    */
  def planTable(spark: SparkSession, nSig: Int, threshold: Double,
                missBudget: Double): (DataFrame, DataFrame) = {
    val (plans, guard) = planFrames(spark, nSig, threshold, missBudget, None)
    (plans, guard)
  }

  /** [[planTable]] plus a candidate-volume forecast from a measured
    * background pair-similarity histogram `hist` (sim_centi: int
    * 0..100, pairs: long — e.g. from a bounded sample of band-bucket
    * pairs, or pinned from a prior run): adds `exp_cand_micro`, the
    * expected number of candidate pairs ×1e6 = Σ_rows pairs ·
    * (1 − (1 − s^r)^b), each row's contribution micro-quantized then
    * summed as LONGS (merge-order exact). The number that says
    * "this dial is output-quadratic on THIS corpus" before any job
    * runs.
    */
  def planWithBackground(spark: SparkSession, nSig: Int, threshold: Double,
                         missBudget: Double, hist: DataFrame)
      : (DataFrame, DataFrame) =
    planFrames(spark, nSig, threshold, missBudget, Some(hist))

  private def planFrames(spark: SparkSession, nSig: Int, threshold: Double,
                         missBudget: Double, hist: Option[DataFrame])
      : (DataFrame, DataFrame) = {
    require(threshold > 0 && threshold < 1,
      s"threshold must be in (0,1), got $threshold")
    require(missBudget > 0 && missBudget < 1,
      s"missBudget must be in (0,1), got $missBudget")
    import spark.implicits._
    val base = factorizations(nSig).toDF("b", "r")
      .select(col("b").cast("long").as("b"), col("r").cast("long").as("r"))
    // ln-space miss at the threshold: b * ln(1 - t^r), micro-nats
    val lnMiss = col("b").cast("double") *
      log(lit(1.0) - pow(lit(threshold), col("r").cast("double"))) * lit(1e6)
    // S-curve midpoint (1/b)^(1/r) = exp(-ln(b)/r), micro units
    val mid = exp(-log(col("b").cast("double")) / col("r").cast("double")) * lit(1e6)
    val lnBudget = math.log(missBudget) * 1e6
    val scored = base.select(col("b"), col("r"),
      round(lnMiss).cast("long").as("ln_miss_micro"),
      round(mid).cast("long").as("midpoint_micro"),
      abs(lnMiss - floor(lnMiss) - lit(0.5)).as("_bd1"),
      abs(mid - floor(mid) - lit(0.5)).as("_bd2"),
      // decision-boundary distance: quantized ln_miss vs the quantized
      // budget must not sit ON the boundary for feasible to be stable
      abs(lnMiss - lit(lnBudget)).as("_bd3"))
    val withCand = hist match {
      case None => scored.withColumn("_bd4", lit(0.5))
      case Some(h) =>
        val hh = h.select(col("sim_centi").cast("double").as("_s"),
          col("pairs").cast("double").as("_p"))
        // per-row expected collisions: pairs * (1 - (1 - (s/100)^r)^b)
        val collide = col("_p") * (lit(1.0) -
          pow(lit(1.0) - pow(col("_s") / lit(100.0), col("r").cast("double")),
            col("b").cast("double"))) * lit(1e6)
        val rows = scored.crossJoin(broadcast(hh))
          .withColumn("_cm", round(collide).cast("long"))
          .withColumn("_cbd", abs(collide - floor(collide) - lit(0.5)))
        rows.groupBy((scored.columns.filter(!_.startsWith("_bd")).map(col) :+
            col("_bd1") :+ col("_bd2") :+ col("_bd3")): _*)
          .agg(sum(col("_cm")).as("exp_cand_micro"),
            coalesce(min(col("_cbd")), lit(0.5)).as("_bd4"))
    }
    val pinned = graft.CacheScope.persist(withCand)
    val guard = pinned.agg(least(
      coalesce(min(col("_bd1")), lit(0.5)),
      coalesce(min(col("_bd2")), lit(0.5)),
      coalesce(min(col("_bd3")), lit(0.5)),
      coalesce(min(col("_bd4")), lit(0.5))).as("min_plan_dist"))
    val flagged = pinned.drop("_bd1", "_bd2", "_bd3", "_bd4")
      .withColumn("feasible",
        col("ln_miss_micro") <= lit(math.round(lnBudget)))
    // chosen: max midpoint among feasible, ties on smaller b — a total
    // order over quantized integers, decided via one broadcast
    // one-row max (no window, no driver action)
    val best = flagged.filter(col("feasible"))
      .agg(max(struct(col("midpoint_micro").as("m"), (-col("b")).as("nb"))).as("_w"))
    val plans = flagged.crossJoin(broadcast(best))
      .withColumn("chosen", col("feasible") && col("_w").isNotNull &&
        struct(col("midpoint_micro").as("m"), (-col("b")).as("nb")) === col("_w"))
      .drop("_w")
      .orderBy(col("b"))
    (plans, guard)
  }
}

package graft

import graft.similarity.BandingPlanner

class BandingPlannerSpec extends SparkSpec {
  import spark.implicits._

  test("factorizations: complete divisor pairs, b ascending") {
    val f = BandingPlanner.factorizations(128)
    assert(f == Seq((1, 128), (2, 64), (4, 32), (8, 16), (16, 8), (32, 4),
      (64, 2), (128, 1)))
    assert(BandingPlanner.factorizations(12) ==
      Seq((1, 12), (2, 6), (3, 4), (4, 3), (6, 2), (12, 1)))
  }

  test("the r13 dial case: t=0.9, eps=1e-12 over 128 sigs chooses 32x4") {
    val (plans, guard) = BandingPlanner.planTable(spark, 128, 0.9, 1e-12)
    val rows = plans.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L))
    // hand math: ln_miss = b*ln(1-0.9^r) micro-nats; feasible iff
    // <= round(ln(1e-12)*1e6) = -27631021
    for ((b, r, lm, mid, feas, _) <- rows) {
      val wantLm = math.round(b * math.log(1.0 - math.pow(0.9, r.toDouble)) * 1e6)
      val wantMid = math.round(math.exp(-math.log(b.toDouble) / r) * 1e6)
      assert(lm == wantLm, s"b=$b")
      assert(mid == wantMid, s"b=$b")
      assert(feas == (lm <= -27631021L), s"b=$b")
    }
    val feasibleBs = rows.filter(_._5).map(_._1).toSet
    assert(feasibleBs == Set(32L, 64L, 128L))
    // chosen = max midpoint among feasible = 32x4 — exactly the dial
    // the d34b gate was retuned to (GATE_r13 banding-dial lesson)
    assert(rows.filter(_._6).map(t => (t._1, t._2)).toSeq == Seq((32L, 4L)))
    val g = guard.collect()(0).getDouble(0)
    assert(g > 0 && g <= 0.5)
  }

  test("no feasible plan: chosen nowhere, table still complete") {
    // 4 signatures can't reach 1e-12 miss at t=0.5
    val (plans, _) = BandingPlanner.planTable(spark, 4, 0.5, 1e-12)
    val rows = plans.collect()
    assert(rows.length == 3)
    assert(rows.forall(!_.getBoolean(4)) && rows.forall(!_.getBoolean(5)))
  }

  test("background forecast: exact micro sums, monotone vs midpoint") {
    val hist = Seq((60, 40000L), (75, 7000L), (90, 12L))
      .toDF("sim_centi", "pairs")
    val (plans, guard) = BandingPlanner.planWithBackground(
      spark, 128, 0.9, 1e-12, hist)
    val byB = plans.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(3), r.getAs[Long]("exp_cand_micro"))).toMap
    // replicate the exact double tree per histogram row
    def cand(b: Long, r: Long): Long = Seq((60, 40000L), (75, 7000L), (90, 12L))
      .map { case (s, p) =>
        math.round(p * (1.0 - math.pow(1.0 - math.pow(s / 100.0, r.toDouble),
          b.toDouble)) * 1e6)
      }.sum
    for ((b, (r, _, ec)) <- byB) assert(ec == cand(b, r), s"b=$b")
    // more selective curves (higher midpoint) forecast fewer candidates
    val byMid = byB.values.toSeq.sortBy(_._2)
    assert(byMid.map(_._3) == byMid.map(_._3).sorted.reverse)
    assert(guard.collect()(0).getDouble(0) > 0)
  }

  test("invalid dials refused loud") {
    intercept[IllegalArgumentException] {
      BandingPlanner.planTable(spark, 128, 1.5, 1e-12)
    }
    intercept[IllegalArgumentException] {
      BandingPlanner.planTable(spark, 128, 0.9, 0.0)
    }
    intercept[IllegalArgumentException] { BandingPlanner.factorizations(0) }
  }
}

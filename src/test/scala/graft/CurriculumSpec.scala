package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Curriculum

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed sqrt schedule (T=10, c0=0.1, 4 distinct difficulties)") {
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("id", "diff")
    val got = Curriculum.firstEligibleStep(df, "id", col("diff"), 10)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSeq
    // p = cnt/4; t >= (100*10*cnt^2 - 10*16) / (99*16)
    // cnt 1: 840/1584 -> 1; cnt 2: 3840/1584 -> 3; cnt 3: 8840/1584 -> 6; cnt 4: 15840/1584 = 10
    assert(got == Seq((1L, 1L, 1L), (2L, 2L, 3L), (3L, 3L, 6L), (4L, 4L, 10L)))
  }

  test("ties share cdf position and first step; nulls excluded") {
    val df = Seq((1L, Some(5.0)), (2L, Some(5.0)), (3L, Some(9.0)),
      (4L, None)).toDF("id", "diff")
    val got = Curriculum.firstEligibleStep(df, "id", col("diff"), 100)
      .orderBy("id").collect()
    assert(got.length == 3) // null-difficulty doc excluded
    assert(got(0).getLong(2) == 2 && got(1).getLong(2) == 2) // both <= 5.0
    assert(got(0).getLong(4) == got(1).getLong(4))
    assert(got(2).getLong(2) == 3 && got(2).getLong(4) == 100) // p=1 -> exactly T
  }

  test("monotone: harder docs never release earlier; hardest releases exactly at T") {
    val df = (1L to 200L).map(i => (i, i * 0.5)).toDF("id", "diff")
    val rows = Curriculum.firstEligibleStep(df, "id", col("diff"), 1000)
      .orderBy("difficulty_micro").collect().map(_.getLong(4)).toSeq
    assert(rows.zip(rows.tail).forall { case (a, b) => a <= b })
    assert(rows.last == 1000)
    // easiest 10% (p <= c0 = 0.1) all eligible from step 1
    assert(rows.take(20).forall(_ == 1L))
    assert(rows(20) > 1L)
  }

  test("exact ceiling at corpus sizes where decimal-rounded division mis-ceils (b = n^2 > 2e6)") {
    // 3000 docs -> b = 99*9e6*T; the p=1 doc must land EXACTLY at T,
    // and every step must stay within [1, T]
    val df = (1L to 3000L).map(i => (i, i.toDouble)).toDF("id", "diff")
    val steps = Curriculum.firstEligibleStep(df, "id", col("diff"), 50)
      .select("first_step").as[Long].collect()
    assert(steps.max == 50 && steps.min == 1)
    // exact-boundary probe: cnt_le = n -> a/b = T exactly -> ceil = T, not T+1
    assert(steps.count(_ == 50) >= 1)
  }

  test("releaseSchedule sums to corpus size") {
    val df = (1L to 500L).map(i => (i, (i % 37).toDouble)).toDF("id", "diff")
    val assigned = Curriculum.firstEligibleStep(df, "id", col("diff"), 20)
    val sched = Curriculum.releaseSchedule(assigned)
    assert(sched.agg(sum("released")).collect()(0).getLong(0) == 500L)
  }
}

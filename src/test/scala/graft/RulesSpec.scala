package graft

import org.apache.spark.sql.functions._
import graft.quality.{Rule, Validators}

/** Every Rule variant's violation predicate, on literal fixtures. */
class RulesSpec extends SparkSpec {
  import spark.implicits._

  private def violations[A](values: Seq[A], rule: Rule)(implicit
      enc: org.apache.spark.sql.Encoder[A]): Set[Any] =
    values.toDF("v").filter(rule.violation(col("v")))
      .collect().map(_.get(0)).toSet

  test("numeric rules") {
    val vs = Seq(1.0, 5.0, 10.0, 20.0)
    assert(violations(vs, Rule.NumEquals(5.0)) == Set(1.0, 10.0, 20.0))
    assert(violations(vs, Rule.NumGte(5.0)) == Set(1.0))
    assert(violations(vs, Rule.NumLt(10.0)) == Set(10.0, 20.0))
    assert(violations(vs, Rule.NumBetween(5.0, 10.0)) == Set(1.0, 20.0))
  }

  test("date rules") {
    val vs = Seq("2020-01-01", "2021-06-15", "2023-12-31")
    assert(violations(vs, Rule.DateGte("2021-01-01")) == Set("2020-01-01"))
    assert(violations(vs, Rule.DateLt("2023-01-01")) == Set("2023-12-31"))
    assert(violations(vs, Rule.DateBetween("2020-06-01", "2022-01-01")) ==
      Set("2020-01-01", "2023-12-31"))
  }

  test("length rules") {
    val vs = Seq("a", "abc", "abcdef")
    assert(violations(vs, Rule.LenEquals(3)) == Set("a", "abcdef"))
    assert(violations(vs, Rule.LenBetween(2, 5)) == Set("a", "abcdef"))
  }

  test("regex and validator-wrapped rules") {
    val vs = Seq("abc123", "abc", "123")
    assert(violations(vs, Rule.MatchesRegex("^[a-z]+$")) == Set("abc123", "123"))
    val emails = Seq("alice@example.org", "not an email")
    assert(violations(emails, Rule.FromValidator(Validators.emailValid)) ==
      Set("not an email"))
  }

  test("anyViolation unions rule violations") {
    val vs = Seq("ok", "has space", "digit9")
    val any = vs.toDF("v")
      .filter(Rule.anyViolation(col("v"), Seq(Rule.NoSpaces, Rule.NoDigits)))
      .collect().map(_.getString(0)).toSet
    assert(any == Set("has space", "digit9"))
  }
}

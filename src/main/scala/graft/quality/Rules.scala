package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Declarative DQ rule algebra (reference: home.py:273-474 "Define
  * the DQ Rule Yourself"). A Rule compiles to a boolean `Column`
  * that is true when the value VIOLATES the rule — pure expressions,
  * so rule evaluation is scan-local (zero shuffle) and rides inside
  * whole-stage codegen no matter how many rules are stacked.
  */
sealed trait Rule {
  /** true iff the (non-null) value violates this rule. */
  def violation(c: Column): Column
}

object Rule {
  /** home.py:281-309 numeric qualifications (violation = NOT pred). */
  final case class NumEquals(v: Double) extends Rule {
    def violation(c: Column): Column = !(c === v)
  }
  final case class NumGte(v: Double) extends Rule {
    def violation(c: Column): Column = !(c >= v)
  }
  final case class NumLt(v: Double) extends Rule {
    def violation(c: Column): Column = !(c < v)
  }
  final case class NumBetween(lo: Double, hi: Double) extends Rule {
    def violation(c: Column): Column = !(c >= lo && c <= hi)
  }

  /** home.py:357-389 date qualifications (ISO yyyy-MM-dd literals). */
  final case class DateBetween(lo: String, hi: String) extends Rule {
    def violation(c: Column): Column =
      !(c.cast("date") >= to_date(lit(lo)) && c.cast("date") <= to_date(lit(hi)))
  }
  final case class DateGte(lo: String) extends Rule {
    def violation(c: Column): Column = !(c.cast("date") >= to_date(lit(lo)))
  }
  final case class DateLt(hi: String) extends Rule {
    def violation(c: Column): Column = !(c.cast("date") < to_date(lit(hi)))
  }

  /** home.py:394-429 string length qualifications. */
  final case class LenEquals(n: Int) extends Rule {
    def violation(c: Column): Column = !(length(c.cast("string")) === n)
  }
  final case class LenBetween(lo: Int, hi: Int) extends Rule {
    def violation(c: Column): Column = {
      val l = length(c.cast("string"))
      !(l >= lo && l <= hi)
    }
  }

  /** home.py:432-445 "Cannot contain special characters", with the
    * reference's exclusion list (`exclusive` multiselect).
    */
  final case class NoSpecialChars(allowed: Seq[String] = Nil) extends Rule {
    private val specials = Seq(
      "@", "-", "_", ".", ",", "~", "`", "!", "#", "$", "%", "^", "&", "*",
      "(", ")", "+", "=", "{", "}", "[", "]", "|", "/", ":", ";", "\"",
      "'", "<", ">", "?")
    def violation(c: Column): Column = {
      val banned = specials.filterNot(allowed.contains)
      val cls = banned.map(ch => java.util.regex.Pattern.quote(ch)).mkString("|")
      c.cast("string").rlike(cls)
    }
  }

  /** home.py:448-452. */
  case object NoDigits extends Rule {
    def violation(c: Column): Column = c.cast("string").rlike("[0-9]")
  }

  /** home.py:455-457. */
  case object NoSpaces extends Rule {
    def violation(c: Column): Column = c.cast("string").contains(" ")
  }

  /** home.py:460-465 "Specified values cannot be entered". */
  final case class DenyList(values: Seq[String]) extends Rule {
    def violation(c: Column): Column =
      c.cast("string").isin(values.map(_.asInstanceOf[Any]): _*)
  }

  /** Generic regex-must-match rule (engine extension). */
  final case class MatchesRegex(pattern: String) extends Rule {
    def violation(c: Column): Column = !c.cast("string").rlike(pattern)
  }

  /** Wrap any validator Column function as a rule. */
  final case class FromValidator(valid: Column => Column) extends Rule {
    def violation(c: Column): Column = !valid(c)
  }

  /** Union of rules: violation if ANY rule is violated
    * (home.py:467-474 concat of f1..f5).
    */
  def anyViolation(c: Column, rules: Seq[Rule]): Column =
    rules.map(_.violation(c)).reduce(_ || _)
}

/** Cross-field (row-level) consistency rules (SURVEY §2 B21) — the
  * step past per-column rules the reference stops at: a row can be
  * column-wise clean and still inconsistent (end before start, a
  * shipped order with no ship date). A RowRule compiles to a boolean
  * violation `Column` over the whole row — scan-local, codegen'd,
  * stackable exactly like [[Rule]].
  *
  * Null semantics are strict three-valued logic collapsed to "null
  * never violates": the violation expression's NULL (unknown) counts
  * as false via a final coalesce — consistent with per-column rules,
  * where nulls are counted separately as null_records, not as
  * violations.
  */
final case class RowRule(name: String, violationExpr: Column) {
  def violated: Column = coalesce(violationExpr, lit(false))
}

object RowRule {
  /** cond ⇒ expected: violated when cond holds and `expected` is
    * definitively false.
    */
  def implies(name: String, cond: Column, expected: Column): RowRule =
    RowRule(name, (cond === true) && (expected === false))

  /** lo ≤ hi ordering between two fields. */
  def ordered(name: String, lo: Column, hi: Column): RowRule =
    RowRule(name, lo > hi)

  /** At least one of the fields must be present. */
  def notBothNull(name: String, a: Column, b: Column): RowRule =
    RowRule(name, a.isNull && b.isNull)

  /** Fields must agree (null-safe equality: both-null agrees). */
  def mustMatch(name: String, a: Column, b: Column): RowRule =
    RowRule(name, !(a <=> b))

  /** Per-rule violation census in ONE scan (the dqSummary shape):
    * (rule, violations, total, tie-safe 2-dp violation_pct).
    */
  def report(df: org.apache.spark.sql.DataFrame,
             rules: Seq[RowRule]): org.apache.spark.sql.DataFrame = {
    require(rules.nonEmpty, "RowRule.report: need >= 1 rule")
    val perRule = rules.map { r =>
      struct(lit(r.name).as("rule"),
        count(when(r.violated, 1)).as("violations"),
        count(lit(1)).as("total"))
    }
    df.agg(array(perRule.toIndexedSeq: _*).as("_c"))
      .select(explode(col("_c")).as("c"))
      .select(col("c.rule").as("rule"), col("c.violations").as("violations"),
        col("c.total").as("total"),
        (expr("(2*c.violations*10000 + greatest(c.total, 1L))" +
          " DIV (2*greatest(c.total, 1L))") / 100.0).as("violation_pct"))
      .orderBy("rule")
  }

  /** Flag each row with the names of the rules it violates (empty
    * array = consistent row) — the drill-down companion of [[report]].
    */
  def flag(df: org.apache.spark.sql.DataFrame,
           rules: Seq[RowRule]): org.apache.spark.sql.DataFrame = {
    require(rules.nonEmpty, "RowRule.flag: need >= 1 rule")
    df.withColumn("violated_rules", filter(
      array(rules.map(r => when(r.violated, lit(r.name))).toIndexedSeq: _*),
      _.isNotNull))
  }
}

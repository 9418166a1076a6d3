package graft

import org.apache.spark.sql.functions._
import graft.quality.Validators

class ValidatorsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference TCKN algorithm (TRnoChecker.py:1-21) re-implemented
    * plainly in the test as the oracle.
    */
  private def tcknRef(v: String): Boolean = {
    if (v.length != 11 || !v.forall(_.isDigit) || v(0) == '0') return false
    val d = v.map(_.asDigit)
    val odd = d(0) + d(2) + d(4) + d(6) + d(8)
    val even = d(1) + d(3) + d(5) + d(7)
    (((7 * odd - even) % 10 + 10) % 10 == d(9)) && (d.take(10).sum % 10 == d(10))
  }

  private def taxRef(t: String): Boolean = {
    if (t.length == 11) return tcknRef(t)
    if (t.length != 10 || !t.forall(_.isDigit)) return false
    val d = t.map(_.asDigit)
    var total = 0
    for (x <- 0 to 8) {
      val t1 = (d(x) + (9 - x)) % 10
      var t2 = (t1 * (1 << (9 - x))) % 9
      if (t1 != 0 && t2 == 0) t2 = 9
      total += t2
    }
    val check = if (total % 10 == 0) 0 else 10 - (total % 10)
    d(9) == check
  }

  test("tcknValid matches reference checksum on generated ids") {
    val ids = (0 until 500).map(i => (10000000000L + i * 7919L).toString) ++
      Seq("12345678950", "00000000000", "1234567895", "1234567895x")
    val got = ids.toDF("s").select(col("s"), Validators.tcknValid(col("s")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    ids.foreach { id => assert(got(id) == tcknRef(id), s"tckn $id") }
    // at least one constructed id must be valid for the test to mean anything
    assert(ids.exists(tcknRef))
  }

  test("taxNumValid matches reference checksum") {
    val ids = (0 until 500).map(i => (1000000000L + i * 104729L).toString)
    val got = ids.toDF("s").select(col("s"), Validators.taxNumValid(col("s")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    ids.foreach { id => assert(got(id) == taxRef(id), s"tax $id") }
    assert(ids.exists(taxRef))
  }

  test("emailValid accepts clean addresses and rejects reference violations") {
    val cases = Seq(
      "alice@example.org" -> true,
      "bob.smith@mail.com" -> true,
      "a@b.c" -> false,            // too short
      "noatsign.example.org" -> false,
      "two@@example.org" -> false, // bad char + two @
      "yok@example.org" -> false,  // placeholder prefix
      "x@.example.org" -> false,   // @.
      "Upper@example.org" -> false, // uppercase
      "türk@example.org" -> false, // turkish char
      "user@gamil.com" -> false,   // typo domain
      "user@example.co." -> false, // truncated tld
      "user@example.co" -> false,  // bare .co suffix (v3 endswith)
      "user@mail.gmail" -> false,  // bare 'gmail' suffix, no '@' anchor (v3)
      "user@mine.yahoo" -> false)  // bare 'yahoo' suffix (v3)
    val got = cases.map(_._1).toDF("e")
      .select(col("e"), Validators.emailValid(col("e")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (e, exp) => assert(got(e) == exp, s"email $e") }
  }

  /** The reference's e-mail rule union (home.py:476-563) re-stated
    * plainly: f1 forbidden chars, f2 length, f3 missing '@' (its
    * second clause — pandas `contains(".")` with regex semantics,
    * i.e. any-char — is implemented as a literal-dot requirement,
    * the one documented deviation), f4 multiple '@', f5 placeholder
    * prefixes, f6 bad shapes, v1/v2 Turkish/uppercase, v3 bad
    * suffixes + ingo@ prefix, v4 typo'd domains.
    */
  private def emailViolationRef(s: String): Boolean = {
    val f1 = s.exists("~`!#$%^&*()+={}[]|/:;\"'<>?,\\ ".contains(_))
    val f2 = s.length <= 6
    val f3 = !s.contains("@") || !s.contains(".")
    val f4 = s.count(_ == '@') > 1
    val f5 = Seq("@", "yok@", "YOK@", "www", "bbb@", "girilecek@", "deneme@",
      "Mailadresi@", "dummy@", "ingo@").exists(s.startsWith)
    val f6 = s.contains("@.") || s.contains(".@") || s.contains("@-")
    val v1v2 = s.exists(c => c.isUpper || "ıİçÇşŞğĞüÜöÖ".contains(c))
    val v3 = Seq("gmail", "yahoo", "hotmail", "msn", "@live", "yandex",
      "outlook", "windowslive", ".com.t", ".o", ".cm", ".co", ".ocom",
      ".ney", ".co.", ".cvom", ".comtr", ".com.", ".comom", ".c", ".r",
      ".com.tr'", ".com.tr/").exists(s.endsWith)
    val v4 = Seq("windowlive", "hotmil", "hatmail", "hotmial", "gamil",
      "gmmail", "outlok", "yaaho").exists(s.contains)
    f1 || f2 || f3 || f4 || f5 || f6 || v1v2 || v3 || v4
  }

  test("emailViolation matches the reference rule union on a generated corpus") {
    val locals = Seq("alice", "bob.smith", "yok", "deneme", "x", "türkan", "Carol", "ingo")
    val domains = Seq("example.org", "gmail.com", "gamil.com", "mail.co",
      "mail.co.", "x.cm", "d.net", "live", "mail.gmail", "y.yahoo", "z.com.t")
    val mutate = Seq[String => String](identity, _.replace("@", ""), "@" + _,
      _.toUpperCase, _.replace("@", "@@"), _.replace("@", "@."), _ + "/",
      _.replace(".", " "))
    val corpus = (for {
      l <- locals; d <- domains; m <- mutate
    } yield m(s"$l@$d")).distinct
    val got = corpus.toDF("e")
      .select(col("e"), Validators.emailViolation(col("e")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    corpus.foreach { e =>
      assert(got(e) == emailViolationRef(e), s"email <$e>")
    }
    // the corpus must exercise both outcomes
    assert(corpus.exists(emailViolationRef) && corpus.exists(!emailViolationRef(_)))
  }

  test("phoneValid accepts canonical mask, rejects dummy/letters/other masks") {
    val masks = Seq("99-999-999-9999", "9999999999")
    val cases = Seq(
      "25-989-741-2988" -> true,
      "5192837460"      -> true,  // bare 10-digit mask allowed
      "25 989 741 2988" -> false, // wrong separators
      "25-989-741-298"  -> false, // wrong length
      "1234567890"      -> false, // contains 12345 dummy sequence
      "5555559870"      -> false, // contains 555555 dummy run
      "2x-989-741-2988" -> false) // letter
    val got = cases.map(_._1).toDF("p")
      .select(col("p"), Validators.phoneValid(col("p"), masks).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (p, exp) => assert(got(p) == exp, s"phone $p") }
  }

  test("inDomain flags values outside the TR province list") {
    val got = Seq("Ankara", "Gotham", "İzmir").toDF("c")
      .select(col("c"), Validators.inDomain(col("c"), Validators.trProvinces).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("Ankara") && got("İzmir") && !got("Gotham"))
  }
}

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

  test("phoneProblemClass classifies the reference's dirty-format taxonomy, first match wins") {
    val cases = Seq(
      "5321234987"         -> null,       // proper format
      "05321234987"        -> "d111",     // 0 + 10 digits
      "532 1234987"        -> "d211",     // len 11, space at 3, no leading 0
      "532-1234987"        -> "d311",
      "905321234987"       -> "d112",     // 90 prefix, 12 digits
      "532 123 4987"       -> "d412",
      "0532-1234987"       -> "d612",
      "532123  4987"       -> "d1212",    // double space anywhere in 12 digits+spaces
      "(053)1234987"       -> "d1312",
      "532-123-49-87"      -> "d613",
      "905 321234987"      -> "d413",
      "+90 532 123 4987"   -> "d216",
      "+90 (532) 123 49 87" -> "d119",
      "0532123498"         -> "y10",      // len 10 starting 0
      "5321111111"         -> "dummy",    // 111111 fragment (len 10, no class)
      "53212"              -> "invalid",  // too short — but NOT dummy-first: '53212' has no dummy fragment
      "532123498a"         -> "invalid",  // letters
      "53283749166254398"  -> "others")   // len 17, no positional class, no dummy fragment
    val got = cases.map(_._1).toDF("p")
      .select(col("p"), Validators.phoneProblemClass(col("p")).as("cls"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (p, exp) => assert(got(p) == exp, s"phone <$p>") }
  }

  test("phoneValidTr = 10 digits, non-zero start, no dummy — complement of the taxonomy") {
    val cases = Seq(
      "5321234987" -> true,
      "0532123498" -> false, // leading zero
      "532123498"  -> false, // short
      "5321234 87" -> false, // separator
      "5324511111" -> true,  // five trailing 1s — one short of the 111111 dummy fragment
      "5321111119" -> false) // contains the 111111 dummy fragment
    val got = cases.map(_._1).toDF("p")
      .select(col("p"), Validators.phoneValidTr(col("p")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("5321234987"))
    assert(!got("0532123498") && !got("532123498") && !got("5321234 87") && !got("5321111119"))
    assert(got("5324511111")) // five consecutive 1s is NOT the 111111 dummy fragment
  }

  test("every trPhoneMasks regex is RE2-portable (no lookaround) and matches its own skeleton") {
    Validators.trPhoneMasks.foreach { case (id, m) =>
      val re = Validators.maskRegex(m)
      assert(!re.contains("(?"), s"$id regex must stay lookaround-free for oracle engines")
      // a witness value: replace # with 7, N with 5 — must match its own class regex
      val witness = m.replace('#', '7').replace('N', '5')
      assert(witness.matches(re), s"$id witness <$witness> !~ $re")
    }
  }

  test("inDomain flags values outside the TR province list") {
    val got = Seq("Ankara", "Gotham", "İzmir").toDF("c")
      .select(col("c"), Validators.inDomain(col("c"), Validators.trProvinces).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("Ankara") && got("İzmir") && !got("Gotham"))
  }

  test("luhn_valid: published test PANs pass, one-digit corruption fails, structure enforced") {
    import graft.functions.IntlChecksumExpr
    val got = Seq(
      "4532015112830366",    // valid Visa test number
      "4532015112830367",    // last digit corrupted
      "79927398713",         // 11 digits: Luhn-consistent but below PAN length
      "4532a15112830366",    // non-digit
      "453201511283036642",  // 18 digits, valid check
      ""                     // empty
    ).toDF("s").select(col("s"), IntlChecksumExpr.luhnValid(col("s")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("4532015112830366"))
    assert(!got("4532015112830367"))
    assert(!got("79927398713"))
    assert(!got("4532a15112830366"))
    assert(got("453201511283036642"))
    assert(!got(""))
  }

  test("iban_valid: ISO example IBANs pass, check-digit corruption and case errors fail") {
    import graft.functions.IntlChecksumExpr
    val got = Seq(
      "GB82WEST12345698765432",      // ISO 13616 example
      "DE89370400440532013000",      // Bundesbank example
      "TR330006100519786457841326",  // TR example
      "GB82WEST12345698765433",      // corrupted tail
      "gb82WEST12345698765432",      // lowercase country code
      "GBAAWEST12345698765432",      // letters where check digits expected
      "GB82WEST1234"                 // too short
    ).toDF("s").select(col("s"), IntlChecksumExpr.ibanValid(col("s")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("GB82WEST12345698765432"))
    assert(got("DE89370400440532013000"))
    assert(got("TR330006100519786457841326"))
    assert(!got("GB82WEST12345698765433"))
    assert(!got("gb82WEST12345698765432"))
    assert(!got("GBAAWEST12345698765432"))
    assert(!got("GB82WEST1234"))
  }

  test("luhn/iban register as SQL functions and run inside whole-stage codegen") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT luhn_valid('4532015112830366') AS l, iban_valid('DE89370400440532013000') AS i")
      .collect().head
    assert(r.getBoolean(0) && r.getBoolean(1))
    // null in -> null out (UnaryExpression null-safety)
    val n = spark.sql("SELECT luhn_valid(CAST(NULL AS STRING)) AS l").collect().head
    assert(n.isNullAt(0))
  }
}

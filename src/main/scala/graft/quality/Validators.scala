package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Format validators, each a pure `Column` expression (no UDFs): the
  * checksum arithmetic and regex rules compile into whole-stage
  * codegen and stay pushdown/prune-friendly at any scale.
  *
  * Reference behaviors: TRnoChecker.py:1-51 (TCKN + tax-number
  * checksums), home.py:476-563 (e-mail rules), home.py:603-1130
  * (phone format classes), home.py:579-601 (city domain).
  */
object Validators {

  /** TR national ID (TCKN) checksum (TRnoChecker.py:1-21):
    * 11 digits, first nonzero,
    * d10 == (7*(d1+d3+d5+d7+d9) - (d2+d4+d6+d8)) mod 10,
    * d11 == (d1+..+d10) mod 10.
    * Backed by the native [[graft.functions.TcknValid]] expression —
    * the pure-Column tree was so large that Janino compile time
    * dominated small scans.
    */
  def tcknValid(c: Column): Column =
    graft.functions.TrChecksumExpr.tcknValid(c.cast("string"))

  /** TR tax number checksum (TRnoChecker.py:24-48). For x in 0..8:
    * tmp1=(d[x]+(9-x))%10; tmp2=(tmp1*2^(9-x))%9, but 9 when tmp1!=0
    * and tmp2==0; check digit = (10 - total%10)%10 == d[9].
    * 11-digit inputs fall back to the TCKN rule (TRnoChecker.py:50-51).
    * Native expression, same rationale as [[tcknValid]].
    */
  def taxNumValid(c: Column): Column =
    graft.functions.TrChecksumExpr.taxNumValid(c.cast("string"))

  /** E-mail rules distilled from home.py:476-563 (union of f1-f6 +
    * v1-v4 filters): forbidden characters (f1), length <= 6 (f2),
    * missing '@' (f3), more than one '@' (f4 — together with f3 this
    * is `count('@') != 1`), placeholder prefixes (f5 + v3's ingo@),
    * '@.'/'.@'/'@-' shapes (f6), TLD-less/truncated/typo'd domain
    * suffixes (v3 — `endswith` on bare 'gmail'/'yahoo'/…/'.co', no
    * '@' anchor), typo'd domain substrings (v4), Turkish characters
    * (v1) and uppercase (v2). Returns true when the value violates
    * at least one rule.
    *
    * Intentional deviation: f3's second clause is
    * `~contains(".")` with pandas' regex semantics, where '.' matches
    * ANY character (so it only flags empty strings); here it requires
    * a literal dot, which is the evident intent and is implied anyway
    * for every value that survives the suffix rules.
    */
  def emailViolation(c: Column): Column = {
    val s = c.cast("string")
    val atCount = length(s) - length(regexp_replace(s, "@", ""))
    val badChars = s.rlike("""[~`!#$%^&*()+={}\[\]|/:;"'<>?,\\ ]""")
    val dummyPrefix = s.rlike("^(@|yok@|YOK@|www|bbb@|girilecek@|deneme@|Mailadresi@|dummy@|ingo@)")
    val badShape = s.rlike("""(@\.|\.@|@-)""")
    val badSuffix =
      s.rlike("""(gmail|yahoo|hotmail|msn|@live|yandex|outlook|windowslive)$""") ||
      s.rlike("""(\.com\.t|\.o|\.cm|\.co|\.ocom|\.ney|\.co\.|\.cvom|\.comtr|\.com\.|\.comom|\.c|\.r|\.com\.tr'|\.com\.tr/)$""")
    val typoDomain = s.rlike("(windowlive|hotmil|hatmail|hotmial|gamil|gmmail|outlok|yaaho)")
    val turkishOrUpper = s.rlike("[A-ZıİçÇşŞğĞüÜöÖ]")
    badChars || length(s) <= 6 || !s.contains("@") || !s.contains(".") ||
      atCount =!= 1 || dummyPrefix || badShape || badSuffix || typoDomain ||
      turkishOrUpper
  }

  def emailValid(c: Column): Column = c.isNotNull && !emailViolation(c)

  /** Digit-mask for phone classification: every digit -> 9,
    * separators kept (abstraction of home.py:603-1130's ~90
    * length+separator masks: each mask string IS one class).
    */
  def phoneMask(c: Column): Column = regexp_replace(c.cast("string"), "[0-9]", "9")

  /** Dummy/sequential fragments flagged by the reference
    * (home.py:1092-1099). Exposed as a raw pattern so oracle engines
    * can replay the same regex.
    */
  val phoneDummyPattern: String =
    "(000 00 00|111 11 11|222 22 22|333 33 33|444 44 44|555 55 55|666 66 66|777 77 77|888 88 88|999 99 99|000000|111111|222222|333333|444444|555555|666666|777777|888888|999999|12345|23456|34567|45678|56789|67890|09876|98765|87654|76543|65432|54321)"

  def phoneDummy(c: Column): Column = c.rlike(phoneDummyPattern)

  /** Phone validity against a set of allowed masks + dummy/letter
    * checks (home.py:603-1130 distilled: a value is in-format iff its
    * digit-mask is an allowed class and it carries no dummy sequence
    * or letters).
    */
  def phoneValid(c: Column, allowedMasks: Seq[String]): Column = {
    val s = c.cast("string")
    s.isNotNull && phoneMask(s).isin(allowedMasks: _*) && !phoneDummy(s) &&
      !s.rlike("[A-Za-z]")
  }

  /** The reference's full malformed-phone format taxonomy
    * (home.py:603-1087): 90 positional dirty-format classes, in the
    * reference's own concat order (which is also its
    * first-match-wins precedence, via drop_duplicates(keep='first')).
    * Mask language distilled from the pandas length+slice conditions:
    * `#` = any digit, `N` = any non-zero digit (the reference writes
    * "not startswith 0"), every other character literal. The one
    * class the positional language cannot express — d1212, "a double
    * space anywhere in a 12-char digits+spaces value" — is composed
    * explicitly in [[phoneProblemClass]] between d1112 and d1312,
    * where the reference orders it.
    */
  val trPhoneMasks: Seq[(String, String)] = Seq(
    "d111" -> "0##########",
    "d211" -> "N## #######",
    "d311" -> "N##-#######",
    "d411" -> "-##########",
    "d112" -> "90##########",
    "d212" -> "0-##########",
    "d312" -> "0### #######",
    "d412" -> "### ### ####",
    "d512" -> "###### ## ##",
    "d612" -> "0###-#######",
    "d712" -> "N## ####-###",
    "d812" -> "0 ##########",
    "d912" -> "0###### ####",
    "d1012" -> "0###/#######",
    "d1112" -> "-0##########",
    "d1312" -> "(###)#######",
    "d113" -> "### ### # ###",
    "d213" -> "### ###-##-##",
    "d313" -> "(###) #######",
    "d413" -> "90# #########",
    "d513" -> "### ###  ####",
    "d613" -> "###-###-##-##",
    "d713" -> "0## #### ####",
    "d813" -> "0###  #######",
    "d913" -> "### ### ## ##",
    "d1013" -> "0### ### ####",
    "d1113" -> "0###### ## ##",
    "d1213" -> "(0###)#######",
    "d1313" -> "###-### ## ##",
    "d1413" -> "0###- #######",
    "d1513" -> "###- ### ####",
    "d1613" -> "0###### # ###",
    "d1713" -> "0-###-#######",
    "d1813" -> "0 ### #######",
    "d1913" -> "0###) #######",
    "d114" -> "0### ### ## ##",
    "d214" -> "###) ### ## ##",
    "d314" -> "0 ### ### ####",
    "d414" -> "###  ### ## ##",
    "d514" -> "### ### ##  ##",
    "d614" -> "(###) ###-####",
    "d714" -> "(0###) #######",
    "d814" -> "0(###) #######",
    "d914" -> "90(###)#######",
    "d1014" -> "0### ####### /",
    "d1114" -> "0 (###)#######",
    "d1214" -> "(###)### ## ##",
    "d1314" -> "0###-### ## ##",
    "d1414" -> "0###-###-##-##",
    "d1514" -> "0###)### ## ##",
    "d1614" -> "(###) ### ####",
    "d1714" -> "0 ###### ## ##",
    "d1814" -> "0### # ## ####",
    "d1914" -> "0### ### # ###",
    "d2014" -> "0### ###-##-##",
    "d115" -> "0 ### #### ## #",
    "d215" -> "0 ### ### ## ##",
    "d315" -> "###  ### ##  ##",
    "d415" -> "0### ### ##  ##",
    "d515" -> "0(###) ### ####",
    "d615" -> "### / ### ## ##",
    "d715" -> "0 ### ## ## ###",
    "d815" -> "0###- ### ## ##",
    "d915" -> "0###  ### ## ##",
    "d1015" -> "0 (###) #######",
    "d1115" -> "(0###) ### ####",
    "d1215" -> "0-###-###-##-##",
    "d1315" -> "(###) ### ## ##",
    "d1415" -> "90 ### ### ####",
    "d1515" -> "0###) ### ## ##",
    "d1615" -> "0-### ### ## ##",
    "d1715" -> "0### ###  ## ##",
    "d1815" -> "0-###-### ## ##",
    "d116" -> "(0###) ### ## ##",
    "d216" -> "+90 ### ### ####",
    "d316" -> "0(###) ### ## ##",
    "d416" -> "0 ### ###  ## ##",
    "d516" -> "0  ### ### ## ##",
    "d616" -> "90)(###) #######",
    "d716" -> "0090 ### #######",
    "d816" -> "90 ### ### # ###",
    "d916" -> "90 ### ## ## ###",
    "d1016" -> "0 (###) ### ####",
    "d1116" -> "90 ### ### ## ##",
    "d1216" -> "0 ### ###  ## ##",
    "d117" -> "0 (###) ### ## ##",
    "d217" -> "(0 ###) ### ## ##",
    "d317" -> "+90 ### ### ## ##",
    "d118" -> "( 0### ) ### ## ##",
    "d119" -> "+90 (###) ### ## ##")

  /** Anchored regex for one mask. Portable subset: no lookaround, no
    * backreferences — the same pattern runs under java.util.regex
    * (Spark) and RE2 (DuckDB et al.), so oracles can replay classes
    * verbatim.
    */
  def maskRegex(mask: String): String =
    "^" + mask.map {
      case '#' => "[0-9]"
      case 'N' => "[1-9]"
      case ch if "\\^$.|?*+()[]{}".contains(ch) => "\\" + ch
      case ch => ch.toString
    }.mkString + "$"

  /** Problem-class of a phone value per the reference taxonomy:
    * first matching class id in the reference's concat order —
    * the 90 positional masks (d1212 composed in place), then the
    * length-10 bucket `y10` (leading zero or any separator), `dummy`
    * (sequential fragments), `invalid` (too short / letters), and
    * `others` (over-long leftovers). Null ⇔ no problem class claims
    * the value. One CaseWhen over cheap anchored regexes — scan-local
    * and codegen-friendly; each branch is a single rlike node, so the
    * expression stays far from the Janino blowups that motivated the
    * native checksum expressions.
    */
  def phoneProblemClass(c: Column): Column = {
    val s = c.cast("string")
    val (before, after) = trPhoneMasks.span(_._1 != "d1312")
    def maskBranches(ms: Seq[(String, String)]) =
      ms.map { case (id, m) => (s.rlike(maskRegex(m)), lit(id)) }
    val branches: Seq[(Column, Column)] =
      maskBranches(before) ++
        Seq((s.rlike("^[0-9 ]{12}$") && s.contains("  "), lit("d1212"))) ++
        maskBranches(after) ++
        Seq(
          (length(s) === 10 && (s.startsWith("0") || s.rlike("[-/() ]")), lit("y10")),
          (phoneDummy(s), lit("dummy")),
          (length(s) < 10 || s.rlike("[A-Za-z]"), lit("invalid")),
          (length(s) > 10, lit("others")))
    branches.tail.foldLeft(when(branches.head._1, branches.head._2)) {
      case (acc, (cond, v)) => acc.when(cond, v)
    }
  }

  /** Proper TR phone format distilled from the taxonomy's complement:
    * exactly 10 digits, non-zero first digit, no dummy fragment.
    * (The reference technically lets a length-10 value with exotic
    * non-separator characters through to "proper"; requiring all
    * digits is the evident intent.)
    */
  def phoneValidTr(c: Column): Column = {
    val s = c.cast("string")
    s.isNotNull && s.rlike("^[1-9][0-9]{9}$") && !phoneDummy(s)
  }

  /** Membership domain check (home.py:579-601 — TR city list). */
  def inDomain(c: Column, domain: Seq[String]): Column =
    c.isin(domain.map(_.asInstanceOf[Any]): _*)

  /** TR province list from the reference (home.py:580-598), exposed
    * as a ready-made domain.
    */
  val trProvinces: Seq[String] = Seq(
    "Adana", "Adıyaman", "Afyon", "Ağrı", "Amasya", "Ankara", "Antalya",
    "Artvin", "Aydın", "Balıkesir", "Bilecik", "Bingöl", "Bitlis", "Bolu",
    "Burdur", "Bursa", "Çanakkale", "Çankırı", "Çorum", "Denizli",
    "Diyarbakır", "Edirne", "Elazığ", "Erzincan", "Erzurum", "Eskişehir",
    "Gaziantep", "Giresun", "Gümüşhane", "Hakkari", "Hatay", "Isparta",
    "İçel", "İstanbul", "İstanbul-Avrupa", "İstanbul-Anadolu", "İzmir",
    "Kars", "Kastamonu", "Kayseri", "Kırklareli", "Kırşehir", "Kocaeli",
    "Konya", "Kütahya", "Malatya", "Manisa", "Kahramanmaraş", "Mardin",
    "Muğla", "Muş", "Nevşehir", "Niğde", "Ordu", "Rize", "Sakarya",
    "Samsun", "Siirt", "Sinop", "Sivas", "Tekirdağ", "Tokat", "Trabzon",
    "Tunceli", "Şanlıurfa", "Uşak", "Van", "Yozgat", "Zonguldak",
    "Aksaray", "Bayburt", "Karaman", "Kırıkkale", "Batman", "Şırnak",
    "Bartın", "Ardahan", "Iğdır", "Yalova", "Karabük", "Kilis",
    "Osmaniye", "Düzce")
}

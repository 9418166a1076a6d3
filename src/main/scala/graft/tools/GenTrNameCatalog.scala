package graft.tools

/** Build-time generator for a FULL-SIZE synthetic TR name→gender
  * dimension catalog (the reference ships a 12,826-entry data table —
  * `TR_name_gender.py:1-12826` — which we deliberately do NOT copy;
  * the repo's in-code seed stays a 32-entry paraphrase). This
  * generator produces a deterministic, realistically-distributed
  * stand-in at the same cardinality so the documented dim-file
  * contract (`Sources.readCsv` → `Enrich.genderFromTable`) is
  * exercised at real catalog scale. Real deployments drop in their
  * licensed catalog CSV; the contract — (name, gender) columns,
  * broadcast-joined on the first name token — is identical.
  *
  * Names are synthesized from Turkish-phonotactic syllables via a
  * mixed-radix decomposition of the row index (pure function — same
  * catalog every build, no RNG), gender assigned by suffix class the
  * way TR given names actually pattern (vowel-final + -gül/-nur/-su
  * endings lean female; consonant-final + -kan/-han/-er endings lean
  * male).
  */
object GenTrNameCatalog {

  private val onsets = Vector("b", "c", "d", "g", "h", "k", "l", "m",
    "n", "r", "s", "t", "v", "y", "z", "")
  private val vowels = Vector("a", "e", "i", "u")
  private val codas = Vector("", "n", "r", "l", "t", "s", "m", "k")
  private val femaleSuffix = Vector("e", "a", "gül", "nur", "su", "ay")
  private val maleSuffix = Vector("", "kan", "han", "er", "an", "tan")

  /** Deterministic (name, gender) rows; names unique by construction
    * (the tuple of radix digits is injective in the index and every
    * digit combination renders to a distinct string thanks to the
    * suffix separator classes).
    */
  def rows(n: Int): Seq[(String, String)] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = 0
    while (seen.size < n) {
      val female = i % 2 == 0
      var x = i / 2
      def next(radix: Int): Int = { val d = x % radix; x /= radix; d }
      val s1 = onsets(next(onsets.size)) + vowels(next(vowels.size)) +
        codas(next(codas.size))
      val s2 = onsets(next(onsets.size)) + vowels(next(vowels.size))
      val sfx =
        if (female) femaleSuffix(next(femaleSuffix.size))
        else maleSuffix(next(maleSuffix.size))
      val name = (s1 + s2 + sfx).capitalize
      // collisions across suffix classes are possible ("" suffix);
      // first writer wins, keeping one gender per name — the catalog
      // contract (lookup joins must not fan out)
      if (name.length >= 3 && !seen.contains(name))
        seen.put(name, if (female) "F" else "M")
      i += 1
    }
    seen.toSeq
  }

  /** Write the catalog as a `name,gender` CSV (header included) —
    * the exact file shape README's dim contract documents.
    */
  def writeCsv(path: String, n: Int = 12826): Unit = {
    val w = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(path),
        java.nio.charset.StandardCharsets.UTF_8))
    try {
      w.println("name,gender")
      rows(n).foreach { case (name, g) => w.println(s"$name,$g") }
    } finally w.close()
  }

  def main(args: Array[String]): Unit = {
    val path = if (args.length > 0) args(0) else "tr_name_gender_synth.csv"
    val n = if (args.length > 1) args(1).toInt else 12826
    writeCsv(path, n)
    println(s"wrote $path ($n rows)")
  }
}

package graft.analysis

/** Term normalization, stopping, stemming, and the full analyzer chain.
  *
  * Chain order mirrors the reference repository construction
  * (reference: src/Repository.cpp:137-177):
  *   Normalization → UTF8CaseNormalization → Stopper → Stemmer
  *
  * Critical semantics (reference: src/MemoryIndex.cpp:557-570,647):
  *  - a stopped or over-long term becomes a NULL slot but KEEPS its
  *    position and still counts toward document length;
  *  - document length = number of token positions (including nulls).
  */
object Normalizer {

  /** Remove '.' and '\'', ASCII-downcase, then map non-ASCII codepoints
    * through the reference's 893-entry case table
    * (reference: src/NormalizationTransformation.cpp:45-92 for the strip
    * + ASCII downcase, src/UTF8CaseNormalizationTransformation.cpp for
    * the table — chain order src/Repository.cpp:137-177).
    * Returns null when the token normalizes to empty.
    */
  def normalize(term: String): String = {
    if (term == null) return null
    var needs = false
    var hasHigh = false
    var i = 0
    val n = term.length
    while (i < n && !(needs && hasHigh)) {
      val c = term.charAt(i)
      if ((c >= 'A' && c <= 'Z') || c == '.' || c == '\'') needs = true
      if (c >= 0x80) { needs = true; hasHigh = true }
      i += 1
    }
    if (!needs) return if (n == 0) null else term
    val sb = new java.lang.StringBuilder(n)
    i = 0
    while (i < n) {
      val c = term.charAt(i)
      if (c != '.' && c != '\'') {
        if (c >= 'A' && c <= 'Z') sb.append((c + 32).toChar)
        else sb.append(c)
      }
      i += 1
    }
    if (sb.length == 0) return null
    if (!hasHigh) return sb.toString
    Utf8Case.downcase(sb.toString)
  }
}

/** The reference's UTF8 case-normalization table — applied per CODEPOINT
  * to terms containing any non-ASCII character; codepoints absent from
  * the table pass through UNCHANGED (reference:
  * src/UTF8CaseNormalizationTransformation.cpp caseMap, 893 pairs).
  *
  * This deliberately diverges from Unicode toLowerCase where the
  * reference does: capital dotted I (U+0130) → plain 'i' (no combining
  * dot), capital sigma → medial σ ALWAYS (no contextual final ς),
  * unmapped uppercase (U+1E9E ẞ, titlecase digraphs' lowercase forms,
  * ligatures) stay as-is. Golden-pinned against the compiled reference
  * transform by Utf8CaseSpec (tools/gen_utf8_case_golden.py).
  */
object Utf8Case {
  private val table: java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer](2048)
    val in = getClass.getResourceAsStream("/graft/utf8_case_map.tsv")
    require(in != null, "missing resource graft/utf8_case_map.tsv")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().foreach { line =>
      val t = line.indexOf('\t')
      if (t > 0)
        m.put(Integer.parseInt(line.substring(0, t), 16),
              Integer.parseInt(line.substring(t + 1), 16))
    } finally src.close()
    m
  }

  /** downcase one codepoint through the table (identity when absent) */
  def lower(cp: Int): Int = {
    val v = table.get(cp)
    if (v == null) cp else v.intValue()
  }

  /** per-codepoint table map (surrogate-aware — the table reaches the
    * Deseret block above the BMP)
    */
  def downcase(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(lower(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }
}

/** Stemmer SPI — the reference's StemmerFactory analogue
  * (reference: src/StemmerFactory.cpp).
  */
trait Stemmer extends Serializable {
  def name: String
  def stem(term: String): String
}

object NoStemmer extends Stemmer {
  val name = "none"
  def stem(term: String): String = term
}

/** Porter stemmer (reference: src/Porter_Stemmer.cpp; public algorithm,
  * Porter 1980). Standard implementation.
  */
object PorterStemmer extends Stemmer {
  val name = "porter"

  def stem(term: String): String = {
    if (term == null || term.length <= 2) return term
    // Porter operates on lowercase ASCII words only.
    var i = 0
    while (i < term.length) {
      val c = term.charAt(i)
      if (c < 'a' || c > 'z') return term
      i += 1
    }
    // headroom for the occasional appended 'e'
    val b = new Array[Char](term.length + 1)
    term.getChars(0, term.length, b, 0)
    var k = term.length - 1

    @inline def cons(idx: Int): Boolean = b(idx) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (idx == 0) true else !cons(idx - 1)
      case _ => true
    }
    // measure of the stem b[0..j]
    def m(j: Int): Int = {
      var n = 0; var idx = 0
      while (true) {
        if (idx > j) return n
        if (!cons(idx)) { // found vowel
          // skip vowels
          while (idx <= j && !cons(idx)) idx += 1
          if (idx > j) return n
          // skip consonants
          while (idx <= j && cons(idx)) idx += 1
          n += 1
        } else idx += 1
      }
      n
    }
    def vowelInStem(j: Int): Boolean = { var idx = 0; while (idx <= j) { if (!cons(idx)) return true; idx += 1 }; false }
    def doubleC(j: Int): Boolean = j >= 1 && b(j) == b(j - 1) && cons(j)
    def cvc(j: Int): Boolean = {
      if (j < 2 || !cons(j) || cons(j - 1) || !cons(j - 2)) false
      else b(j) != 'w' && b(j) != 'x' && b(j) != 'y'
    }
    def ends(s: String): Int = { // returns stem end j if suffix matches, else -1
      val l = s.length
      if (l > k + 1) return -1
      var idx = 0
      while (idx < l) { if (b(k - l + 1 + idx) != s.charAt(idx)) return -1; idx += 1 }
      k - l
    }
    def setTo(j: Int, s: String): Unit = {
      var idx = 0
      while (idx < s.length) { b(j + 1 + idx) = s.charAt(idx); idx += 1 }
      k = j + s.length
    }
    def r(j: Int, s: String): Unit = if (m(j) > 0) setTo(j, s)

    // Step 1a
    if (b(k) == 's') {
      var j = ends("sses"); if (j >= 0) k -= 2
      else { j = ends("ies"); if (j >= 0) setTo(j, "i")
      else if (k >= 1 && b(k - 1) != 's') k -= 1 }
    }
    // Step 1b
    val j1 = ends("eed")
    if (j1 >= 0) { if (m(j1) > 0) k -= 1 }
    else {
      var j = ends("ed")
      var matched = false
      if (j >= 0 && vowelInStem(j)) { k = j; matched = true }
      else { j = ends("ing"); if (j >= 0 && vowelInStem(j)) { k = j; matched = true } }
      if (matched) {
        if (ends("at") >= 0) { k += 1; b(k) = 'e' }        // conflat(ed) → conflate
        else if (ends("bl") >= 0) { k += 1; b(k) = 'e' }   // troubl(ed) → trouble
        else if (ends("iz") >= 0) { k += 1; b(k) = 'e' }   // siz(ed)    → size
        else if (doubleC(k)) { val ch = b(k); if (ch != 'l' && ch != 's' && ch != 'z') k -= 1 }
        else if (m(k) == 1 && cvc(k)) { k += 1; b(k) = 'e' }
      }
    }
    // Step 1c
    if (b(k) == 'y' && vowelInStem(k - 1)) b(k) = 'i'
    // Step 2
    if (k >= 1) (b(k - 1)) match {
      case 'a' => { val j = ends("ational"); if (j >= 0) r(j, "ate") else { val j2 = ends("tional"); if (j2 >= 0) r(j2, "tion") } }
      case 'c' => { val j = ends("enci"); if (j >= 0) r(j, "ence") else { val j2 = ends("anci"); if (j2 >= 0) r(j2, "ance") } }
      case 'e' => { val j = ends("izer"); if (j >= 0) r(j, "ize") }
      case 'l' => { var j = ends("bli"); if (j >= 0) r(j, "ble") else { j = ends("alli"); if (j >= 0) r(j, "al") else { j = ends("entli"); if (j >= 0) r(j, "ent") else { j = ends("eli"); if (j >= 0) r(j, "e") else { j = ends("ousli"); if (j >= 0) r(j, "ous") } } } } }
      case 'o' => { var j = ends("ization"); if (j >= 0) r(j, "ize") else { j = ends("ation"); if (j >= 0) r(j, "ate") else { j = ends("ator"); if (j >= 0) r(j, "ate") } } }
      case 's' => { var j = ends("alism"); if (j >= 0) r(j, "al") else { j = ends("iveness"); if (j >= 0) r(j, "ive") else { j = ends("fulness"); if (j >= 0) r(j, "ful") else { j = ends("ousness"); if (j >= 0) r(j, "ous") } } } }
      case 't' => { var j = ends("aliti"); if (j >= 0) r(j, "al") else { j = ends("iviti"); if (j >= 0) r(j, "ive") else { j = ends("biliti"); if (j >= 0) r(j, "ble") } } }
      case 'g' => { val j = ends("logi"); if (j >= 0) r(j, "log") }
      case _ =>
    }
    // Step 3
    (b(k)) match {
      case 'e' => { var j = ends("icate"); if (j >= 0) r(j, "ic") else { j = ends("ative"); if (j >= 0) r(j, "") else { j = ends("alize"); if (j >= 0) r(j, "al") } } }
      case 'i' => { val j = ends("iciti"); if (j >= 0) r(j, "ic") }
      case 'l' => { var j = ends("ical"); if (j >= 0) r(j, "ic") else { j = ends("ful"); if (j >= 0) r(j, "") } }
      case 's' => { val j = ends("ness"); if (j >= 0) r(j, "") }
      case _ =>
    }
    // Step 4
    if (k >= 1) {
      var j = -1
      (b(k - 1)) match {
        case 'a' => j = ends("al")
        case 'c' => { j = ends("ance"); if (j < 0) j = ends("ence") }
        case 'e' => j = ends("er")
        case 'i' => j = ends("ic")
        case 'l' => { j = ends("able"); if (j < 0) j = ends("ible") }
        case 'n' => { j = ends("ant"); if (j < 0) j = ends("ement"); if (j < 0) j = ends("ment"); if (j < 0) j = ends("ent") }
        case 'o' => { j = ends("ion"); if (j >= 0 && !(b(j) == 's' || b(j) == 't')) j = -1; if (j < 0) j = ends("ou") }
        case 's' => j = ends("ism")
        case 't' => { j = ends("ate"); if (j < 0) j = ends("iti") }
        case 'u' => j = ends("ous")
        case 'v' => j = ends("ive")
        case 'z' => j = ends("ize")
        case _ =>
      }
      if (j >= 0 && m(j) > 1) k = j
    }
    // Step 5a
    if (b(k) == 'e') {
      val a = m(k - 1)
      if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
    }
    // Step 5b
    if (b(k) == 'l' && doubleC(k) && m(k - 1) > 1) k -= 1

    new String(b, 0, k + 1)
  }
}

/** Krovetz stemmer — full port of the reference algorithm AND its
  * head-word dictionary (reference: src/KrovetzStemmer.cpp, the public
  * kstem algorithm from Krovetz, "Viewing Morphology as an Inference
  * Process", SIGIR'93). The dictionary (27,797 head words, 216 direct
  * conflations, 41 exception words — the reference's hard-coded tables,
  * src/KrovetzStemmer.cpp:1146-6806, originally head_word_list.txt /
  * dict_supplement.txt / direct_conflations.txt / country_nationality
  * .txt / exception_words.txt) ships as classpath resources; load order
  * and first-entry-wins duplicate handling mirror loadTables()
  * (src/KrovetzStemmer.cpp:6820-6832).
  *
  * Control flow mirrors kstem_stem_tobuffer (src/KrovetzStemmer.cpp:
  * 1025-1102): dictionary lookup between every rule step, each step's
  * candidate sequence identical to the reference (incl. the exception
  * gates in past_tense/aspect and the buffer-restore defaults). Words
  * ≤2 or ≥25 chars or with non-[a-zA-Z] chars are lowercased only.
  * KrovetzSpec pins equivalence against golden vectors generated from
  * the reference implementation itself.
  */
object KrovetzStemmer extends Stemmer {
  val name = "krovetz"
  private val MaxWordLength = 25

  private final class DictEntry(val root: String, val exception: Boolean)

  private val dict: java.util.HashMap[String, DictEntry] = {
    val m = new java.util.HashMap[String, DictEntry](1 << 16)
    def lines(res: String): Iterator[String] = {
      val in = getClass.getResourceAsStream(res)
      require(in != null, s"missing resource $res")
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty)
    }
    // loadTables() order; duplicates keep the FIRST entry
    lines("/graft/kstem_exceptions.txt")
      .foreach(w => m.putIfAbsent(w, new DictEntry("", true)))
    lines("/graft/kstem_headwords.txt")
      .foreach(w => m.putIfAbsent(w, new DictEntry("", false)))
    lines("/graft/kstem_conflations.txt").foreach { ln =>
      val t = ln.indexOf('\t')
      m.putIfAbsent(ln.substring(0, t), new DictEntry(ln.substring(t + 1), false))
    }
    m
  }

  // getdep: null for words of length <= 1 (reference :106-116)
  @inline private def dep(w: String): DictEntry =
    if (w.length <= 1) null else dict.get(w)
  @inline private def found(w: String): Boolean = dep(w) != null

  /** y is a consonant at position 0 or after a vowel (reference cons()) */
  private def cons(w: String, i: Int): Boolean = {
    val ch = w.charAt(i)
    if (ch == 'a' || ch == 'e' || ch == 'i' || ch == 'o' || ch == 'u') false
    else if (ch != 'y' || i == 0) true
    else {
      val p = w.charAt(i - 1)
      p == 'a' || p == 'e' || p == 'i' || p == 'o' || p == 'u'
    }
  }
  @inline private def vowel(w: String, i: Int): Boolean = !cons(w, i)
  private def vowelInStem(w: String, j: Int): Boolean = {
    var i = 0
    while (i <= j) { if (vowel(w, i)) return true; i += 1 }
    false
  }
  @inline private def doublec(w: String, i: Int): Boolean =
    i >= 1 && w.charAt(i) == w.charAt(i - 1) && cons(w, i)

  /** ends(): the suffix must be PROPER (sufflength <= k = len-1);
    * returns j = index before the suffix, or -1
    */
  @inline private def endsIn(w: String, s: String): Int =
    if (s.length > w.length - 1 || !w.endsWith(s)) -1
    else w.length - s.length - 1

  private def plural(w: String): String = {
    val n = w.length
    if (w.charAt(n - 1) != 's') return w
    val jIes = endsIn(w, "ies")
    if (jIes >= 0) {
      val c = w.substring(0, n - 1) // calories -> calorie
      if (found(c)) return c
      return w.substring(0, jIes + 1) + "y"
    }
    val jEs = endsIn(w, "es")
    if (jEs >= 0) {
      // remove just the s — but never leave a double-s root (crosses)
      val c1 = w.substring(0, n - 1)
      if (found(c1) && jEs > 0 &&
          !(w.charAt(jEs) == 's' && w.charAt(jEs - 1) == 's')) return c1
      val c2 = w.substring(0, n - 2)
      if (found(c2)) return c2
      return c1 // default: retain the e
    }
    if (n > 3 && w.charAt(n - 2) != 's' && endsIn(w, "ous") < 0)
      return w.substring(0, n - 1)
    w
  }

  private def pastTense(w: String): String = {
    val n = w.length
    if (n <= 4) return w // direct mapping handles fled etc.
    val jIed = endsIn(w, "ied")
    if (jIed >= 0) {
      val c = w.substring(0, n - 1)
      if (found(c)) return c
      return w.substring(0, jIed + 1) + "y"
    }
    val jEd = endsIn(w, "ed")
    if (jEd >= 0 && vowelInStem(w, jEd)) {
      val c1 = w.substring(0, n - 1) // root ends in e
      val d1 = dep(c1)
      if (d1 != null && !d1.exception) return c1
      val c2 = w.substring(0, n - 2)
      if (found(c2)) return c2
      if (doublec(w, n - 3)) {
        val c3 = w.substring(0, n - 3)
        if (found(c3)) return c3
        return c2 // default: leave doubled (backfilled -> backfill)
      }
      if (w.charAt(0) == 'u' && w.charAt(1) == 'n') return w
      return c1 // prefer ending with e (microcoded -> microcode)
    }
    w
  }

  private def aspect(w: String): String = {
    val n = w.length
    if (n <= 5) return w // direct mapping handles aging etc.
    val j = endsIn(w, "ing")
    if (j >= 0 && vowelInStem(w, j)) {
      val c1 = w.substring(0, j + 1) + "e"
      val d1 = dep(c1)
      if (d1 != null && !d1.exception) return c1
      val c2 = w.substring(0, j + 1)
      if (found(c2)) return c2
      if (doublec(w, j)) {
        val c3 = w.substring(0, j)
        if (found(c3)) return c3
        return c2 // default: leave doubled (fingerspelling -> fingerspell)
      }
      if (j > 0 && cons(w, j) && cons(w, j - 1)) return c2
      return c1 // default add e unless double consonant (microcoding)
    }
    w
  }

  private def ityEndings(w: String): String = {
    val j = endsIn(w, "ity")
    if (j < 0) return w
    val c1 = w.substring(0, j + 1)
    if (found(c1)) return c1
    val c2 = c1 + "e"
    if (found(c2)) return c2
    if (j > 0 && w.charAt(j - 1) == 'i' && w.charAt(j) == 'l')
      return w.substring(0, j - 1) + "le" // -ability/-ibility -> -ble
    if (j > 0 && w.charAt(j - 1) == 'i' && w.charAt(j) == 'v')
      return c2 // -ivity -> -ive
    if (j > 0 && w.charAt(j - 1) == 'a' && w.charAt(j) == 'l')
      return c1 // -ality: remove -ity
    if (found(w)) return w // immunity stays if immune absent
    c1
  }

  private def nessEndings(w: String): String = {
    val j = endsIn(w, "ness")
    if (j < 0) return w
    if (w.charAt(j) == 'i') w.substring(0, j) + "y" else w.substring(0, j + 1)
  }

  private def ionEndings(w: String): String = {
    var j = endsIn(w, "ization")
    if (j >= 0) return w.substring(0, j + 3) + "e" // -ize, always
    j = endsIn(w, "ition")
    if (j >= 0) {
      val c = w.substring(0, j + 1) + "e" // definition -> define
      if (found(c)) return c
    }
    j = endsIn(w, "ation")
    if (j >= 0) {
      val c1 = w.substring(0, j + 3) + "e" // elimination -> eliminate
      if (found(c1)) return c1
      val c2 = w.substring(0, j + 1) + "e" // allegation -> allege
      if (found(c2)) return c2
      val c3 = w.substring(0, j + 1) // resignation -> resign
      if (found(c3)) return c3
    }
    j = endsIn(w, "ication")
    if (j >= 0) {
      val c = w.substring(0, j + 1) + "y" // amplification -> amplify
      if (found(c)) return c
    }
    j = endsIn(w, "ion")
    if (j >= 0) {
      val c1 = w.substring(0, j + 1) + "e"
      if (found(c1)) return c1
      val c2 = w.substring(0, j + 1)
      if (found(c2)) return c2
    }
    w
  }

  private def erOrEndings(w: String): String = {
    val n = w.length
    var j = endsIn(w, "izer")
    if (j >= 0) return w.substring(0, n - 1) // -ize, always
    j = endsIn(w, "er"); if (j < 0) j = endsIn(w, "or")
    if (j >= 0) {
      if (doublec(w, j)) {
        val c = w.substring(0, j)
        if (found(c)) return c
      }
      if (w.charAt(j) == 'i') { // -ier
        val c = w.substring(0, j) + "y"
        if (found(c)) return c
      }
      if (w.charAt(j) == 'e') { // -eer
        val c = w.substring(0, j)
        if (found(c)) return c
      }
      val c1 = w.substring(0, j + 2) // remove the r
      if (found(c1)) return c1
      val c2 = w.substring(0, j + 1) // remove -er/-or
      if (found(c2)) return c2
      val c3 = c2 + "e" // -or -> -e
      if (found(c3)) return c3
    }
    w
  }

  private def lyEndings(w: String): String = {
    val n = w.length
    val j = endsIn(w, "ly")
    if (j < 0) return w
    val le = w.substring(0, n - 1) + "e" // -ly -> -le
    if (found(le)) return le
    val c1 = w.substring(0, j + 1)
    if (found(c1)) return c1
    if (j > 0 && w.charAt(j - 1) == 'a' && w.charAt(j) == 'l')
      return c1 // -ally -> -al, always
    if (j > 0 && w.charAt(j - 1) == 'a' && w.charAt(j) == 'b')
      return le // -ably -> -able, always
    if (w.charAt(j) == 'i') { // militarily -> military
      val c = w.substring(0, j) + "y"
      if (found(c)) return c
    }
    c1 // default: remove -ly
  }

  private def alEndings(w: String): String = {
    val j = endsIn(w, "al")
    if (j < 0) return w
    val c1 = w.substring(0, j + 1)
    if (found(c1)) return c1
    if (doublec(w, j)) {
      val c = w.substring(0, j)
      if (found(c)) return c
    }
    val c2 = c1 + "e"
    if (found(c2)) return c2
    val c3 = c1 + "um" // optimal -> optimum
    if (found(c3)) return c3
    if (j > 0 && w.charAt(j - 1) == 'i' && w.charAt(j) == 'c') {
      val c4 = w.substring(0, j - 1) // remove -ical
      if (found(c4)) return c4
      val c5 = c4 + "y" // bibliographical -> bibliography
      if (found(c5)) return c5
      return c1 // default: -ical -> -ic
    }
    if (w.charAt(j) == 'i') { // -ial
      val c = w.substring(0, j)
      if (found(c)) return c
    }
    w
  }

  private def iveEndings(w: String): String = {
    val n = w.length
    val j = endsIn(w, "ive")
    if (j < 0) return w
    val c1 = w.substring(0, j + 1)
    if (found(c1)) return c1
    val c2 = c1 + "e"
    if (found(c2)) return c2
    if (j > 0 && w.charAt(j - 1) == 'a' && w.charAt(j) == 't') {
      val c3 = w.substring(0, j - 1) + "e" // determinative -> determine
      if (found(c3)) return c3
      val c4 = w.substring(0, j - 1)
      if (found(c4)) return c4
    }
    val c5 = w.substring(0, n - 2) + "on" // injunctive -> injunction
    if (found(c5)) return c5
    w
  }

  private def izeEndings(w: String): String = {
    val j = endsIn(w, "ize")
    if (j < 0) return w
    val c1 = w.substring(0, j + 1)
    if (found(c1)) return c1
    if (doublec(w, j)) {
      val c = w.substring(0, j)
      if (found(c)) return c
    }
    val c2 = c1 + "e"
    if (found(c2)) return c2
    w
  }

  private def mentEndings(w: String): String = {
    val j = endsIn(w, "ment")
    if (j < 0) return w
    val c = w.substring(0, j + 1)
    if (found(c)) return c
    w
  }

  private def bleEndings(w: String): String = {
    val j = endsIn(w, "ble")
    if (j < 0) return w
    if (w.charAt(j) != 'a' && w.charAt(j) != 'i') return w
    val c1 = w.substring(0, j)
    if (found(c1)) return c1
    if (doublec(w, j - 1)) {
      val c = w.substring(0, j - 1)
      if (found(c)) return c
    }
    val c2 = c1 + "e"
    if (found(c2)) return c2
    val c3 = c1 + "ate" // compensable -> compensate
    if (found(c3)) return c3
    w
  }

  private def ismEndings(w: String): String = {
    val j = endsIn(w, "ism")
    if (j < 0) w else w.substring(0, j + 1) // productive: just accept
  }

  private def icEndings(w: String): String = {
    val j = endsIn(w, "ic")
    if (j < 0) return w
    val c1 = w + "al" // canonic -> canonical (the one EXPANDING rule)
    if (found(c1)) return c1
    val c2 = w.substring(0, j + 1) + "y"
    if (found(c2)) return c2
    val c3 = w.substring(0, j + 1) + "e"
    if (found(c3)) return c3
    val c4 = w.substring(0, j + 1)
    if (found(c4)) return c4
    w
  }

  private def ncyEndings(w: String): String = {
    val j = endsIn(w, "ncy")
    if (j < 0) return w
    if (w.charAt(j) != 'e' && w.charAt(j) != 'a') return w
    val c1 = w.substring(0, j + 2) + "t" // constituency -> constituent
    if (found(c1)) return c1
    w.substring(0, j + 2) + "ce" // default: -nce
  }

  private def nceEndings(w: String): String = {
    val j = endsIn(w, "nce")
    if (j < 0) return w
    if (w.charAt(j) != 'e' && w.charAt(j) != 'a') return w
    val c1 = w.substring(0, j) + "e" // adherance -> adhere
    if (found(c1)) return c1
    val c2 = w.substring(0, j) // disappearance -> disappear
    if (found(c2)) return c2
    w
  }

  @inline private def isAsciiAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  def stem(term: String): String = {
    if (term == null) return term
    val n = term.length
    // too short/long or not all-alphabetic: lowercase copy only
    if (n <= 2 || n >= MaxWordLength || !term.forall(isAsciiAlpha))
      return term.toLowerCase
    var w = term.toLowerCase
    // dictionary check between every step (longings -> longing, not long)
    var d = dep(w)
    if (d == null) { w = plural(w); d = dep(w) }
    if (d == null) { w = pastTense(w); d = dep(w) }
    if (d == null) { w = aspect(w); d = dep(w) }
    if (d == null) { w = ityEndings(w); d = dep(w) }
    if (d == null) { w = nessEndings(w); d = dep(w) }
    if (d == null) { w = ionEndings(w); d = dep(w) }
    if (d == null) { w = erOrEndings(w); d = dep(w) }
    if (d == null) { w = lyEndings(w); d = dep(w) }
    if (d == null) { w = alEndings(w); d = dep(w) }
    if (d == null) { w = iveEndings(w); d = dep(w) }
    if (d == null) { w = izeEndings(w); d = dep(w) }
    if (d == null) { w = mentEndings(w); d = dep(w) }
    if (d == null) { w = bleEndings(w); d = dep(w) }
    if (d == null) { w = ismEndings(w); d = dep(w) }
    if (d == null) { w = icEndings(w); d = dep(w) }
    if (d == null) { w = ncyEndings(w); d = dep(w) }
    if (d == null) { w = nceEndings(w); d = dep(w) }
    // direct mapping (italian -> italy, and via plural: italians -> italy)
    if (d != null && d.root.nonEmpty) d.root else w
  }
}

/** Arabic light10 stemmer (reference: src/Arabic_Stemmer_utf8.cpp,
  * arabic_light10_unicode — the published Larkey/Ballesteros/Connell
  * light10 algorithm):
  *  1. norm2: keep the 47-char Arabic working set (identity except
  *     آ/أ/إ→ا, ة→ه, ى→ي); DROP all other chars in U+0600..U+06FF
  *     (diacritics, tatweel, …); pass non-Arabic chars through;
  *  2. strip one leading waw (و) when >3 chars remain before it;
  *  3. strip ONE definite article of {ال وال بال كال فال لل} when the
  *     remainder keeps ≥2 chars;
  *  4. if >2 chars remain, strip each suffix of
  *     {ها ان ات ون ين يه ية ه ة ي} in list order (each once, remainder
  *     must keep ≥2 chars).
  */
object ArabicStemmer extends Stemmer {
  val name = "arabic"
  private val RangeLow = 0x0600
  private val RangeHigh = 0x06FF
  /** the reference's allArabicChars → normChars transition table */
  private val Kept: Map[Char, Char] = {
    val identity = Seq(
      0x067E, 0x0679, 0x0686, 0x0698, 0x0688, 0x06AF, 0x06A9, 0x0691,
      0x06BA, 0x06BE, 0x06C1, 0x0621, 0x0624, 0x0626, 0x0627, 0x0628,
      0x062A, 0x062B, 0x062C, 0x062D, 0x062E, 0x062F, 0x0630, 0x0631,
      0x0632, 0x0633, 0x0634, 0x0635, 0x0636, 0x0637, 0x0638, 0x0639,
      0x063A, 0x0641, 0x0642, 0x0643, 0x0644, 0x0645, 0x0646, 0x0647,
      0x0648, 0x064A).map(c => c.toChar -> c.toChar)
    val mapped = Seq(
      0x0622 -> 0x0627, 0x0623 -> 0x0627, 0x0625 -> 0x0627, // alef forms → ا
      0x0629 -> 0x0647,                                     // ة → ه
      0x0649 -> 0x064A                                      // ى → ي
    ).map { case (a, b) => a.toChar -> b.toChar }
    (identity ++ mapped).toMap
  }
  private val Waw = '\u0648'
  // {ال, وال, بال, كال, فال, لل} in the reference's probe order
  private val Articles = Seq(
    "\u0627\u0644", "\u0648\u0627\u0644", "\u0628\u0627\u0644",
    "\u0643\u0627\u0644", "\u0641\u0627\u0644", "\u0644\u0644")
  // {ها, ان, ات, ون, ين, يه, ية, ه, ة, ي} in the reference's list order
  private val Suffixes = Seq(
    "\u0647\u0627", "\u0627\u0646", "\u0627\u062A", "\u0648\u0646",
    "\u064A\u0646", "\u064A\u0647", "\u064A\u0629", "\u0647",
    "\u0629", "\u064A")

  def stem(term: String): String = {
    if (term == null || term.isEmpty) return term
    // norm2
    val sb = new java.lang.StringBuilder(term.length)
    var i = 0
    while (i < term.length) {
      val c = term.charAt(i)
      if (c < RangeLow || c > RangeHigh) sb.append(c)
      else Kept.get(c).foreach(sb.append(_))
      i += 1
    }
    var w = sb.toString
    // leading waw
    if (w.length > 3 && w.charAt(0) == Waw) w = w.substring(1)
    // one definite article (first match in table order)
    Articles.find(a => w.length > a.length + 1 && w.startsWith(a))
      .foreach(a => w = w.substring(a.length))
    // small suffix list, each checked once in order (lenlimit = 1)
    if (w.length > 2) {
      var k = 0
      while (k < Suffixes.length) {
        val suf = Suffixes(k)
        if (w.length > suf.length + 1 && w.endsWith(suf))
          w = w.substring(0, w.length - suf.length)
        k += 1
      }
    }
    // a word of only dropped in-range chars (diacritics, tatweel,
    // 0x63B-0x63F) stems to the EMPTY string — the reference keeps it
    // (Arabic_Stemmer_utf8 norm2 writes nothing) and the indexer then
    // nulls the slot; Analyzer.analyze applies that null-out
    w
  }
}

object Stemmers {
  def byName(name: String): Stemmer = name match {
    case "none" | null | "" => NoStemmer
    case "porter" => PorterStemmer
    case "krovetz" => KrovetzStemmer
    case "arabic" | "arabic_stem" | "light10" => ArabicStemmer
    case other => throw new IllegalArgumentException(s"unknown stemmer: $other")
  }
}

/** Full analyzer chain. `analyze` returns one slot per token position;
  * a null slot = stopped / over-long / normalized-to-empty term whose
  * position still counts toward document length
  * (reference: src/MemoryIndex.cpp:557-570,647).
  *
  * `mode`:
  *  - "indri": full reference tokenizer rules (flagship engine path)
  *  - "simple": lowercase [a-z0-9]+ runs — expressible identically in
  *    DuckDB (`regexp_extract_all(lower(text),'[a-z0-9]+')`) for the
  *    driver's SQL oracle.
  */
object Analyzer {
  /** In-band "already stemmed" marker on a QUERY term: [[Analyzer.processTerm]]
    * strips it and returns the rest verbatim. The document tokenizers never
    * emit control characters, so the marker cannot collide with corpus terms.
    */
  final val StemmedMarker = '\u0001'
}

final case class Analyzer(
    mode: String = "indri",
    stopwords: Set[String] = Set.empty,
    stemmer: Stemmer = NoStemmer,
    normalize: Boolean = true
) extends Serializable {

  /** `<normalize>false</normalize>` drops the whole normalization step —
    * dot/apostrophe removal AND case folding (reference:
    * src/Repository.cpp:144-149 skips both NormalizationTransformation
    * and UTF8CaseNormalizationTransformation). Length capping, stopping
    * and stemming still apply, and empty tokens still null out.
    */
  private def normalized(term: String): String =
    if (normalize) Normalizer.normalize(term)
    else if (term == null || term.isEmpty) null
    else term

  /** Max indexable term length (reference: src/MemoryIndex.cpp:566-570,
    * Keyfile MAX_KEY_LENGTH=512 ⇒ terms with length ≥ 511 are nulled).
    */
  val maxTermLength: Int = 510

  /** One entry per position; null = unindexed slot (still counts). */
  def analyze(text: String): Array[String] = {
    val raw = mode match {
      case "simple" => simpleTokens(text)
      case _ => Tokenizer.tokenize(text)
    }
    val out = new Array[String](raw.length)
    var i = 0
    while (i < raw.length) {
      var t = normalized(raw(i))
      if (t != null && t.length > maxTermLength) t = null
      if (t != null && stopwords.contains(t)) t = null
      if (t != null) t = stemmer.stem(t)
      // a stem can come back EMPTY (Arabic norm2 drops diacritic/tatweel
      // words) — the indexer nulls zero-length words like the reference
      // (src/MemoryIndex.cpp:557-570), position still counts
      if (t != null && t.isEmpty) t = null
      out(i) = t
      i += 1
    }
    out
  }

  /** analyze() plus tag (field) extents in token-position space.
    * "simple" mode has no markup semantics → no tag events (fields can
    * still be injected by annotators, the OffsetAnnotationAnnotator
    * analogue — reference: src/OffsetAnnotationAnnotator.cpp).
    */
  def analyzeWithFields(text: String): (Array[String], Array[TagExtent]) = {
    mode match {
      case "simple" => (analyze(text), Array.empty[TagExtent])
      case _ =>
        val (raw, tags) = Tokenizer.tokenizeWithTags(text)
        val out = new Array[String](raw.length)
        var i = 0
        while (i < raw.length) {
          var t = normalized(raw(i))
          if (t != null && t.length > maxTermLength) t = null
          if (t != null && stopwords.contains(t)) t = null
          if (t != null) t = stemmer.stem(t)
          if (t != null && t.isEmpty) t = null // empty stems null out
          out(i) = t
          i += 1
        }
        (out, tags)
    }
  }

  /** Raw (pre-normalization) tokens in the same position space as
    * `analyze` — for snippet rendering.
    */
  def rawTokens(text: String): Array[String] = mode match {
    case "simple" => simpleTokens(text)
    case _ => Tokenizer.tokenize(text)
  }

  /** Query-side term processing — same chain as indexing
    * (reference: Repository::processTerm, src/Repository.cpp:1087-1113).
    * Returns null for terms that stop out / normalize to empty.
    *
    * A leading [[Analyzer.StemmedMarker]] is the in-band analogue of the
    * reference's `IndexTerm::setStemmed(true)`: quoted query terms
    * (`"t"`) and `#base64quote(...)` are looked up VERBATIM, skipping
    * normalization, stopping and stemming alike (reference:
    * src/indrilang.g:967-983, src/InferenceNetworkBuilder.cpp:110-113).
    */
  def processTerm(term: String): String = {
    if (term != null && term.nonEmpty && term.charAt(0) == Analyzer.StemmedMarker)
      return term.substring(1)
    var t = normalized(term)
    if (t != null && t.length > maxTermLength) t = null
    if (t != null && stopwords.contains(t)) t = null
    if (t != null) t = stemmer.stem(t)
    if (t != null && t.isEmpty) t = null // empty stems null out
    t
  }

  /** Char span [begin, end) of every raw token slot — one entry per
    * position of analyze(text), in this analyzer's token space. The
    * ParsedDocument.positions analogue the offset-annotation converter
    * needs (reference: include/indri/ParsedDocument.hpp:40).
    */
  def tokenOffsets(text: String): (Array[Int], Array[Int]) = mode match {
    case "simple" =>
      if (text == null) return (Array.empty, Array.empty)
      val bs = scala.collection.mutable.ArrayBuffer.empty[Int]
      val es = scala.collection.mutable.ArrayBuffer.empty[Int]
      val n = text.length
      var i = 0
      while (i < n) {
        if (isTok(lower(text.charAt(i)))) {
          val st = i
          while (i < n && isTok(lower(text.charAt(i)))) i += 1
          bs += st; es += i
        } else i += 1
      }
      (bs.toArray, es.toArray)
    case _ =>
      val (_, b, e) = Tokenizer.tokenizeWithOffsets(text)
      (b, e)
  }

  private def simpleTokens(text: String): Array[String] = {
    if (text == null) return Array.empty
    val out = new ArrayBufferCompat
    val n = text.length
    var i = 0
    while (i < n) {
      val c = lower(text.charAt(i))
      if (isTok(c)) {
        val st = i
        val sb = new java.lang.StringBuilder
        while (i < n && isTok(lower(text.charAt(i)))) { sb.append(lower(text.charAt(i))); i += 1 }
        out += sb.toString
      } else i += 1
    }
    out.result()
  }
  @inline private def lower(c: Char): Char = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
  @inline private def isTok(c: Char): Boolean = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
}

/** Tiny growable String buffer avoiding scala collection overhead in the
  * per-row hot path.
  */
final class ArrayBufferCompat {
  private var arr = new Array[String](16)
  private var n = 0
  def +=(s: String): Unit = {
    if (n == arr.length) { val na = new Array[String](n * 2); System.arraycopy(arr, 0, na, 0, n); arr = na }
    arr(n) = s; n += 1
  }
  def result(): Array[String] = java.util.Arrays.copyOf(arr, n)
}

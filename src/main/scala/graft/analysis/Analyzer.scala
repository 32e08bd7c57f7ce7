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

  /** Remove '.' and '\'' then lowercase
    * (reference: src/NormalizationTransformation.cpp:45-92 for ASCII,
    * src/UTF8CaseNormalizationTransformation.cpp for the rest).
    * Returns null when the token normalizes to empty.
    */
  def normalize(term: String): String = {
    if (term == null) return null
    var needs = false
    var i = 0
    val n = term.length
    while (i < n && !needs) {
      val c = term.charAt(i)
      if ((c >= 'A' && c <= 'Z') || c == '.' || c == '\'' || c >= 0x80) needs = true
      i += 1
    }
    if (!needs) return if (n == 0) null else term
    val sb = new java.lang.StringBuilder(n)
    i = 0
    while (i < n) {
      val c = term.charAt(i)
      if (c != '.' && c != '\'') sb.append(c)
      i += 1
    }
    if (sb.length == 0) return null
    sb.toString.toLowerCase(java.util.Locale.ROOT)
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

/** Krovetz-style light stemmer (reference: src/KrovetzStemmer.cpp, the
  * public algorithm from Krovetz 1993). The reference ships a ~7k-line
  * exception dictionary; this implementation carries the rule steps
  * (plural, past-tense, -ing) with a small exception table, capped at
  * MAX_WORD_LENGTH 25 (reference: include/indri/KrovetzStemmer.hpp:46-52).
  * It is NOT dictionary-complete; the default analyzer for the code
  * corpus uses stemmer "none", and rank-identity tests pin whichever
  * stemmer they enable on both engine and oracle sides.
  */
object KrovetzStemmer extends Stemmer {
  val name = "krovetz"

  /** Direct conflation classes mirroring the reference's hard-coded
    * dictionary sections (reference: src/KrovetzStemmer.cpp:1136-1162 —
    * direct_conflations.txt, country_nationality.txt,
    * exception_words.txt folded into static tables; consulted before the
    * rule steps exactly like the reference's direct-mapping lookup,
    * src/KrovetzStemmer.cpp:1099-1104). The word lists are standard
    * English irregulars / nationality pairs (public linguistic data);
    * the reference's full head-word dictionary (~30k entries) gates every
    * rule step there — without it the rule steps below stay heuristic,
    * so the table carries the classes where the heuristics misfire.
    */
  private val irregularPlurals: Map[String, String] = Map(
    "indices" -> "index", "matrices" -> "matrix", "vertices" -> "vertex",
    "appendices" -> "appendix",
    "children" -> "child", "men" -> "man", "women" -> "woman",
    "feet" -> "foot", "teeth" -> "tooth", "geese" -> "goose",
    "mice" -> "mouse", "lice" -> "louse",
    "alumni" -> "alumnus", "fungi" -> "fungus", "nuclei" -> "nucleus",
    "radii" -> "radius", "stimuli" -> "stimulus", "syllabi" -> "syllabus",
    "analyses" -> "analysis", "crises" -> "crisis",
    "diagnoses" -> "diagnosis", "hypotheses" -> "hypothesis",
    "oases" -> "oasis", "parentheses" -> "parenthesis", "syntheses" -> "synthesis",
    "theses" -> "thesis",
    "leaves" -> "leaf", "halves" -> "half",
    "knives" -> "knife", "lives" -> "life", "loaves" -> "loaf",
    "selves" -> "self", "shelves" -> "shelf", "thieves" -> "thief",
    "wives" -> "wife", "wolves" -> "wolf"
    // deliberately ABSENT: data/media/criteria/phenomena — the reference's
    // plural() step only fires on -s endings and its conflation table
    // carries none of them, so the reference leaves them unstemmed
  )

  /** direct form conflations — the reference's direct_conflations class
    * (spelling-level pairs like aging→age, goes→go; NOT lemmatization —
    * the reference never maps was→be). Values mirror the reference table
    * (src/KrovetzStemmer.cpp:1157-1196) so `stemmer=krovetz` conflates
    * identically for these classes.
    */
  private val directConflations: Map[String, String] = Map(
    "aging" -> "age", "going" -> "go", "goes" -> "go", "lying" -> "lie",
    "using" -> "use", "owing" -> "owe", "suing" -> "sue", "dying" -> "die",
    "tying" -> "tie", "vying" -> "vie", "aged" -> "age", "used" -> "use",
    "vied" -> "vie", "cued" -> "cue", "died" -> "die", "eyed" -> "eye",
    "hued" -> "hue", "iced" -> "ice", "lied" -> "lie", "owed" -> "owe",
    "sued" -> "sue", "toed" -> "toe", "tied" -> "tie", "does" -> "do",
    "doing" -> "do", "fled" -> "flee", "belying" -> "belie",
    "aeronautical" -> "aeronautics", "mathematical" -> "mathematics",
    "political" -> "politics", "metaphysical" -> "metaphysics",
    "cylindrical" -> "cylinder", "nazism" -> "nazi",
    "miscarriage" -> "miscarry", "eerily" -> "eerie", "taxied" -> "taxi",
    "ambiguity" -> "ambiguous", "barbarity" -> "barbarous",
    "credulity" -> "credulous", "generosity" -> "generous",
    "spontaneity" -> "spontaneous", "unanimity" -> "unanimous",
    "voracity" -> "voracious",
    "babysitting" -> "babysit", "bootstrapped" -> "bootstrap",
    "bootstrapping" -> "bootstrap", "checksummed" -> "checksum",
    "checksumming" -> "checksum",
    "bookshelves" -> "bookshelf", "dwarves" -> "dwarf",
    "housewives" -> "housewife", "midwives" -> "midwife",
    "scarves" -> "scarf", "wharves" -> "wharf",
    "synopses" -> "synopsis", "vortices" -> "vortex",
    "yourselves" -> "yourself"
  )

  /** nationality → country (the country_nationality class; pair values
    * mirror the reference table, src/KrovetzStemmer.cpp:1172-1222)
    */
  private val countryNationality: Map[String, String] = Map(
    "afghan" -> "afghanistan", "african" -> "africa", "albanian" -> "albania",
    "algerian" -> "algeria", "american" -> "america", "andorran" -> "andorra",
    "angolan" -> "angola", "arabian" -> "arabia", "argentine" -> "argentina",
    "armenian" -> "armenia", "asian" -> "asia", "australian" -> "australia",
    "austrian" -> "austria", "azerbaijani" -> "azerbaijan", "azeri" -> "azerbaijan",
    "bangladeshi" -> "bangladesh", "belgian" -> "belgium", "bermudan" -> "bermuda",
    "bolivian" -> "bolivia", "bosnian" -> "bosnia", "botswanan" -> "botswana",
    "brazilian" -> "brazil", "british" -> "britain", "bulgarian" -> "bulgaria",
    "burmese" -> "burma", "californian" -> "california", "cambodian" -> "cambodia",
    "canadian" -> "canada", "chadian" -> "chad", "chilean" -> "chile",
    "chinese" -> "china", "colombian" -> "colombia", "croat" -> "croatia",
    "croatian" -> "croatia", "cuban" -> "cuba", "cypriot" -> "cyprus",
    "czechoslovakian" -> "czechoslovakia", "danish" -> "denmark",
    "egyptian" -> "egypt", "equadorian" -> "equador", "eritrean" -> "eritrea",
    "estonian" -> "estonia", "ethiopian" -> "ethiopia", "european" -> "europe",
    "fijian" -> "fiji", "filipino" -> "philippines", "finnish" -> "finland",
    "french" -> "france", "gambian" -> "gambia", "georgian" -> "georgia",
    "german" -> "germany", "ghanian" -> "ghana", "greek" -> "greece",
    "grenadan" -> "grenada", "guamian" -> "guam", "guatemalan" -> "guatemala",
    "guinean" -> "guinea", "guyanan" -> "guyana", "haitian" -> "haiti",
    "hawaiian" -> "hawaii", "holland" -> "dutch", "honduran" -> "honduras",
    "hungarian" -> "hungary", "icelandic" -> "iceland",
    "indonesian" -> "indonesia", "iranian" -> "iran", "iraqi" -> "iraq",
    "iraqui" -> "iraq", "irish" -> "ireland", "israeli" -> "israel",
    "italian" -> "italy", "jamaican" -> "jamaica", "japanese" -> "japan",
    "jordanian" -> "jordan", "kampuchean" -> "cambodia", "kenyan" -> "kenya",
    "korean" -> "korea", "kuwaiti" -> "kuwait", "lankan" -> "lanka",
    "laotian" -> "laos", "latvian" -> "latvia", "lebanese" -> "lebanon",
    "liberian" -> "liberia", "libyan" -> "libya", "lithuanian" -> "lithuania",
    "macedonian" -> "macedonia", "madagascan" -> "madagascar",
    "malaysian" -> "malaysia", "maltese" -> "malta",
    "mauritanian" -> "mauritania", "mexican" -> "mexico",
    "micronesian" -> "micronesia", "moldovan" -> "moldova",
    "monacan" -> "monaco", "mongolian" -> "mongolia",
    "montenegran" -> "montenegro", "moroccan" -> "morocco",
    "myanmar" -> "burma", "namibian" -> "namibia", "nepalese" -> "nepal",
    "nicaraguan" -> "nicaragua", "nigerian" -> "nigeria",
    "norwegian" -> "norway", "omani" -> "oman", "pakistani" -> "pakistan",
    "panamanian" -> "panama", "papuan" -> "papua", "paraguayan" -> "paraguay",
    "peruvian" -> "peru", "portuguese" -> "portugal", "romanian" -> "romania",
    "rumania" -> "romania", "rumanian" -> "romania", "russian" -> "russia",
    "rwandan" -> "rwanda", "samoan" -> "samoa", "scottish" -> "scotland",
    "serb" -> "serbia", "serbian" -> "serbia", "siam" -> "thailand",
    "siamese" -> "thailand", "slovakia" -> "slovak", "slovakian" -> "slovak",
    "slovenian" -> "slovenia", "somali" -> "somalia", "somalian" -> "somalia",
    "spanish" -> "spain", "swedish" -> "sweden", "swiss" -> "switzerland",
    "syrian" -> "syria", "taiwanese" -> "taiwan", "tanzanian" -> "tanzania",
    "texan" -> "texas", "thai" -> "thailand", "tunisian" -> "tunisia",
    "turkish" -> "turkey", "ugandan" -> "uganda", "ukrainian" -> "ukraine",
    "uruguayan" -> "uruguay", "uzbek" -> "uzbekistan",
    "venezuelan" -> "venezuela", "vietnamese" -> "viet",
    "virginian" -> "virginia", "yemeni" -> "yemen",
    "yugoslav" -> "yugoslavia", "yugoslavian" -> "yugoslavia",
    "zambian" -> "zambia", "zealander" -> "zealand",
    "zimbabwean" -> "zimbabwe"
  )

  /** words the rule steps must NOT touch (the exception_words class —
    * look inflected but are head words: silent-e nouns, -ss words, …)
    */
  private val leaveAlone: Set[String] = Set(
    "aide", "bathe", "caste", "cute", "dame", "dime", "doge", "done",
    "dune", "envelope", "gage", "grille", "grippe", "lobe", "mane",
    "mare", "nape", "node", "pane", "pate", "plane", "pope",
    "programme", "quite", "ripe", "rote", "rune", "sage", "severe",
    "shoppe", "sine", "slime", "snipe", "steppe", "suite", "swinge",
    "tare", "tine", "tope", "tripe", "twine",
    // look-plural head words
    "series", "species", "news", "analysis", "basis", "canvas", "chaos",
    "lens", "axis", "atlas", "bias", "bus", "census", "corps"
  )

  private val exceptions: Map[String, String] =
    irregularPlurals ++ directConflations ++ countryNationality

  def stem(term: String): String = {
    if (term == null || term.length <= 2 || term.length > 25) return term
    if (leaveAlone.contains(term)) return term
    exceptions.get(term) match {
      case Some(s) => return s
      case None =>
    }
    var w = term
    // plural step
    if (w.endsWith("ies") && w.length > 4) w = w.dropRight(3) + "y"
    else if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("es") && w.length > 3 &&
      (w.endsWith("ches") || w.endsWith("shes") || w.endsWith("sses") || w.endsWith("xes") || w.endsWith("zes")))
      w = w.dropRight(2)
    else if (w.endsWith("s") && !w.endsWith("ss") && !w.endsWith("us") && !w.endsWith("is") && w.length > 3)
      w = w.dropRight(1)
    // past-tense step
    if (w.endsWith("ied") && w.length > 4) w = w.dropRight(3) + "y"
    else if (w.endsWith("ed") && w.length > 4) {
      val base = w.dropRight(2)
      w = if (base.length >= 2 && base.charAt(base.length - 1) == base.charAt(base.length - 2)) base.dropRight(1)
          else if (base.endsWith("at") || base.endsWith("it") || base.endsWith("iz") || base.endsWith("us")) base + "e"
          else base
    }
    // -ing step
    if (w.endsWith("ing") && w.length > 5) {
      val base = w.dropRight(3)
      w = if (base.length >= 2 && base.charAt(base.length - 1) == base.charAt(base.length - 2) &&
              base.last != 'l' && base.last != 's') base.dropRight(1)
          else if (base.length <= 3 || base.endsWith("nn")) base
          else base
      // restore silent e for CVC-like stems (runn→run handled above; mak+ing→make)
      if (w.length >= 3 && isCons(w.last) && !isCons(w.charAt(w.length - 2)) && isCons(w.charAt(w.length - 3)) &&
          w.last != 'w' && w.last != 'x' && w.last != 'y' && (term.length - w.length) == 3 && !term.endsWith(w.last.toString + w.last + "ing"))
        w = w + "e"
    }
    if (w.length <= 1) term else w
  }
  @inline private def isCons(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case _ => true
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
    if (w.isEmpty) term else w
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
final case class Analyzer(
    mode: String = "indri",
    stopwords: Set[String] = Set.empty,
    stemmer: Stemmer = NoStemmer
) extends Serializable {

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
      var t = Normalizer.normalize(raw(i))
      if (t != null && t.length > maxTermLength) t = null
      if (t != null && stopwords.contains(t)) t = null
      if (t != null) t = stemmer.stem(t)
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
          var t = Normalizer.normalize(raw(i))
          if (t != null && t.length > maxTermLength) t = null
          if (t != null && stopwords.contains(t)) t = null
          if (t != null) t = stemmer.stem(t)
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
    */
  def processTerm(term: String): String = {
    var t = Normalizer.normalize(term)
    if (t != null && t.length > maxTermLength) t = null
    if (t != null && stopwords.contains(t)) t = null
    if (t != null) t = stemmer.stem(t)
    t
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

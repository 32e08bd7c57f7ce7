package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** A token with its 0-based position in the document's position space.
  * Mirrors the reference's ParsedDocument.terms + positions pair
  * (reference: include/indri/ParsedDocument.hpp:32-46).
  */
final case class Token(term: String, pos: Int)

/** Scanner port of the reference flex tokenizer rules
  * (reference: src/TextTokenizer.l:46-58). Longest-match, earlier-rule
  * tiebreak, exactly like flex:
  *
  *  - `<!-- ... -->` comments zapped
  *  - `<! ...>`, `<% ... %>`, `<?xml ...>` zapped
  *  - `<tag ...>` markup stripped (tag events not indexed by default)
  *  - `&entity;` / `&#123;` / `&#xAB;` zapped
  *  - `[A-Z0-9]"."([A-Z0-9]".")*`  acronym-with-periods  → ASCII token
  *  - `[a-zA-Z0-9']+`                                   → ASCII token
  *  - `-[0-9]+("."[0-9]+)?`        negative decimals     → ASCII token
  *  - alphanumeric-or-non-ASCII runs                     → UTF8 token
  *  - everything else zapped
  *
  * Emits raw (un-normalized) tokens; normalization / stopping / stemming
  * are separate stages (see [[Analyzer]]), matching the reference
  * transformation chain order (reference: src/Repository.cpp:137-177).
  */
/** A tag (field) extent in token-position space, with the char span of
  * the covered text for numeric/date payload parsing
  * (reference: include/indri/FieldExtent.hpp:30-46 — begin/end token
  * positions + INT64 number; src/Repository.cpp:151-158 Numeric/Date
  * field annotators parse the covered text).
  */
final case class TagExtent(name: String, begin: Int, end: Int,
                           charBegin: Int, charEnd: Int)

object Tokenizer {

  def tokenize(text: String): Array[String] = scan(text, null)

  /** Tokenize AND record each token's char span [begin, end) in the
    * source text — the reference's ParsedDocument.positions
    * (TermExtent byte offsets, include/indri/ParsedDocument.hpp:40;
    * char==byte for the ASCII corpora this engine targets). The
    * OffsetAnnotationAnnotator analogue converts annotation byte
    * extents to token positions against these spans.
    */
  def tokenizeWithOffsets(text: String): (Array[String], Array[Int], Array[Int]) = {
    val offs = new ArrayBuffer[Int](32)
    val toks = scan(text, null, offs)
    val begins = new Array[Int](toks.length)
    val ends = new Array[Int](toks.length)
    var i = 0
    while (i < toks.length) {
      begins(i) = offs(2 * i); ends(i) = offs(2 * i + 1); i += 1
    }
    (toks, begins, ends)
  }

  /** Tokenize AND record tag events as token-position extents — the
    * TagEvent path of the reference lexer (reference:
    * src/TextTokenizer.l:46-48 tag rules; TokenizedDocument tag events).
    * Open tags match the most recent same-name open; unclosed tags run
    * to the end of the document.
    */
  def tokenizeWithTags(text: String): (Array[String], Array[TagExtent]) = {
    val tags = new ArrayBuffer[TagExtent](8)
    val toks = scan(text, tags)
    (toks, tags.toArray)
  }

  private def scan(text: String, tagsOut: ArrayBuffer[TagExtent],
                   offsetsOut: ArrayBuffer[Int] = null): Array[String] = {
    if (text == null) return Array.empty
    val out = new ArrayBuffer[String](math.max(8, text.length / 6))
    // open-tag stack entries: (name, tokenBegin, charBegin)
    val open = if (tagsOut == null) null
               else new ArrayBuffer[(String, Int, Int)](8)
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '<') {
        if (tagsOut == null) i = scanAngle(text, i, n)
        else {
          val (j, name, isClose) = scanAngleTag(text, i, n)
          if (name != null) {
            if (!isClose) open += ((name, out.length, j))
            else {
              // close the most recent matching open tag
              var k = open.length - 1
              while (k >= 0 && open(k)._1 != name) k -= 1
              if (k >= 0) {
                val (nm, tb, cb) = open.remove(k)
                tagsOut += TagExtent(nm, tb, out.length, cb, i)
              }
            }
          }
          i = j
        }
      } else if (c == '&') {
        val j = scanEntity(text, i, n)
        if (j > i) i = j
        else i += 1 // bare '&' zapped
      } else {
        // Try the token rules; flex picks the longest match and, on a
        // tie, the earliest rule. Compute all candidate lengths.
        val lenAcr = matchAcronym(text, i, n)   // [A-Z0-9]"."([A-Z0-9]".")*
        val lenWord = matchWord(text, i, n)     // [a-zA-Z0-9']+
        val lenNeg = matchNegNumber(text, i, n) // -[0-9]+(.[0-9]+)?
        val lenUtf = matchUtf8Run(text, i, n)   // [a-zA-Z0-9 -…]+
        val best = math.max(math.max(lenAcr, lenWord), math.max(lenNeg, lenUtf))
        if (best <= 0) {
          i += 1 // zap one char
        } else {
          out += text.substring(i, i + best)
          if (offsetsOut != null) { offsetsOut += i; offsetsOut += i + best }
          i += best
        }
      }
    }
    if (open != null && open.nonEmpty) {
      // unclosed tags extend to end-of-document
      open.foreach { case (nm, tb, cb) =>
        tagsOut += TagExtent(nm, tb, out.length, cb, n)
      }
      // keep document order by token begin (stack pops emit out of order)
      val sorted = tagsOut.sortBy(t => (t.begin, t.end))
      tagsOut.clear(); tagsOut ++= sorted
    }
    out.toArray
  }

  /** Like scanAngle but also classifies markup tags: returns
    * (endIndex, lowercasedTagName | null, isCloseTag).
    */
  private def scanAngleTag(s: String, i: Int, n: Int): (Int, String, Boolean) = {
    if (i + 1 < n) {
      val c1 = s.charAt(i + 1)
      val isClose = c1 == '/'
      val nameStart = if (isClose) i + 2 else i + 1
      if (isClose || isAlpha(c1)) {
        val end = s.indexOf('>', i + 1)
        if (end >= 0 && nameStart < end) {
          var j = nameStart
          while (j < end && (isAlpha(s.charAt(j)) || isDigit(s.charAt(j)))) j += 1
          val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          if (name.nonEmpty && !s.startsWith("<?xml", i))
            return (end + 1, name, isClose)
        }
      }
    }
    (scanAngle(s, i, n), null, false)
  }

  /** Comment / directive / markup zapping starting at '<'.
    * Returns the index after the zapped region (or i+1 if '<' is literal).
    */
  private def scanAngle(s: String, i: Int, n: Int): Int = {
    // "<!--" ... "-->"
    if (s.startsWith("<!--", i)) {
      val end = s.indexOf("-->", i + 4)
      return if (end >= 0) end + 3 else n
    }
    // "<!"[^-][^>]*">"
    if (i + 2 < n && s.charAt(i + 1) == '!' && s.charAt(i + 2) != '-') {
      val end = s.indexOf('>', i + 2)
      if (end >= 0) return end + 1
    }
    // "<%"[^%>]+"%>"
    if (i + 1 < n && s.charAt(i + 1) == '%') {
      val end = s.indexOf("%>", i + 2)
      if (end >= 0 && end > i + 2) return end + 2
    }
    // "<?xml"[^>]*">"
    if (s.startsWith("<?xml", i)) {
      val end = s.indexOf('>', i + 5)
      if (end >= 0) return end + 1
    }
    // \<[a-zA-Z/][^>]*\>  — markup tag
    if (i + 1 < n) {
      val c1 = s.charAt(i + 1)
      if ((c1 >= 'a' && c1 <= 'z') || (c1 >= 'A' && c1 <= 'Z') || c1 == '/') {
        val end = s.indexOf('>', i + 1)
        if (end >= 0) return end + 1
      }
    }
    i + 1 // lone '<': zapped as "any other char"
  }

  /** [&]([a-zA-Z]+|[#]([0-9]+|[xX][hex]+))[;] — returns end index or i. */
  private def scanEntity(s: String, i: Int, n: Int): Int = {
    var j = i + 1
    if (j >= n) return i
    if (s.charAt(j) == '#') {
      j += 1
      if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) {
        j += 1
        val st = j
        while (j < n && isHex(s.charAt(j))) j += 1
        if (j > st && j < n && s.charAt(j) == ';') return j + 1
      } else {
        val st = j
        while (j < n && isDigit(s.charAt(j))) j += 1
        if (j > st && j < n && s.charAt(j) == ';') return j + 1
      }
    } else {
      val st = j
      while (j < n && isAlpha(s.charAt(j))) j += 1
      if (j > st && j < n && s.charAt(j) == ';') return j + 1
    }
    i
  }

  @inline private def isDigit(c: Char) = c >= '0' && c <= '9'
  @inline private def isAlpha(c: Char) =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isHex(c: Char) =
    isDigit(c) || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  @inline private def isUpperNum(c: Char) = (c >= 'A' && c <= 'Z') || isDigit(c)
  @inline private def isWordChar(c: Char) = isAlpha(c) || isDigit(c) || c == '\''
  // UTF8 rule byte class [a-zA-Z0-9\x80-\xFD]: at char level, alnum or
  // any non-ASCII char (chars ≥ 0x80 came from bytes ≥ 0x80).
  @inline private def isUtfChar(c: Char) = isAlpha(c) || isDigit(c) || c >= 0x80

  /** [A-Z0-9]"."([A-Z0-9]".")* */
  private def matchAcronym(s: String, i: Int, n: Int): Int = {
    var j = i
    var last = -1
    while (j + 1 < n && isUpperNum(s.charAt(j)) && s.charAt(j + 1) == '.') {
      j += 2
      last = j
    }
    if (last > i) last - i else 0
  }

  /** [a-zA-Z0-9']+ */
  private def matchWord(s: String, i: Int, n: Int): Int = {
    var j = i
    while (j < n && isWordChar(s.charAt(j))) j += 1
    j - i
  }

  /** "-"[0-9]+("."[0-9]+)? */
  private def matchNegNumber(s: String, i: Int, n: Int): Int = {
    if (s.charAt(i) != '-') return 0
    var j = i + 1
    val st = j
    while (j < n && isDigit(s.charAt(j))) j += 1
    if (j == st) return 0
    if (j + 1 < n && s.charAt(j) == '.' && isDigit(s.charAt(j + 1))) {
      j += 1
      while (j < n && isDigit(s.charAt(j))) j += 1
    }
    j - i
  }

  /** [a-zA-Z0-9\x80-\xFD]+ */
  private def matchUtf8Run(s: String, i: Int, n: Int): Int = {
    var j = i
    while (j < n && isUtfChar(s.charAt(j))) j += 1
    j - i
  }
}

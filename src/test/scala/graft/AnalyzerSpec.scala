package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._

/** Rule-by-rule vectors from the reference tokenizer spec
  * (reference: src/TextTokenizer.l:46-58) and normalization
  * (reference: src/NormalizationTransformation.cpp:45-92).
  */
class AnalyzerSpec extends AnyFunSuite {
  private val az = Analyzer()

  private def terms(s: String): Seq[String] = az.analyze(s).toSeq

  test("acronym rule: U.S.A. -> usa") {
    assert(terms("U.S.A. policy") == Seq("usa", "policy"))
  }

  test("apostrophe removal: don't -> dont") {
    assert(terms("don't") == Seq("dont"))
  }

  test("markup tags stripped") {
    assert(terms("<b>bold</b> text") == Seq("bold", "text"))
  }

  test("html comments stripped") {
    assert(terms("a <!-- hidden words --> b") == Seq("a", "b"))
  }

  test("entities dropped") {
    assert(terms("x &amp; y &#123; z &#xAB; w") == Seq("x", "y", "z", "w"))
  }

  test("negative decimals kept as one token") {
    assert(terms("val = -3.14;") == Seq("val", "-314"))
    // the '-' prefix token rule keeps "-3.14" whole
    // (reference: TextTokenizer.l:57); normalization strips only '.'
    // and '\'' (reference: NormalizationTransformation.cpp:72-80)
  }

  test("plain decimal splits at the period rule") {
    // "3.14": acronym rule eats "3.", word rule then "14"
    assert(terms("3.14") == Seq("3", "14"))
  }

  test("utf8 run kept and lowercased") {
    assert(terms("Naïve Café") == Seq("naïve", "café"))
  }

  test("stopword becomes null slot, position preserved, doclen counts it") {
    val azStop = Analyzer(stopwords = Set("the"))
    val slots = azStop.analyze("the quick fox")
    assert(slots.length == 3)
    assert(slots(0) == null)
    assert(slots(1) == "quick" && slots(2) == "fox")
  }

  test("over-long token becomes null slot") {
    val long = "a" * 600
    val slots = az.analyze(s"$long ok")
    assert(slots.length == 2)
    assert(slots(0) == null && slots(1) == "ok")
  }

  test("query-side processTerm parity with indexing chain") {
    val azStop = Analyzer(stopwords = Set("the"))
    assert(azStop.processTerm("DON'T") == "dont")
    assert(azStop.processTerm("THE") == null)
    assert(azStop.processTerm("U.S.A.") == "usa")
  }

  test("simple mode matches duckdb regexp_extract_all semantics") {
    val simple = Analyzer(mode = "simple")
    assert(simple.analyze("Hello, World-42 foo").toSeq == Seq("hello", "world", "42", "foo"))
    assert(simple.analyze("don't").toSeq == Seq("don", "t"))
  }

  test("porter stemmer classic vectors") {
    val p = PorterStemmer
    assert(p.stem("caresses") == "caress")
    assert(p.stem("ponies") == "poni")
    assert(p.stem("running") == "run")
    assert(p.stem("relational") == "relat")
    assert(p.stem("conditional") == "condit")
    assert(p.stem("hopping") == "hop")
    assert(p.stem("sized") == "size")
    assert(p.stem("agreed") == "agre")
    assert(p.stem("troubled") == "troubl")
    assert(p.stem("cats") == "cat")
  }

  test("krovetz vectors (dictionary-gated, reference golden)") {
    val kz = KrovetzStemmer
    // head words dominate: inflected-looking dictionary entries stay
    assert(kz.stem("indices") == "indices")
    assert(kz.stem("running") == "running")
    assert(kz.stem("tables") == "table")
    // >25 chars passthrough (reference: KrovetzStemmer.hpp:48)
    val long = "a" * 26
    assert(kz.stem(long) == long)
  }

  test("arabic light10 stemmer (reference: Arabic_Stemmer_utf8.cpp arabic_light10_unicode)") {
    val ar = ArabicStemmer
    val kitab = "\u0643\u062A\u0627\u0628"                       // كتاب
    assert(ar.stem("\u0627\u0644" + kitab) == kitab)             // الكتاب → كتاب (article)
    assert(ar.stem("\u0648\u0627\u0644" + kitab) == kitab)       // والكتاب → كتاب (waw + article)
    assert(ar.stem(kitab + "\u0647\u0627") == kitab)             // كتابها → كتاب (suffix ها)
    // المدرسة: norm2 maps ة→ه, article strips, suffix ه strips → مدرس
    assert(ar.stem("\u0627\u0644\u0645\u062F\u0631\u0633\u0629") ==
      "\u0645\u062F\u0631\u0633")
    // diacritics dropped (kasra U+0650), word otherwise intact
    assert(ar.stem("\u0643\u0650\u062A\u0627\u0628") == kitab)
    // alef-madda normalizes to bare alef; 3-char word untouched by rules
    assert(ar.stem("\u0622\u0645\u0646") == "\u0627\u0645\u0646")
    // final ى → ي (norm2), then suffix ي strips when remainder ≥ 2
    assert(ar.stem("\u0645\u0628\u0646\u0649") == "\u0645\u0628\u0646")
    // non-Arabic text passes through untouched
    assert(ar.stem("hello") == "hello")
    // 3-char word: the article probe needs >len+1 chars so ال stays,
    // but the suffix step (lenlimit=1) still strips the trailing ي
    assert(ar.stem("\u0627\u0644\u064A") == "\u0627\u0644")
    // full analyzer chain with stemmer=arabic
    val az = Analyzer(stemmer = Stemmers.byName("arabic"))
    assert(az.processTerm("\u0627\u0644" + kitab.toUpperCase) == kitab)
  }

  test("krovetz dictionary classes (table-driven, reference: KrovetzStemmer.cpp:1136-1222)") {
    val kz = KrovetzStemmer
    // direct conflations — spelling-level pairs, exactly the reference values
    val direct = Seq(
      "aging" -> "age", "goes" -> "go", "lying" -> "lie", "dying" -> "die",
      "does" -> "do", "doing" -> "do", "fled" -> "flee", "eyed" -> "eye",
      "taxied" -> "taxi", "eerily" -> "eerie",
      "mathematical" -> "mathematics", "political" -> "politics",
      "cylindrical" -> "cylinder", "miscarriage" -> "miscarry",
      "generosity" -> "generous", "unanimity" -> "unanimous",
      "bootstrapped" -> "bootstrap", "checksumming" -> "checksum")
    direct.foreach { case (v, w) => assert(kz.stem(v) == w, s"$v -> ${kz.stem(v)} != $w") }
    // country/nationality class
    val nat = Seq(
      "italian" -> "italy", "japanese" -> "japan", "french" -> "france",
      "german" -> "germany", "chinese" -> "china", "dutch" -> "dutch",
      "holland" -> "dutch", "siamese" -> "thailand", "brazilian" -> "brazil",
      "iraqi" -> "iraq", "israeli" -> "israel", "swiss" -> "switzerland")
    nat.foreach { case (v, w) => assert(kz.stem(v) == w, s"$v -> ${kz.stem(v)} != $w") }
    // plural handling exactly as the reference resolves it: conflation
    // table hits (theses/crises/appendices/wolves), head-word identity
    // (knives/shelves ARE head words; fungi/radii/children never enter
    // plural() — no final s), and the rule-step defaults for the rest
    // (vertices -> vertice: "vertice" is not in the dictionary, so the
    // -es step retains the e)
    val plurals = Seq(
      "analyses" -> "analyse", "theses" -> "thesis", "crises" -> "crisis",
      "vertices" -> "vertice", "matrices" -> "matrice", "appendices" -> "appendix",
      "wolves" -> "wolf", "shelves" -> "shelves", "knives" -> "knives",
      "fungi" -> "fungi", "radii" -> "radii", "children" -> "children")
    plurals.foreach { case (v, w) => assert(kz.stem(v) == w, s"$v -> ${kz.stem(v)} != $w") }
    // exception words the rule steps must NOT touch (silent-e heads,
    // look-plural heads) — reference exception_words class
    Seq("suite", "programme", "severe", "plane", "series", "species",
        "news", "chaos", "lens", "bus").foreach { w =>
      assert(kz.stem(w) == w, s"$w wrongly stemmed to ${kz.stem(w)}")
    }
    // words the reference leaves alone (no -s ending, not in tables):
    // data/media/criteria pass through unstemmed
    Seq("data", "media", "criteria", "phenomena").foreach { w =>
      assert(kz.stem(w) == w, s"$w wrongly stemmed to ${kz.stem(w)}")
    }
    // regular rule steps still work: plural, past with doubled-consonant
    // undo; "making" is itself a head word so it stays (reference golden)
    assert(kz.stem("stopped") == "stop")
    assert(kz.stem("making") == "making")
    assert(kz.stem("churches") == "church")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{Analyzer, ArabicStemmer, Stemmers}

/** Equivalence of the Arabic light10 stemmer against golden vectors
  * generated from the reference implementation (Arabic_Stemmer_utf8
  * compiled standalone from src/Arabic_Stemmer_utf8.cpp, stem function
  * `arabic_light10`, driven over 20,847 seeded synthetic words covering
  * alef/ta-marbuta/alef-maqsura normalization, diacritics and tatweel
  * drops, the waw/article prefixes, single and doubled suffixes,
  * length-guard shorties and mixed ASCII/Arabic tokens).
  */
class ArabicGoldenSpec extends AnyFunSuite {

  private def golden: Iterator[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/arabic_light10_golden.tsv")
    require(in != null, "missing golden resource")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines().map { ln =>
      val t = ln.indexOf('\t')
      (ln.substring(0, t), ln.substring(t + 1))
    }
  }

  test("stem() matches the reference for all 20k golden vectors") {
    var n = 0
    var bad = 0
    val examples = scala.collection.mutable.ArrayBuffer.empty[String]
    golden.foreach { case (w, want) =>
      n += 1
      val got = ArabicStemmer.stem(w)
      if (got != want) {
        bad += 1
        if (examples.size < 20) examples += s"$w: got '$got' want '$want'"
      }
    }
    assert(n > 20000, s"golden file truncated: $n")
    assert(bad == 0, s"$bad/$n mismatches; first: ${examples.mkString("; ")}")
  }

  test("empty stems (diacritic/tatweel-only words) become null slots") {
    // the reference stems a word of only dropped in-range chars to the
    // EMPTY string; the indexer then nulls the slot, position preserved
    val tatweel = "ـ"
    assert(ArabicStemmer.stem(tatweel) == "")
    val az = Analyzer(stemmer = Stemmers.byName("arabic"))
    val slots = az.analyze(s"kitab $tatweel kutub")
    assert(slots.length == 3 && slots(1) == null)
    assert(az.processTerm(tatweel) == null)
  }
}

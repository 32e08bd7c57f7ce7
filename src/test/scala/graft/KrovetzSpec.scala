package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.KrovetzStemmer

/** Equivalence of the ported Krovetz stemmer against golden vectors
  * generated from the reference implementation itself (the kstem
  * algorithm + 27,797-entry head-word dictionary compiled standalone
  * from src/KrovetzStemmer.cpp and driven over fixture-corpus tokens,
  * every conflation/exception entry, 2,500 sampled head words and
  * 33k synthetic suffix inflections — 36k vectors total).
  */
class KrovetzSpec extends AnyFunSuite {

  private def golden: Iterator[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/kstem_golden.tsv")
    require(in != null, "missing golden resource")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines().map { ln =>
      val t = ln.indexOf('\t')
      (ln.substring(0, t), ln.substring(t + 1))
    }
  }

  test("stem() matches the reference for all 36k golden vectors") {
    var n = 0
    var bad = 0
    val examples = scala.collection.mutable.ArrayBuffer.empty[String]
    golden.foreach { case (w, want) =>
      n += 1
      val got = KrovetzStemmer.stem(w)
      if (got != want) {
        bad += 1
        if (examples.size < 20) examples += s"$w: got $got want $want"
      }
    }
    assert(n > 30000, s"golden file truncated: $n")
    assert(bad == 0, s"$bad/$n mismatches; first: ${examples.mkString("; ")}")
  }

  test("dictionary-gated behaviors (spot checks)") {
    val kz = KrovetzStemmer
    // head words are left alone even when they look inflected
    assert(kz.stem("running") === "running") // head word
    assert(kz.stem("indices") === "indices") // head word
    assert(kz.stem("news") === "news")
    // direct conflations (incl. via plural: italians -> italian -> italy)
    assert(kz.stem("italian") === "italy")
    assert(kz.stem("italians") === "italy")
    assert(kz.stem("aging") === "age")
    assert(kz.stem("fled") === "flee")
    // rule steps gated by dictionary lookup
    assert(kz.stem("calories") === "calorie") // -ies, dict hit on -ie
    assert(kz.stem("studies") === "study") // -ies -> -y default
    assert(kz.stem("crosses") === "cross") // double-s guard
    assert(kz.stem("churches") === "church")
    assert(kz.stem("stopped") === "stop") // doubled consonant undone
    assert(kz.stem("divisibility") === "divisible") // -ibility -> -ble
    assert(kz.stem("explorer") === "explore")
    // exception words never stem
    assert(kz.stem("suite") === "suite")
    assert(kz.stem("programme") === "programme")
    // too short / too long / non-alpha: lowercase only
    assert(kz.stem("ab") === "ab")
    assert(kz.stem("a" * 26) === "a" * 26)
    assert(kz.stem("e2e") === "e2e")
    assert(kz.stem("Sized") === "size")
  }
}

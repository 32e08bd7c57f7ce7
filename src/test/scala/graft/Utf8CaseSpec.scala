package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{Normalizer, Utf8Case}

/** UTF8 case-normalization parity with the reference's codepoint table
  * (src/UTF8CaseNormalizationTransformation.cpp), golden-pinned against
  * the COMPILED reference transform run over the full normalization
  * chain (tools/gen_utf8_case_golden.py — same approach as the arabic
  * light10 goldens).
  */
class Utf8CaseSpec extends AnyFunSuite {

  private lazy val vectors: Vector[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/utf8_case_golden.tsv")
    require(in != null, "missing utf8_case_golden.tsv fixture")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { l =>
      val t = l.indexOf('\t')
      (l.substring(0, t), l.substring(t + 1))
    }.toVector
    finally src.close()
  }

  test("golden vectors: normalize chain == compiled reference transform") {
    assert(vectors.size >= 1800, s"fixture too small: ${vectors.size}")
    vectors.foreach { case (word, expect) =>
      val got = Option(Normalizer.normalize(word)).getOrElse("")
      assert(got == expect,
        s"'$word': got '$got' (${got.codePoints.toArray.toSeq.map(_.toHexString)}) " +
          s"expected '$expect' (${expect.codePoints.toArray.toSeq.map(_.toHexString)})")
    }
  }

  test("reference divergences from Unicode toLowerCase are deliberate") {
    // capital dotted I → plain i (Java: i + U+0307 combining dot)
    assert(Normalizer.normalize("İstanbul") == "istanbul")
    assert("İstanbul".toLowerCase(java.util.Locale.ROOT) != "istanbul")
    // capital sigma → medial σ even word-finally (Java: final ς)
    assert(Normalizer.normalize("ΟΔΥΣΣΕΥΣ") == "οδυσσευσ")
    assert("ΟΔΥΣΣΕΥΣ".toLowerCase(java.util.Locale.ROOT) == "οδυσσευς")
    // uppercase codepoints absent from the table pass through
    assert(Normalizer.normalize("ẞ") == "ẞ") // U+1E9E not in caseMap
    // titlecase digraph ǅ (U+01C5) maps to ǆ (U+01C6)
    assert(Normalizer.normalize("ǅx") == "ǆx")
    // above-BMP: Deseret long I U+10400 → U+10428
    assert(Utf8Case.lower(0x10400) == 0x10428)
    assert(Normalizer.normalize(new String(Character.toChars(0x10427))) ==
      new String(Character.toChars(0x1044F)))
    // chain order: strip + ASCII downcase happen even for UTF-8 terms
    assert(Normalizer.normalize("U.S.A") == "usa")
    assert(Normalizer.normalize("CAFÉ'S") == "cafés")
    // pure-ASCII fast path unchanged
    assert(Normalizer.normalize("Hello") == "hello")
    assert(Normalizer.normalize("...") == null)
  }
}

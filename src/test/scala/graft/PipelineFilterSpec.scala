package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.TextPipeline

/** Decontamination (probe n-gram overlap) and Gopher-style repetition
  * signals, against hand-computed expectations.
  */
class PipelineFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("ngramContamination flags docs sharing an 8-gram with the probe set") {
    val probe = Seq((100L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val docs = Seq(
      // contains probe 8-grams "two three four five six seven eight nine"
      // and "three four five six seven eight nine ten" via copied tail
      (1L, "zzz two three four five six seven eight nine ten"),
      (2L, "totally different words with no overlap at all whatsoever here"),
      (3L, "one two three four five six seven eight")  // exactly one probe 8-gram
    ).toDF("doc_id", "text")
    val got = TextPipeline.ngramContamination(docs, "doc_id", "text", probe, "text", n = 8)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((2L, 1L)))
    assert(got(2L) == ((0L, 0L)))
    assert(got(3L) == ((1L, 1L)))
  }

  test("codeStats: line lengths, alnum fraction, comment lines, SPDX flag") {
    val docs = Seq(
      (1L, "// SPDX-License-Identifier: MIT\nval x = 1\n# config line\n\nlongest line here!"),
      (2L, "")
    ).toDF("doc_id", "text")
    val got = TextPipeline.codeStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val text1 = "// SPDX-License-Identifier: MIT\nval x = 1\n# config line\n\nlongest line here!"
    val alnum = text1.count(_.isLetterOrDigit).toDouble / text1.length
    // 4 non-empty lines; longest = "// SPDX-License-Identifier: MIT" (31);
    // comment lines: the // and # ones -> 2/4
    assert(got(1L) == ((31L, 4L,
      BigDecimal(alnum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, 0.5, 1L)))
    assert(got(2L) == ((0L, 0L, 0.0, 0.0, 0L)))
  }

  test("hashSplit: deterministic, partition-invariant, respects thresholds") {
    val ids = (1L to 400L).toDF("doc_id")
    val a = TextPipeline.hashSplit(ids, "doc_id")
      .as[(Long, Int, String)].collect().sortBy(_._1)
    val b = TextPipeline.hashSplit(ids.repartition(7), "doc_id")
      .as[(Long, Int, String)].collect().sortBy(_._1)
    assert(a.sameElements(b)) // pure function of the id, layout-invariant
    assert(a.forall { case (_, bkt, s) =>
      bkt >= 0 && bkt < 100 &&
        s == (if (bkt < 80) "train" else if (bkt < 90) "validation" else "test")
    })
    val frac = a.count(_._3 == "train").toDouble / a.length
    assert(frac > 0.7 && frac < 0.9) // ~80% within md5-uniformity slack
  }

  test("ngramContaminationBloom is output-identical to the exact operator") {
    val docs = (1L to 60L).map { i =>
      val text =
        if (i % 7 == 0) "shared benchmark phrase one two three four five six"
        else s"doc $i " + Seq.tabulate(12)(j => s"w${i}x$j").mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val probes = docs.where(col("doc_id") === 7L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val exact = rows(TextPipeline.ngramContamination(
      docs, "doc_id", "text", probes, "text", n = 8))
    val bloom = rows(TextPipeline.ngramContaminationBloom(
      docs, "doc_id", "text", probes, "text", n = 8))
    assert(bloom == exact) // false positives die in the verify join
    assert(exact.count(_._3 == 1L) == 60 / 7) // the planted shared docs
  }

  test("sampleStrata: per-stratum rates, layout-invariance, monotone growth") {
    val rows = (1L to 600L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0)
    val got = TextPipeline.sampleStrata(rows, "doc_id", "source", rates)
      .as[(Long, String, Double)].collect().sortBy(_._1)
    // rate 1 keeps everything, rate 0 keeps nothing, 0.5 lands mid
    assert(got.count(_._2 == "src0") == 200)
    assert(got.count(_._2 == "src2") == 0)
    val half = got.count(_._2 == "src1")
    assert(half > 70 && half < 130, s"src1 kept $half of 200")
    assert(got.forall(r => r._3 >= 0.0 && r._3 < 1.0))
    // layout-invariant (pure function of the id)
    val b = TextPipeline.sampleStrata(rows.repartition(7), "doc_id", "source", rates)
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.sameElements(b))
    // MONOTONE: raising a rate only ADDS documents (nested samples)
    val grown = TextPipeline.sampleStrata(rows, "doc_id", "source",
      rates.updated("src1", 0.8)).as[(Long, String, Double)].collect()
    assert(got.map(_._1).toSet.subsetOf(grown.map(_._1).toSet))
    // unknown strata take the default rate
    val dflt = TextPipeline.sampleStrata(rows, "doc_id", "source",
      Map.empty, defaultRate = 1.0)
    assert(dflt.count() == 600)
  }

  test("unigramLogProb: mean corpus-unigram log-prob, hand-computed") {
    // corpus counts: a:3, b:2, c:1 -> T=6
    val docs = Seq((1L, "a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextPipeline.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lp1 = (math.log10(3 / 6.0) * 2 + math.log10(2 / 6.0)) / 3
    val lp2 = (math.log10(3 / 6.0) + math.log10(2 / 6.0) + math.log10(1 / 6.0)) / 3
    assert(got(1L)._2 == 3L && got(2L)._2 == 3L)
    assert(math.abs(got(1L)._1 - r6(lp1)) < 2e-6 && math.abs(got(2L)._1 - r6(lp2)) < 2e-6)
  }

  test("redactPii: emails, IPv4s and digit runs replaced with typed tokens; counts reported") {
    val docs = Seq(
      (1L, "contact a.user+spam@ex-ample.org or 10.0.254.1 or call 5551234567 now"),
      (2L, "clean text, short digits 123456 stay, code42 stays")
    ).toDF("doc_id", "text")
    val got = TextPipeline.redactPii(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((1L, 1L, 1L,
      "contact <EMAIL> or <IP> or call <PHONE> now")))
    assert(got(2L) == ((0L, 0L, 0L,
      "clean text, short digits 123456 stay, code42 stays"))) // 6 digits < 7
  }

  test("repetitionStats: duplicate-line fraction and top-bigram share") {
    val docs = Seq(
      // 4 non-empty lines, 3 distinct -> dup_line_frac = 1 - 3/4 = 0.25
      // tokens: a b a b a b c x y -> 8 bigrams, top "a b" x3 -> 3/8
      (1L, "a b\na b\na b c\n\nx y"),
      (2L, "")  // degenerate: no lines, no bigrams -> 0.0 / 0.0
    ).toDF("doc_id", "text")
    val got = TextPipeline.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1 lines: "a b", "a b", "a b c", "x y" -> 4 lines, 3 distinct
    assert(got(1L)._1 == 0.25)
    assert(got(1L)._2 == 0.375)
    assert(got(2L) == ((0.0, 0.0)))
  }
}

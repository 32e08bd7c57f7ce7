package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Engine, ScoringRule, WebTrackRerank}

/** Hand-computed pins for the webtrack max-passage rerank
  * (reference: webtrack/clue.cc createPassage/reScore/prepareResult,
  * webtrack/LanguageModel.cc).
  */
class WebTrackRerankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val cfg = IndexConfig(analyzerMode = "simple", blockSize = 8, numBuckets = 2)
  // doc1: 8 kept tokens → chunks [0,5) and [3,8) at P=5, W=2 (stride 3)
  // doc2: exactly 5 kept tokens → ONE chunk (flush only — the reference
  //       emits in-loop only when a token arrives AFTER the boundary)
  // doc3: matches no query term → not retrieved
  private val corpus = Seq(
    (1L, "data merge w1 w2 w3 w4 w5 data"),
    (2L, "w6 w7 data w8 w9"),
    (3L, "w1 w2 w3")
  )
  private lazy val index = IndexBuilder.build(corpus.toDF("docId", "content"), cfg)
  private lazy val eng = new Engine(spark, index, cfg.analyzer,
    ScoringRule(method = "dirichlet"))
  private lazy val content = corpus.toDF("docId", "content")

  // corpus stats in the ENGINE space: C = 8 + 5 + 3 = 16
  // ctf: data 3, merge 1
  private val C = 16.0
  private def lm(tf: Double, ctf: Double, len: Double) =
    math.log(tf + 2500.0 * ctf / C) - math.log(len + 2500.0)

  test("chunking: [k·stride, k·stride+P) with a flush chunk to the end; exact-P docs give ONE chunk") {
    val out = WebTrackRerank.maxPassageRerank(eng, content,
        Seq(("q1", "data merge")), k = 10, passageSz = 5, windowSz = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3))).toMap
    // doc1 chunks: [0,5) = data merge w1 w2 w3 → data tf=1, merge tf=1
    //              [3,8) = w2 w3 w4 w5 data    → data tf=1, merge tf=0
    val c0 = lm(1, 3, 5) + lm(1, 1, 5)
    val c1 = lm(1, 3, 5) + lm(0, 1, 5)
    // doc2 single chunk [0,5): data tf=1, merge tf=0
    val d2 = lm(1, 3, 5) + lm(0, 1, 5)
    assert(out.keySet == Set(1L, 2L))
    assert(math.abs(out(1L)._1 - math.max(c0, c1)) < 1e-9)
    assert(math.abs(out(2L)._1 - d2) < 1e-9)
    // best chunk of doc1 is c0 (merge matched) — it outranks doc2
    assert(c0 > c1)
    assert(out(1L)._2 == 1 && out(2L)._2 == 2)
  }

  test("a query term with zero collection frequency is SKIPPED, not background-scored") {
    // "zzz" has ctf 0 → the cProb <= 0 guard continues — score equals
    // the data-only query's score exactly
    val withOov = WebTrackRerank.maxPassageRerank(eng, content,
        Seq(("q1", "data zzz")), k = 10, passageSz = 5, windowSz = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val dataOnly = WebTrackRerank.maxPassageRerank(eng, content,
        Seq(("q1", "data")), k = 10, passageSz = 5, windowSz = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(withOov == dataOnly)
  }

  test("tokenizeQuery: whitespace, lowercase, length > 1, stop set") {
    assert(WebTrackRerank.tokenizeQuery("The Data x AB data", Set("the")) ==
      Seq("data", "ab", "data"))
  }

  test("maxPsgScoringDV: passages from document vectors, scores replace the retrieval") {
    // the simple analyzer stops nothing, so the doc vector equals the
    // content token list — DV scores must equal the content-variant's
    // (clue.cc) when its stop set is empty and all tokens are > 1 char...
    // except doc2, whose 2-char tokens w6..w9 the content variant DROPS
    // (len > 1 keeps them — they are exactly 2 chars, so both keep them)
    val dv = WebTrackRerank.maxPsgScoringDV(eng,
        Seq(("q1", "data merge")), k = 10, passageSz = 5, windowSz = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3))).toMap
    val ct = WebTrackRerank.maxPassageRerank(eng, content,
        Seq(("q1", "data merge")), k = 10, passageSz = 5, windowSz = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3))).toMap
    assert(dv == ct)
    // and the absolute value is the hand-computed best chunk of doc1
    val c0 = lm(1, 3, 5) + lm(1, 1, 5)
    assert(math.abs(dv(1L)._1 - c0) < 1e-9)
  }

  test("dumpLines: clue.cc run-file bytes incl. the double space after the doc id") {
    import org.apache.spark.sql.functions._
    val ranked = WebTrackRerank.maxPsgScoringDV(eng,
      Seq(("201", "data merge")), k = 10, passageSz = 5, windowSz = 2)
    val lines = WebTrackRerank.dumpLines(ranked, runTag = "test",
        idCol = concat(lit("clueweb12-"), col("docId").cast("string")))
      .collect().map(r => r.getAs[String]("line"))
    val c0 = lm(1, 3, 5) + lm(1, 1, 5)
    val want = s"201 Q0 clueweb12-1  1 ${graft.apps.RunQuery.cppDouble(c0)} test"
    assert(lines.contains(want), s"got: ${lines.mkString(" | ")}")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Engine, QueryParser, Reformulate, RelevanceModel, ScoringRule}

/** SDM/FDM reformulation + clarity score
  * (reference: src/ReformulateQuery.cpp, src/StopStructureRemover.cpp,
  * src/QueryStopper.cpp, clarity/clarity.cpp).
  */
class ReformulateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- generator string shapes -------------------------------------

  test("sdm emits the Metzler-Croft #weight(terms, #1 pairs, #uw8 pairs)") {
    assert(Reformulate.sdm(Seq("a", "b", "c")) ===
      "#weight( 0.85 #combine(a b c) 0.1 #combine(#1(a b) #1(b c)) " +
        "0.05 #combine(#uw8(a b) #uw8(b c)))")
  }

  test("sdm single term degenerates to #combine (reference :145-146)") {
    assert(Reformulate.sdm(Seq("solo")) === "#combine(solo)")
    assert(Reformulate.fdm(Seq("solo")) === "#combine(solo)")
  }

  test("fdm emits every contiguous span with #1 and #uw{4*len}") {
    // spans of (a,b,c): (a b), (a b c), (b c)
    assert(Reformulate.fdm(Seq("a", "b", "c")) ===
      "#weight( 0.85 #combine(a b c) " +
        "0.1 #combine(#1(a b) #1(a b c) #1(b c)) " +
        "0.05 #combine(#uw8(a b) #uw12(a b c) #uw8(b c)))")
  }

  test("weighted-field sdm wraps each unit in a per-field #wsum") {
    val fields = Seq(Reformulate.WeightedField("title", "2"),
      Reformulate.WeightedField("body", "1"))
    val q = Reformulate.sdmFields(Seq("a", "b"), fields)
    assert(q ===
      "#weight( 0.85 #combine(#wsum( 2 a.title 1 a.body ) #wsum( 2 b.title 1 b.body )) " +
        "0.1 #combine(#wsum( 2 #1(a b).title 1 #1(a b).body )) " +
        "0.05 #combine(#wsum( 2 #uw8(a b).title 1 #uw8(a b).body )))")
  }

  test("cmuFdm mixes the six-field #wsum mixture with the FDM dependency model") {
    val q = Reformulate.cmuFdm(Seq("a", "b"))
    assert(q.startsWith("#weight( 1.0 #combine( #wsum( 1.0 a.url 1.0 a.title "))
    assert(q.contains("1.0 a.inlink )"))
    assert(q.contains("#weight( 0.85 #combine(a b) 0.1 #combine(#1(a b)) 0.05 #combine(#uw8(a b)))"))
    // single-term pathological branch (reference :204-213)
    val q1 = Reformulate.cmuFdm(Seq("solo"))
    assert(q1.contains("#weight( 0.85 solo 0.1 #1(solo) 0.05 #uw4(solo) )"))
  }

  // ---- query cleaning ----------------------------------------------

  test("transform downcases, strips stop structures + lite stopwords") {
    // "what is the " matches before "what is " (list order)
    assert(Reformulate.transform("What is the Big Apple") === "#combine( big apple )")
    // lite stop removes "and"/"of"
    assert(Reformulate.transform("history and kings of france") ===
      "#combine( history kings france )")
    // all-stopped query → marker (reference :338)
    assert(Reformulate.transform("is the") === "EMPTYQUERY")
    // genSDM end-to-end
    assert(Reformulate.transform("what is the big apple", Reformulate.GenSDM) ===
      Reformulate.sdm(Seq("big", "apple")))
  }

  test("stop-structure removal strips at most one prefix, in list order") {
    assert(Reformulate.removeStopStructures("why do we dream") === "dream")
    assert(Reformulate.removeStopStructures("middle why do we") === "middle why do we")
  }

  test("makeIndriFriendly strips reference punctuation but keeps letters") {
    assert(Reformulate.makeIndriFriendly("u.s.-a! (b)") === "u s  a   b ")
  }

  // ---- engine parity: reformulate-then-run == hand-written #weight --

  private val corpus = Seq(
    (1L, "alpha beta alpha gamma beta"),
    (2L, "beta beta delta alpha"),
    (3L, "alpha delta delta delta beta gamma alpha beta"),
    (4L, "gamma gamma beta alpha")
  )
  private val cfg = IndexConfig(analyzerMode = "simple", blockSize = 8, numBuckets = 2)
  private lazy val index = IndexBuilder.build(corpus.toDF("docId", "content"), cfg)
  private def newEngine() = {
    val e = new Engine(spark, index, cfg.analyzer, ScoringRule(method = "okapi"))
    e.setScoringRules("method:dirichlet")
    e
  }

  private def run(q: String): Map[Long, Double] =
    newEngine().runQuery(q, 100)
      .select("docId", "score").as[(Long, Double)].collect().toMap

  test("runQuery(sdm(terms)) == runQuery(hand-written #weight) bit-exactly") {
    val terms = Seq("alpha", "beta")
    val hand = "#weight( 0.85 #combine(alpha beta) 0.1 #combine(#1(alpha beta)) " +
      "0.05 #combine(#uw8(alpha beta)))"
    val got = run(Reformulate.sdm(terms))
    val want = run(hand)
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("fdm over two terms parses and scores every doc with either term") {
    val got = run(Reformulate.fdm(Seq("alpha", "gamma")))
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
  }

  // ---- clarity scalar oracle ---------------------------------------

  test("clarity == hand-computed KL(RM1 || collection LM) in bits") {
    val eng = newEngine()
    val p = RelevanceModel.Params(fbDocs = 3, fbTerms = 5)
    val q = "#combine(alpha beta)"
    val grams = RelevanceModel.rm1(eng, q, p).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(grams.nonEmpty)
    val tt = (5 + 4 + 8 + 4).toDouble // total term slots
    val ctf = Map("alpha" -> 6L, "beta" -> 7L, "gamma" -> 4L, "delta" -> 4L)
    val sum = grams.map(_._2).sum
    val kl = grams.map { case (t, w) =>
      w * math.log(w / (ctf(t).toDouble / tt)) / math.log(2.0)
    }.sum
    val want = kl / sum
    val got = RelevanceModel.clarity(eng, q, p)
    assert(math.abs(got - want) < 1e-9)
    // sanity: a corpus-typical query has finite clarity; the score of a
    // maximally-specific model would be higher than a flat one
    assert(!got.isNaN && !got.isInfinite)
  }
}

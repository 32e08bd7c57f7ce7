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

  test("sdm emits the Metzler-Croft #weight(terms, #1 pairs, #uw8 pairs) byte-exactly") {
    // trailing space after each pair piece — reference
    // src/ReformulateQuery.cpp:156-158 appends "#1(a b) " per pair
    assert(Reformulate.sdm(Seq("a", "b", "c")) ===
      "#weight( 0.85 #combine(a b c) 0.1 #combine(#1(a b) #1(b c) ) " +
        "0.05 #combine(#uw8(a b) #uw8(b c) ))")
  }

  test("sdm single term degenerates to #combine (reference :145-146)") {
    assert(Reformulate.sdm(Seq("solo")) === "#combine(solo)")
    assert(Reformulate.fdm(Seq("solo")) === "#combine(solo)")
  }

  test("fdm emits every contiguous span with #1 and #uw{4*len} byte-exactly") {
    // spans of (a,b,c): (a b), (a b c), (b c); the reference builds each
    // span with a trailing space and a newline after each window
    // (src/ReformulateQuery.cpp:284-301)
    assert(Reformulate.fdm(Seq("a", "b", "c")) ===
      "#weight( 0.85 #combine(a b c ) " +
        "0.1 #combine(#1(a b )\n#1(a b c )\n#1(b c )\n) " +
        "0.05 #combine(#uw8(a b )\n#uw12(a b c )\n#uw8(b c )\n))")
  }

  test("weighted-field sdm wraps each unit in a per-field #wsum over .(field) contexts") {
    // the reference emits the CONTEXT qualifier t.(f) — not the
    // restriction t.f — with ` )\n ` tails on the term units and ` )\n`
    // on the window units (src/ReformulateQuery.cpp:115-136)
    val fields = Seq(Reformulate.WeightedField("title", "2"),
      Reformulate.WeightedField("body", "1"))
    val q = Reformulate.sdmFields(Seq("a", "b"), fields)
    assert(q ===
      "#weight( 0.85 #combine(#wsum( 2 a.(title) 1 a.(body)  )\n " +
        "#wsum( 2 b.(title) 1 b.(body)  )\n ) " +
        "0.1 #combine(#wsum( 2 #1(a b).(title) 1 #1(a b).(body)  )\n) " +
        "0.05 #combine(#wsum( 2 #uw8(a b).(title) 1 #uw8(a b).(body)  )\n))")
    // and the parser evaluates every emitted unit (context lists on
    // terms and windows)
    QueryParser.parse(q) // must not throw
  }

  test("weighted-field fdm spans carry the trailing space inside the window") {
    val fields = Seq(Reformulate.WeightedField("title", "2"))
    val q = Reformulate.fdmFields(Seq("a", "b"), fields)
    assert(q ===
      "#weight( 0.85 #combine(#wsum( 2 a.(title)  )\n #wsum( 2 b.(title)  )\n ) " +
        "0.1 #combine(#wsum( 2 #1(a b ).(title)  )\n) " +
        "0.05 #combine(#wsum( 2 #uw8(a b ).(title)  )\n))")
    QueryParser.parse(q)
  }

  test("cmuFdm mixes the six-field #wsum mixture with the FDM dependency model") {
    val q = Reformulate.cmuFdm(Seq("a", "b"))
    assert(q.startsWith("#weight( 1.0 #combine ( #wsum (1.0 a.(url) 1.0 a.(title) "))
    assert(q.contains("1.0 a.(inlink)) "))
    assert(q.contains("#weight( 0.85 #combine(a b ) 0.1 #combine(#1(a b )\n) " +
      "0.05 #combine(#uw8(a b )\n))"))
    QueryParser.parse(q)
    // single-term pathological branch keeps the reference's double space
    // (reference :204-213)
    val q1 = Reformulate.cmuFdm(Seq("solo"))
    assert(q1.contains("#weight  ( 0.85 solo 0.1 #1(solo) 0.05 #uw4(solo) )"))
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

  // ---- reformulate application surface ------------------------------

  test("ReformulateApp: queries file bytes, numbering, genSDM flag, queryField blocks") {
    import graft.apps.ReformulateApp
    val xml =
      """<parameters>
        |  <genSDM>true</genSDM>
        |  <query><number>q7</number><text>alpha beta</text></query>
        |  <query>gamma delta</query>
        |  <outfile>reformed.param</outfile>
        |</parameters>""".stripMargin
    val (outfile, body) = ReformulateApp.run(xml, Nil)
    assert(outfile == "reformed.param")
    // numbered query keeps its number; the bare one gets queryOffset+i
    // with queryOffset HARDCODED 1 in the app (ReformulateQuery.cpp:24)
    assert(body ==
      "<parameters>\n" +
        "<query><number>q7</number>\n<text>" + Reformulate.sdm(Seq("alpha", "beta")) +
        "</text>\n</query>\n" +
        "<query><number>2</number>\n<text>" + Reformulate.sdm(Seq("gamma", "delta")) +
        "</text>\n</query>\n" +
        "</parameters>\n")
    // queryField blocks steer the weighted-field generator
    val xmlF =
      """<parameters>
        |  <genSDM>true</genSDM>
        |  <queryField><name>title</name><weight>2</weight></queryField>
        |  <query>alpha beta</query>
        |</parameters>""".stripMargin
    val (_, bodyF) = ReformulateApp.run(xmlF, Nil)
    assert(bodyF.contains("#wsum( 2 alpha.(title)  )"))
  }

  test("ReformulateApp: stop structures + lite stop run before generation; EMPTYQUERY") {
    import graft.apps.ReformulateApp
    val xml =
      """<parameters>
        |  <query>what is the alpha beta</query>
        |  <query>the of a</query>
        |</parameters>""".stripMargin
    val (outfile, body) = ReformulateApp.run(xml, Nil)
    assert(outfile == "queries.param") // reference default
    assert(body.contains("<text>#combine( alpha beta )</text>"))
    // an all-stopped query emits the reference's EMPTYQUERY marker
    assert(body.contains("<text>EMPTYQUERY</text>"))
    // -key=value overlays reach the tree (mode flip)
    val (_, sdmBody) = ReformulateApp.run(xml, Seq("-genSDM=true"))
    assert(sdmBody.contains(Reformulate.sdm(Seq("alpha", "beta"))))
  }

  test("ReformulateApp: CMU mixture weights flow from the parameter tree") {
    import graft.apps.ReformulateApp
    val xml =
      """<parameters>
        |  <genCMUFDM>true</genCMUFDM>
        |  <weightTitle>3.5</weightTitle>
        |  <weightMixture>0.9</weightMixture>
        |  <query>alpha beta</query>
        |</parameters>""".stripMargin
    val (_, body) = ReformulateApp.run(xml, Nil)
    assert(body.contains("#weight( 0.9 #combine ( #wsum (1.0 alpha.(url) 3.5 alpha.(title) "))
  }
}

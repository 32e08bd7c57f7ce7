package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index._
import graft.search._

/** Round-4 indrilang grammar completion + list-belief fidelity:
  *
  *  - context restriction `t.(f)` (reference: indrilang.g:225-257,
  *    context_list :794-827, builder src/InferenceNetworkBuilder
  *    .cpp:744-780, per-doc context length src/ListBeliefNode.cpp:24-56)
  *  - field-list restriction `t.f1,f2` = ExtentInside against the
  *    ExtentAnd intersection regions (indrilang.g:511-527,
  *    src/ExtentAndNode.cpp:33-74)
  *  - qualifiers on window nodes (`#1(a b).(sec)`), hyphen compounds
  *    (`a-b` → #1(a b), indrilang.g:587-623), `#wildcard(t)`
  *    (indrilang.g:640-649), extent restriction on #weight
  *    (indrilang.g:269)
  *  - the ListBeliefNode 4-arg score form for windows (two-stage /
  *    documentLambda-JM document components,
  *    include/indri/TwoStageTermScoreFunction.hpp:60-65,
  *    JelinekMercerTermScoreFunction.hpp:67-71)
  *  - the greedy non-overlap occurrence scan for BOTH per-document
  *    counts and collection stats (src/ListBeliefNode.cpp:58-91,
  *    src/ContextCountAccumulator.cpp:84-97)
  *
  * Every expected score is hand-computed from the reference formulas
  * with the engine's exact double arithmetic.
  */
class GrammarCompletionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // fixture: 4 docs, 14 token slots total
  //   doc1: [qax qbx qax qcx]  sec=[0,3)
  //   doc2: [qax qbx qbx]
  //   doc3: [qcx qcx qax qbx]  sec=[0,2)
  //   doc4: [qax qax qax]
  private lazy val fixture = {
    val rows = Seq(
      (1L, "<sec>qax qbx qax</sec> qcx"),
      (2L, "qax qbx qbx"),
      (3L, "<sec>qcx qcx</sec> qax qbx"),
      (4L, "qax qax qax")
    ).toDF("docId", "content")
    val cfg = IndexConfig(analyzerMode = "indri", blockSize = 16, numBuckets = 2,
      fields = Seq(FieldSpec("sec")))
    (IndexBuilder.build(rows, cfg), cfg)
  }

  private def engineWith(rule: String) = {
    val (idx, cfg) = fixture
    new Engine(spark, idx, cfg.analyzer, ScoringRule.parse(rule))
  }

  private def results(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  // ------------------------------------------------------------------
  // parser shapes
  // ------------------------------------------------------------------

  test("parser: context lists, field lists, combined qualifiers, windows") {
    assert(QueryParser.parse("qax.(sec)") ==
      ContextRestrictNode(TermNode("qax"), Seq("sec")))
    assert(QueryParser.parse("qax.(title,sec)") ==
      ContextRestrictNode(TermNode("qax"), Seq("title", "sec")))
    assert(QueryParser.parse("qax.title,body") ==
      FieldListRestrictNode(TermNode("qax"), Seq("title", "body")))
    assert(QueryParser.parse("qax.title.(sec)") ==
      ContextRestrictNode(FieldRestrictNode(TermNode("qax"), "title"), Seq("sec")))
    assert(QueryParser.parse("#1(qax qbx).(sec)") ==
      ContextRestrictNode(OdNode(1, Seq(TermNode("qax"), TermNode("qbx"))), Seq("sec")))
    assert(QueryParser.parse("#1(qax qbx).title") ==
      FieldRestrictNode(OdNode(1, Seq(TermNode("qax"), TermNode("qbx"))), "title"))
    assert(QueryParser.parse("<qax qbx>.(sec)") ==
      ContextRestrictNode(SynNode(Seq(TermNode("qax"), TermNode("qbx"))), Seq("sec")))
    // acronym dots are NOT field qualifiers (trailing dot, no paren)
    assert(QueryParser.parse("u.s.a.") == TermNode("u.s.a."))
  }

  test("parser: hyphen compounds, #wildcard, extent restriction on #weight") {
    assert(QueryParser.parse("qax-qbx-qcx") ==
      OdNode(1, Seq(TermNode("qax"), TermNode("qbx"), TermNode("qcx"))))
    // negative numbers and dangling dashes stay terms
    assert(QueryParser.parse("-5") == TermNode("-5"))
    assert(QueryParser.parse("x-") == TermNode("x-"))
    assert(QueryParser.parse("#wildcard(ret)") == WildcardNode("ret"))
    QueryParser.parse("#weight[sec]( 0.7 qax 0.3 qbx )") match {
      case ExtentRestrictNode("sec", None, WeightNode(cs)) =>
        assert(cs.map(_._1) == Seq(0.7, 0.3))
      case other => fail(s"unexpected $other")
    }
    QueryParser.parse("#not[sec]( qax )") match {
      case ExtentRestrictNode("sec", None, NotQNode(TermNode("qax"))) => ()
      case other => fail(s"unexpected $other")
    }
  }

  test("parser: quoted terms and #base64/#base64quote decode to (pre-stemmed) terms") {
    val M = graft.analysis.Analyzer.StemmedMarker.toString
    // a single quoted term is "considered stemmed" — looked up verbatim
    // (reference: indrilang.g:967-969)
    assert(QueryParser.parse("\"qax\"") == TermNode(M + "qax"))
    // base64("qax") = cWF4 → plain IndexTerm, full processTerm chain
    // (reference: indrilang.g:971-976)
    assert(QueryParser.parse("#base64(cWF4)") == TermNode("qax"))
    assert(QueryParser.parse("#base64( cWF4 )") == TermNode("qax"))
    // base64quote → pre-stemmed (reference: indrilang.g:977-983)
    assert(QueryParser.parse("#base64quote(cWF4)") == TermNode(M + "qax"))
    // decoded payloads never pass through term sugar: base64("a-b") stays
    // ONE term, not a hyphen compound ("YS1i")
    assert(QueryParser.parse("#base64(YS1i)") == TermNode("a-b"))
    // qualifiers still attach after the closing paren (qualifiedTerm)
    assert(QueryParser.parse("#base64(cWF4).(sec)") ==
      ContextRestrictNode(TermNode("qax"), Seq("sec")))
    assert(QueryParser.parse("#combine(#base64(cWF4) qbx)") ==
      CombineNode(Seq(TermNode("qax"), TermNode("qbx"))))
    // processTerm strips the marker and bypasses the chain entirely
    val an = graft.analysis.Analyzer(mode = "indri",
      stopwords = Set("qax"), stemmer = graft.analysis.PorterStemmer)
    assert(an.processTerm("qax") == null)              // stopped
    assert(an.processTerm(M + "qax") == "qax")          // verbatim
    assert(an.processTerm("Merges") == "merg")          // normalize+stem
    assert(an.processTerm(M + "Merges") == "Merges")    // verbatim
  }

  test("quoted / base64 terms score verbatim: hits equal the plain term, misses take background") {
    val eng = engineWith("method:dirichlet")
    val mu = 2500.0
    // plain-term reference scores for qax (ctf 7 / |C| 14)
    val plain = results(eng.runQuery("qax", 10))
    // "qax" and #base64quote(cWF4) look up the posting key verbatim → hit
    assert(results(eng.runQuery("\"qax\"", 10)) == plain)
    assert(results(eng.runQuery("#base64quote(cWF4)", 10)) == plain)
    // #base64(UUFY) decodes to "QAX" → processTerm lowercases → qax
    assert(results(eng.runQuery("#base64(UUFY)", 10)) == plain)
    // but QUOTED "QAX" skips normalization → no postings → background
    // leaf: cf defaults to 1/(2·|C|) for a zero-ctf term (reference:
    // src/TermScoreFunctionFactory.cpp:50-53); candidates come from qcx
    val cfOov = 1.0 / (2.0 * 14.0)
    val cfQcx = 3.0 / 14.0
    def oov(dl: Double) = math.log((0.0 + mu * cfOov) / (dl + mu))
    def qcx(tf: Double, dl: Double) = math.log((tf + mu * cfQcx) / (dl + mu))
    val got = results(eng.runQuery("#combine(\"QAX\" qcx)", 10))
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L) == 0.5 * oov(4.0) + 0.5 * qcx(1.0, 4.0))
    assert(got(3L) == 0.5 * oov(4.0) + 0.5 * qcx(2.0, 4.0))
  }

  test("setScoringRules(list): field:/operator: selectors pick per-scorer smoothing, last match wins") {
    val eng = engineWith("method:okapi") // list call overrides this below
    eng.setScoringRules(Seq(
      "method:dirichlet,mu:2500",
      "field:sec,method:dirichlet,mu:500",
      "operator:window,method:dirichlet,mu:100"))
    // leaf rules: qax.(sec) → mu 500 (field:sec), plain qax → mu 2500
    // (catch-all), #1(qax qbx) → mu 100 (operator:window)
    val cfCtx = 2.0 / 5.0   // qax-in-sec / Σ sec lengths
    val cfQax = 7.0 / 14.0
    val cfWin = 3.0 / 14.0  // #1(qax qbx) occurrences: docs 1,2,3
    def d(occ: Double, len: Double, mu: Double, cf: Double) =
      math.log((occ + mu * cf) / (len + mu))
    val got = results(eng.runQuery("#combine(qax.(sec) qax #1(qax qbx))", 10))
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    def exp(ctxOcc: Double, ctxLen: Double, tf: Double, dl: Double, win: Double) = {
      val w = 1.0 / 3.0 // the engine folds Σ w·s, not Σs/3 — ULP-exact
      w * d(ctxOcc, ctxLen, 500.0, cfCtx) + w * d(tf, dl, 2500.0, cfQax) +
        w * d(win, dl, 100.0, cfWin)
    }
    assert(got(1L) == exp(2, 3, 2, 4, 1))
    assert(got(2L) == exp(0, 0, 1, 3, 1)) // no sec context → fn(0,0)
    assert(got(3L) == exp(0, 2, 1, 4, 1))
    assert(got(4L) == exp(0, 0, 3, 3, 0))
    // LAST matching rule wins (the walker iterates in reverse)
    eng.setScoringRules(Seq(
      "field:sec,method:dirichlet,mu:500",
      "field:sec,method:dirichlet,mu:900"))
    val got2 = results(eng.runQuery("qax.(sec)", 10))
    assert(got2(1L) == d(2, 3, 900.0, cfCtx))
    // and scorers matched by NO rule take the walker default
    // method:dirichlet,mu:2500 (NOT the engine's previous single rule)
    val got3 = results(eng.runQuery("qax", 10))
    assert(got3(4L) == d(3, 3, 2500.0, cfQax))
    // a subsequent single-spec call clears the list (back-compat)
    eng.setScoringRules("method:dirichlet")
    assert(results(eng.runQuery("qax", 10)) == got3)
    // malformed rule component (no colon) → a NAMED parse error,
    // not a MatchError
    val err = intercept[IllegalArgumentException] {
      eng.setScoringRules(Seq("method:dirichlet,banana"))
    }
    assert(err.getMessage.contains("banana"))
  }

  // ------------------------------------------------------------------
  // context restriction scoring
  // ------------------------------------------------------------------

  test("t.(f): context extents drive length, background and candidates (dirichlet)") {
    val eng = engineWith("method:dirichlet")
    // occurrences of qax inside sec: doc1 → 2 (pos 0,2 in [0,3)),
    // doc3 → 0 (qax@2 outside [0,2)); corpus context size 3 + 2 = 5
    val cf = 2.0 / 5.0
    val mu = 2500.0
    val exp1 = math.log((2.0 + mu * cf) / (3.0 + mu))
    val exp3 = math.log((0.0 + mu * cf) / (2.0 + mu))
    val got = results(eng.runQuery("qax.(sec)", 10))
    assert(got.keySet == Set(1L, 3L)) // doc2/doc4 have no sec context
    assert(got(1L) == exp1, s"doc1 ${got(1L)} != $exp1")
    assert(got(3L) == exp3, s"doc3 ${got(3L)} != $exp3")
  }

  test("t.(f) under #combine mixes with plain terms; missing-context docs take fn(0,0)") {
    val eng = engineWith("method:dirichlet")
    val mu = 2500.0
    val cfCtx = 2.0 / 5.0      // qax-in-sec / total sec length
    val cfQcx = 3.0 / 14.0     // plain qcx ctf / |C|
    def ctxScore(occ: Double, ctxLen: Double) = math.log((occ + mu * cfCtx) / (ctxLen + mu))
    def qcxScore(tf: Double, dl: Double) = math.log((tf + mu * cfQcx) / (dl + mu))
    val got = results(eng.runQuery("#combine(qax.(sec) qcx)", 10))
    // candidates: union — doc1 (both), doc3 (both), doc2 none (no sec, no
    // qcx → absent entirely), doc4 none
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L) == 0.5 * ctxScore(2.0, 3.0) + 0.5 * qcxScore(1.0, 4.0))
    assert(got(3L) == 0.5 * ctxScore(0.0, 2.0) + 0.5 * qcxScore(2.0, 4.0))
  }

  test("setSingleBackgroundModel: in-context foreground, plain-collection background") {
    // the reference's NoContextCountGraphCopier strips the context from
    // the STATS pass only (src/QueryEnvironment.cpp:953-966): the
    // foreground still counts qax inside sec over the sec length, but
    // the smoothing background becomes ctf(qax)/|C| = 7/14
    val eng = engineWith("method:dirichlet")
    eng.setSingleBackgroundModel(true)
    val cf = 7.0 / 14.0
    val mu = 2500.0
    val got = results(eng.runQuery("qax.(sec)", 10))
    assert(got == Map(
      1L -> math.log((2.0 + mu * cf) / (3.0 + mu)),
      3L -> math.log((0.0 + mu * cf) / (2.0 + mu))))
  }

  // ------------------------------------------------------------------
  // field-list restriction (ExtentAnd)
  // ------------------------------------------------------------------

  test("t.f1,f2 keeps matches inside the intersection regions") {
    val rows = Seq(
      (1L, "<sec>qdx <b>qex qdx</b></sec> qex"),
      (2L, "<b>qex</b> <sec>qdx</sec>")
    ).toDF("docId", "content")
    val cfg = IndexConfig(analyzerMode = "indri", blockSize = 16, numBuckets = 2,
      fields = Seq(FieldSpec("sec"), FieldSpec("b")))
    val idx = IndexBuilder.build(rows, cfg)
    val eng = new Engine(spark, idx, cfg.analyzer, ScoringRule(method = "dirichlet"))
    // doc1: sec=[0,3), b=[1,3) → intersection [1,3); qex@1 and qdx@2 in;
    // qdx@0 and qex@3 out. doc2: b=[0,1), sec=[1,2) → disjoint → empty.
    val qdx = eng.evaluateRaw(QueryParser.parse("qdx.sec,b")).df
      .select("docId", "begins").as[(Long, Seq[Int])].collect().toMap
    assert(qdx.keySet == Set(1L) && qdx(1L) == Seq(2))
    val qex = eng.evaluateRaw(QueryParser.parse("qex.sec,b")).df
      .select("docId", "begins").as[(Long, Seq[Int])].collect().toMap
    assert(qex.keySet == Set(1L) && qex(1L) == Seq(1))
  }

  // ------------------------------------------------------------------
  // 4-arg list-belief form: two-stage + documentLambda JM over windows
  // ------------------------------------------------------------------

  test("two-stage windows use the document-frequency Dirichlet prior (4-arg form)") {
    val eng = engineWith("method:two,mu:2500,lambda:0.4")
    val mu = 2500.0
    val lambda = 0.4
    val cfW = 3.0 / 14.0   // od1(qax qbx): one match in each of docs 1,2,3
    val cfQ = 3.0 / 14.0   // qcx ctf 3
    // window leaf: ListBeliefNode 4-arg — documentFrequency = tf/dl
    def winScore(tf: Double, dl: Int): Double = {
      val documentFrequency = tf / dl.toDouble
      val dirichlet = (tf + mu * documentFrequency) / (dl.toDouble + mu)
      math.log((1 - lambda) * dirichlet + lambda * cfW)
    }
    // plain term: frequency-list 2-arg — collection prior
    def termScore(tf: Double, dl: Int): Double = {
      val dirichlet = (tf + mu * cfQ) / (dl.toDouble + mu)
      math.log((1 - lambda) * dirichlet + lambda * cfQ)
    }
    val expected = Map(
      1L -> (0.5 * winScore(1.0, 4) + 0.5 * termScore(1.0, 4)),
      2L -> (0.5 * winScore(1.0, 3) + 0.5 * termScore(0.0, 3)),
      3L -> (0.5 * winScore(1.0, 4) + 0.5 * termScore(2.0, 4)))
    for (useDaat <- Seq(true, false)) {
      val got = results(eng.runQuery("#combine(#1(qax qbx) qcx)", 10, useDaat = useDaat))
      assert(got == expected, s"useDaat=$useDaat: $got != $expected")
    }
  }

  test("documentLambda JM windows mix the document component (4-arg form)") {
    val eng = engineWith("method:jm,collectionLambda:0.3,documentLambda:0.2")
    val collectionLambda = 0.3
    val documentLambda = 0.2
    val contextLambda = 1 - collectionLambda - documentLambda
    val cfW = 3.0 / 14.0
    def winScore(tf: Double, dl: Int): Double =
      math.log(contextLambda * (tf / dl.toDouble) + documentLambda * (tf / dl.toDouble) +
        collectionLambda * cfW)
    val expected = Map(
      1L -> winScore(1.0, 4), 2L -> winScore(1.0, 3), 3L -> winScore(1.0, 4))
    for (useDaat <- Seq(true, false)) {
      val got = results(eng.runQuery("#1(qax qbx)", 10, useDaat = useDaat))
      assert(got == expected, s"useDaat=$useDaat: $got != $expected")
    }
  }

  // ------------------------------------------------------------------
  // greedy non-overlap occurrence counting
  // ------------------------------------------------------------------

  test("overlapping #uwN matches count once (per-doc and collection stats)") {
    val eng = engineWith("method:dirichlet")
    // uw4(qax qbx) raw matches: doc1 (0,2)+(1,3) OVERLAP → 1;
    // doc2 (0,2) → 1; doc3 (2,4) → 1; doc4 none. occ = 3 (plain count 4)
    assert(eng.expressionCount("#uw4(qax qbx)") == 3L)
    val mu = 2500.0
    val cf = 3.0 / 14.0
    def s(tf: Double, dl: Int) = math.log((tf + mu * cf) / (dl.toDouble + mu))
    val expected = Map(1L -> s(1.0, 4), 2L -> s(1.0, 3), 3L -> s(1.0, 4))
    for (useDaat <- Seq(true, false)) {
      val got = results(eng.runQuery("#uw4(qax qbx)", 10, useDaat = useDaat))
      assert(got == expected, s"useDaat=$useDaat: $got != $expected")
    }
  }

  test("repeated-term #odN overlaps dedup: od1(qax qax)") {
    val eng = engineWith("method:dirichlet")
    // doc4 [qax qax qax]: raw matches (0,2),(1,3) overlap → tf 1; no
    // other doc has adjacent qax qax
    assert(eng.expressionCount("#1(qax qax)") == 1L)
    val got = results(eng.runQuery("#1(qax qax)", 10))
    val exp = math.log((1.0 + 2500.0 * (1.0 / 14.0)) / (3.0 + 2500.0))
    assert(got == Map(4L -> exp))
  }

  test("hyphen compound scores exactly like its #1 window") {
    val eng = engineWith("method:dirichlet")
    val viaHyphen = results(eng.runQuery("qax-qbx", 10))
    val viaOd = results(eng.runQuery("#1(qax qbx)", 10))
    assert(viaHyphen == viaOd && viaHyphen.nonEmpty)
  }

  // ------------------------------------------------------------------
  // extent restriction on #weight
  // ------------------------------------------------------------------

  test("#or/#max/#sum/#wsum/#not under extent restriction fold per extent") {
    val eng = engineWith("method:dirichlet")
    val mu = 2500.0
    val cfA = 7.0 / 14.0
    val cfB = 4.0 / 14.0
    def s(tf: Double, ctx: Int, cf: Double) = math.log((tf + mu * cf) / (ctx.toDouble + mu))
    // doc1 sec=[0,3): qax tf2 qbx tf1; doc3 sec=[0,2): both 0
    def scores(q: String): Map[(Long, Int, Int), Double] =
      eng.runExtentQuery(q, 10).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    def orF(a: Double, b: Double) =
      math.log(1.0 - (1.0 - math.exp(a)) * (1.0 - math.exp(b)))
    assert(scores("#or[sec](qax qbx)") == Map(
      (1L, 0, 3) -> orF(s(2, 3, cfA), s(1, 3, cfB)),
      (3L, 0, 2) -> orF(s(0, 2, cfA), s(0, 2, cfB))))
    assert(scores("#max[sec](qax qbx)") == Map(
      (1L, 0, 3) -> math.max(s(2, 3, cfA), s(1, 3, cfB)),
      (3L, 0, 2) -> math.max(s(0, 2, cfA), s(0, 2, cfB))))
    def wsumF(wa: Double, a: Double, wb: Double, b: Double) =
      math.log(wa * math.exp(a) + wb * math.exp(b))
    assert(scores("#sum[sec](qax qbx)") == Map(
      (1L, 0, 3) -> wsumF(0.5, s(2, 3, cfA), 0.5, s(1, 3, cfB)),
      (3L, 0, 2) -> wsumF(0.5, s(0, 2, cfA), 0.5, s(0, 2, cfB))))
    assert(scores("#wsum[sec](2 qax 1 qbx)") == Map(
      (1L, 0, 3) -> wsumF(2.0 / 3.0, s(2, 3, cfA), 1.0 / 3.0, s(1, 3, cfB)),
      (3L, 0, 2) -> wsumF(2.0 / 3.0, s(0, 2, cfA), 1.0 / 3.0, s(0, 2, cfB))))
    assert(scores("#not[sec](qax)") == Map(
      (1L, 0, 3) -> math.log1p(-math.exp(s(2, 3, cfA))),
      (3L, 0, 2) -> math.log1p(-math.exp(s(0, 2, cfA)))))
  }

  test("#weight[f] scores each extent with normalized weights") {
    val eng = engineWith("method:dirichlet")
    val mu = 2500.0
    val cfA = 7.0 / 14.0 // qax ctf 7
    val cfB = 4.0 / 14.0 // qbx ctf 4
    def s(tf: Double, ctx: Int, cf: Double) = math.log((tf + mu * cf) / (ctx.toDouble + mu))
    // doc1 sec=[0,3): qax tf2, qbx tf1; doc3 sec=[0,2): both 0
    val exp1 = 0.7 * s(2.0, 3, cfA) + 0.3 * s(1.0, 3, cfB)
    val exp3 = 0.7 * s(0.0, 2, cfA) + 0.3 * s(0.0, 2, cfB)
    val rows = eng.runExtentQuery("#weight[sec](0.7 qax 0.3 qbx)", 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(rows.toSet == Set((1L, 0, 3, exp1), (3L, 0, 2, exp3)))
  }

  test("parser hardening: phrase qualifiers, #not arity, passage/rule tolerance, NEXI case") {
    import graft.search._
    // DOT qualifiers attach to a multi-word quoted phrase like any raw
    // node — previously `.title` lexed as a literal term and the field
    // restriction was silently dropped
    assert(QueryParser.parse("\"new york\".title") ==
      FieldRestrictNode(OdNode(1, Seq(TermNode("new"), TermNode("york"))), "title"))
    // #not takes exactly one child (indrilang.g notNode)
    intercept[IllegalArgumentException](QueryParser.parse("#not(a b)"))
    intercept[IllegalArgumentException](QueryParser.parse("#not()"))
    // malformed passage spec → parse diagnostic, not MatchError
    val e = intercept[IllegalArgumentException](
      QueryParser.parse("#combine[passage50](a b)"))
    assert(e.getMessage.contains("passage"))
    // rule strings tolerate colon-less components like the reference
    // factory (the 'method:jm,lambda,0.5' comma-tail quirk): garbage
    // keys are dropped, defaults hold
    assert(ScoringRule.parse("method:jm,lambda,0.5").lambda == 0.4)
    assert(ScoringRule.parse("dirichlet,mu:900").method == "dirichlet")
    assert(ScoringRule.parse("dirichlet,mu:900").mu == 900.0)
    // NEXI paths and filter fields lowercase to match indexed tag names
    assert(NexiParser.parse("//SEC[about(., x)]").path == Seq("sec"))
    assert(NexiParser.parse("//art[about(.//Title, x)]")
      .nexiClauses.head.asInstanceOf[NexiParser.AboutClause].rel == Some("title"))
    // '_'-embedded connectors and a path-step 'and' never split a clause
    assert(NexiParser.parse("//sec[.//q_and_a > 5]").nexiClauses ==
      Seq(NexiParser.NumericClause("q_and_a", "greater", 5)))
    assert(NexiParser.parse("//sec[.//and > 5]").nexiClauses ==
      Seq(NexiParser.NumericClause("and", "greater", 5)))
  }
}

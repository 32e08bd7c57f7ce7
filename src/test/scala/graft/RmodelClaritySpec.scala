package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.apps.{ClarityApp, Rmodel, RunQuery}
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Engine, RelevanceModel, ScoringRule}

/** The rmodel / clarity application surfaces: n-gram relevance models
  * (counts, OOV breaks, posterior weighting, smoothed gram scores)
  * against hand-computed scalar expectations, plus the C++ output-line
  * formats (reference: rmodel/rmodel.cpp, clarity/clarity.cpp,
  * src/RelevanceModel.cpp).
  */
class RmodelClaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // tiny fixed corpus (lengths 5/3/4/3, total 15)
  private val corpus = Seq(
    (1L, "alpha beta alpha beta gamma"),
    (2L, "beta gamma delta"),
    (3L, "alpha beta delta delta"),
    (4L, "gamma gamma alpha")
  )
  private val cfg = IndexConfig(analyzerMode = "simple", blockSize = 8, numBuckets = 2)
  private lazy val index = IndexBuilder.build(corpus.toDF("docId", "content"), cfg)
  private def newEngine() =
    new Engine(spark, index, cfg.analyzer, ScoringRule(method = "dirichlet"))

  private val T = 15.0
  private val dl = Map(1L -> 5, 2L -> 3, 3L -> 4, 4L -> 3)

  private def dirichlet(tf: Double, ctf: Long, doclen: Int): Double =
    math.log((tf + 2500.0 * (ctf.toDouble / T)) / (doclen + 2500.0))

  /** posterior over the top-k docs of single-term query `beta` (ctf=4,
    * in docs 1,2,3 with tf 2,1,1)
    */
  private def betaPosterior(k: Int): Map[Long, Double] = {
    val scores = Seq(1L -> dirichlet(2, 4, 5), 2L -> dirichlet(1, 4, 3),
      3L -> dirichlet(1, 4, 4)).sortBy(-_._2).take(k)
    val mx = scores.map(_._2).max
    val exps = scores.map { case (d, s) => (d, math.exp(s - mx)) }
    val z = exps.map(_._2).sum
    exps.map { case (d, e) => (d, e / z) }.toMap
  }

  test("gramModel maxGrams=1 unsmoothed matches rm1 term-for-term") {
    val eng = newEngine()
    val got = RelevanceModel.gramModel(eng, "beta",
      RelevanceModel.GramParams(documents = 3, maxGrams = 1))
      .select("gram", "weight").as[(String, Double)].collect().toMap
    val rm = RelevanceModel.rm1(eng, "beta",
      RelevanceModel.Params(fbDocs = 3, fbTerms = 100))
      .as[(String, Double)].collect().toMap
    assert(got.keySet == rm.keySet)
    // per-doc contributions sum in engine-chosen order on both sides —
    // tolerance, not bit-equality
    for ((t, v) <- rm) assert(math.abs(got(t) - v) < 1e-12, t)
  }

  test("bigram weights match the scalar oracle (posterior · count/doclen)") {
    val eng = newEngine()
    val w = betaPosterior(3)
    val got = RelevanceModel.gramModel(eng, "beta",
      RelevanceModel.GramParams(documents = 3, maxGrams = 2))
      .select("gram", "n", "weight").as[(String, Int, Double)]
      .collect().map(r => (r._1, r._3)).toMap
    // bigram counts: d1 {alpha beta:2, beta alpha:1, beta gamma:1},
    // d2 {beta gamma:1, gamma delta:1}, d3 {alpha beta:1, beta delta:1,
    // delta delta:1}
    def exp(pairs: (Long, Int)*) =
      pairs.map { case (d, c) => w(d) * c.toDouble / dl(d) }.sum
    assert(math.abs(got("alpha beta") - exp(1L -> 2, 3L -> 1)) < 1e-12)
    assert(math.abs(got("beta gamma") - exp(1L -> 1, 2L -> 1)) < 1e-12)
    assert(math.abs(got("beta alpha") - exp(1L -> 1)) < 1e-12)
    assert(math.abs(got("gamma delta") - exp(2L -> 1)) < 1e-12)
    assert(math.abs(got("delta delta") - exp(3L -> 1)) < 1e-12)
    // unigrams ride along in the same table (n=1)
    assert(math.abs(got("beta") - exp(1L -> 2, 2L -> 1, 3L -> 1)) < 1e-12)
    // nothing crosses a document end
    assert(!got.contains("gamma beta"))
  }

  test("a stopped slot breaks grams through it (the OOV break)") {
    val stopCfg = cfg.copy(stopwords = Set("the"))
    val idx = IndexBuilder.build(Seq(
      (1L, "alpha the beta"), (2L, "alpha beta gamma")).toDF("docId", "content"),
      stopCfg)
    val eng = new Engine(spark, idx, stopCfg.analyzer, ScoringRule(method = "dirichlet"))
    val got = RelevanceModel.gramModelFromResults(eng,
      Seq(1L -> 0.0, 2L -> 0.0), RelevanceModel.GramParams(maxGrams = 2))
      .select("gram").as[String].collect().toSet
    // d1 has NO valid bigram: "alpha ∅ beta" is non-consecutive
    // (reference: positions[k]==0 breaks the gram and all longer ones)
    assert(got == Set("alpha", "beta", "gamma", "alpha beta", "beta gamma"))
  }

  test("smoothed grams (JM): every feedback doc contributes background mass") {
    val eng = newEngine()
    val w = betaPosterior(3)
    val got = RelevanceModel.gramModel(eng, "beta",
      RelevanceModel.GramParams(documents = 3, maxGrams = 1,
        smoothing = Some(ScoringRule(method = "jm", lambda = 0.4))))
      .select("gram", "weight").as[(String, Double)].collect().toMap
    // JM score = 0.6·occ/dl + 0.4·ctf/T; zero-occurrence docs still add
    // the collection component (reference: RelevanceModel.cpp:209-232)
    def jm(occ: Double, doclen: Int, ctf: Double) =
      0.6 * occ / doclen + 0.4 * ctf / T
    def expFor(ctf: Double, occs: Map[Long, Int]) =
      w.map { case (d, p) => p * jm(occs.getOrElse(d, 0).toDouble, dl(d), ctf) }.sum
    assert(math.abs(got("beta") - expFor(4, Map(1L -> 2, 2L -> 1, 3L -> 1))) < 1e-12)
    // delta occurs in feedback docs 2 and 3 only; doc 1 contributes pure
    // background 0.4·ctf/T
    assert(math.abs(got("delta") - expFor(3, Map(2L -> 1, 3L -> 2))) < 1e-12)
    // gamma in docs 1,2 (+2 outside feedback set): ctf=4
    assert(math.abs(got("gamma") - expFor(4, Map(1L -> 1, 2L -> 1))) < 1e-12)
  }

  test("smoothed bigrams pull their background from a corpus gram count") {
    val eng = newEngine()
    val w = betaPosterior(3)
    val got = RelevanceModel.gramModel(eng, "beta",
      RelevanceModel.GramParams(documents = 3, maxGrams = 2,
        smoothing = Some(ScoringRule(method = "jm", lambda = 0.4))))
      .select("gram", "weight").as[(String, Double)].collect().toMap
    // corpus count of "alpha beta" = 3 (d1 ×2, d3 ×1); of "gamma gamma"
    // = 1 (d4, OUTSIDE the feedback set — must still be counted)
    def jm(occ: Double, doclen: Int, bg: Double) = 0.6 * occ / doclen + 0.4 * bg / T
    val expAB = w.map { case (d, p) =>
      p * jm(Map(1L -> 2, 3L -> 1).getOrElse(d, 0).toDouble, dl(d), 3.0) }.sum
    assert(math.abs(got("alpha beta") - expAB) < 1e-12)
    assert(!got.contains("gamma gamma")) // not in any feedback doc
  }

  test("rmodel parameter surface, usage gate and gram lines") {
    val xml =
      """<parameters>
        |  <index>/tmp/r1</index><server>/tmp/r2</server>
        |  <query>beta</query><query><text>alpha gamma</text></query>
        |  <documents>7</documents><maxGrams>3</maxGrams>
        |</parameters>""".stripMargin
    val p = Rmodel.overlay(Rmodel.parseParams(xml), Seq("-maxGrams=2", "-query=delta"))
    assert(p.indexPaths == Seq("/tmp/r1", "/tmp/r2"))
    assert(p.queries == Seq("beta", "alpha gamma", "delta"))
    assert(p.documents == 7 && p.maxGrams == 2)
    intercept[IllegalArgumentException] {
      Rmodel.validate(Rmodel.Params(indexPaths = Seq("x")))
    }
    // printGrams format: setw(15) right-aligned %.15g weight, term
    // count, terms, trailing space (rmodel.cpp:63-77)
    assert(Rmodel.gramWeightText(0.0625) == "         0.0625")
    val eng = newEngine()
    val lines = Rmodel.gramLines("beta",
      RelevanceModel.gramModel(eng, "beta",
        RelevanceModel.GramParams(documents = 3, maxGrams = 2)))
    assert(lines.head == "# query: beta")
    assert(lines.tail.forall(_.matches("\\s*[0-9.e+-]+ \\d( [a-z]+)+ ")))
    assert(lines.exists(_.endsWith(" 2 alpha beta ")))
  }

  test("clarity app: effective default smoothing is JM λ=0.4 (the comma quirk)") {
    // the reference default string "method:jm,lambda,0.5" never parses
    // its lambda (key:value split on commas) — effective λ stays 0.4
    val r = ClarityApp.parseSmoothing("method:jm,lambda,0.5")
    assert(r.method == "jm" && r.lambda == 0.4)
    val r2 = ClarityApp.parseSmoothing("method:jm,lambda:0.5")
    assert(r2.lambda == 0.5)
  }

  test("clarity rows and score match the scalar oracle") {
    val eng = newEngine()
    val p = ClarityApp.Params(queries = Seq("beta"), documents = 3, terms = 2)
    val rows = ClarityApp.clarityRows(eng, "beta", p)
    assert(rows.size == 2)
    // oracle: smoothed unigram RM (JM λ=0.4) top-2 grams, then
    // contribution = pwq·log2(pwq/(ctf/T))
    val w = betaPosterior(3)
    def jm(occ: Double, doclen: Int, ctf: Double) = 0.6 * occ / doclen + 0.4 * ctf / T
    val ctfs = Map("alpha" -> 4.0, "beta" -> 4.0, "gamma" -> 4.0, "delta" -> 3.0)
    val occs = Map( // occurrences in feedback docs 1,2,3
      "alpha" -> Map(1L -> 2, 3L -> 1), "beta" -> Map(1L -> 2, 2L -> 1, 3L -> 1),
      "gamma" -> Map(1L -> 1, 2L -> 1), "delta" -> Map(2L -> 1, 3L -> 2))
    val weights = ctfs.map { case (t, ctf) =>
      t -> w.map { case (d, p0) =>
        p0 * jm(occs(t).getOrElse(d, 0).toDouble, dl(d), ctf) }.sum
    }
    val top2 = weights.toSeq.sortBy { case (t, v) => (-v, t) }.take(2)
    for (((t, pwq), i) <- top2.zipWithIndex) {
      assert(rows(i)._1 == t)
      assert(math.abs(rows(i)._2 - pwq) < 1e-12)
      val contrib = pwq * math.log(pwq / (ctfs(t) / T)) / math.log(2.0)
      assert(math.abs(rows(i)._3 - contrib) < 1e-12)
    }
    val expScore = top2.map { case (t, pwq) =>
      pwq * math.log(pwq / (ctfs(t) / T)) / math.log(2.0) }.sum / top2.map(_._2).sum
    assert(math.abs(ClarityApp.clarityOf(rows) - expScore) < 1e-12)
    val lines = ClarityApp.clarityLines("beta", rows)
    assert(lines.head.startsWith("# query: beta = 2 "))
    assert(lines.size == 3)
  }

  test("clarity parameter surface and overlay") {
    val xml =
      """<parameters>
        |  <index>/tmp/r1</index><query>beta</query>
        |  <documents>8</documents><terms>4</terms>
        |  <smoothing>method:dirichlet,mu:500</smoothing>
        |</parameters>""".stripMargin
    val p = ClarityApp.overlay(ClarityApp.parseParams(xml), Seq("-terms=6"))
    assert(p.documents == 8 && p.terms == 6)
    assert(ClarityApp.parseSmoothing(p.smoothing).mu == 500.0)
    intercept[IllegalArgumentException] {
      ClarityApp.validate(ClarityApp.Params(queries = Seq("q")))
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Engine, QueryParser, ScoringRule}

/** Prior / length-prior / weighted-synonym / deleted-docs / doc-vector
  * semantics against hand-computed scalar expectations
  * (reference: src/PriorNode.cpp, src/LengthPriorNode.cpp,
  * src/WeightedExtentOrNode.cpp, src/DeletedDocumentList.cpp,
  * include/indri/TermList.hpp).
  */
class BeliefOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // tiny fixed corpus
  private val corpus = Seq(
    (1L, "alpha beta alpha gamma"),       // len 4
    (2L, "beta beta delta"),              // len 3
    (3L, "alpha delta delta delta beta"), // len 5
    (4L, "gamma gamma")                   // len 2
  )
  private val cfg = IndexConfig(analyzerMode = "simple", blockSize = 8, numBuckets = 2)
  private lazy val index = IndexBuilder.build(corpus.toDF("docId", "content"), cfg)
  private def newEngine(method: String) =
    new Engine(spark, index, cfg.analyzer, ScoringRule(method = method))

  private val T = 4L + 3L + 5L + 2L // total terms = 14
  private val N = 4L
  private val dl = Map(1L -> 4, 2L -> 3, 3L -> 5, 4L -> 2)

  private def dirichlet(tf: Double, ctf: Long, doclen: Int): Double =
    math.log((tf + 2500.0 * (ctf.toDouble / T)) / (doclen + 2500.0))

  private def okapi(occ: Double, dfT: Double, doclen: Int): Double = {
    val idf = math.log((N - dfT + 0.5) / (dfT + 0.5))
    val avgdl = T.toDouble / N
    idf * 2.2 * occ / (occ + 0.3 + (0.9 / avgdl) * doclen)
  }

  test("#prior(name) joins the stored log-prior; missing docs get default") {
    val eng = newEngine("dirichlet")
    // prior only for docs 1 and 3
    eng.setPrior("p", Seq((1L, math.log(0.9)), (3L, math.log(0.1)))
      .toDF("docId", "logPrior"), defaultLog = math.log(0.5))
    val got = eng.evaluate(QueryParser.parse("#combine(beta #prior(p))")).df
      .select("docId", "score").as[(Long, Double)].collect().toMap
    // beta: ctf=4 (d1:1, d2:2, d3:1)
    def expected(d: Long, tf: Double, lp: Double) =
      0.5 * dirichlet(tf, 4, dl(d)) + 0.5 * lp
    assert(math.abs(got(1L) - expected(1L, 1, math.log(0.9))) < 1e-12)
    assert(math.abs(got(2L) - expected(2L, 2, math.log(0.5))) < 1e-12) // default prior
    assert(math.abs(got(3L) - expected(3L, 1, math.log(0.1))) < 1e-12)
    // doc4 has no beta but HAS an implicit prior candidate? prior table
    // lacks doc4 → doc4 only appears if some child lists it; it doesn't.
    assert(!got.contains(4L))
  }

  test("#lengthprior adds exponent*log(doclen)") {
    val eng = newEngine("dirichlet")
    val got = eng.evaluate(QueryParser.parse("#lengthprior(0.5 beta)")).df
      .select("docId", "score").as[(Long, Double)].collect().toMap
    assert(math.abs(got(2L) - (dirichlet(2, 4, 3) + 0.5 * math.log(3.0))) < 1e-12)
  }

  test("#wsyn weighted occurrence scoring (WeightedExtentOr)") {
    val eng = newEngine("okapi")
    val got = eng.evaluate(QueryParser.parse("#wsyn(0.7 alpha 0.3 delta)")).df
      .select("docId", "score").as[(Long, Double)].collect().toMap
    // wocc: d1=0.7*2=1.4, d2=0.3, d3=0.7+0.9=1.6; df=3 candidates
    assert(math.abs(got(1L) - okapi(1.4, 3, 4)) < 1e-12)
    assert(math.abs(got(2L) - okapi(0.3, 3, 3)) < 1e-12)
    assert(math.abs(got(3L) - okapi(1.6, 3, 5)) < 1e-12)
  }

  test("deleted documents excluded from retrieval") {
    val eng = newEngine("okapi")
    eng.deleteDocuments(Seq(2L).toDF("docId"))
    val ids = eng.runQuery("#combine(beta)", 10).select("docId").as[Long].collect().toSet
    assert(ids == Set(1L, 3L)) // doc2 deleted, doc4 has no beta
  }

  test("document vectors reconstruct position-ordered terms") {
    val eng = newEngine("okapi")
    val dv = eng.documentVectors(Seq(3L).toDF("docId"))
      .orderBy("pos").select("term").as[String].collect().toSeq
    assert(dv == Seq("alpha", "delta", "delta", "delta", "beta"))
  }

  test("RM1/RM3 expansion matches hand-computed relevance model") {
    import graft.search.RelevanceModel
    val eng = newEngine("okapi")
    val p = RelevanceModel.Params(fbDocs = 2, fbTerms = 3, fbOrigWeight = 0.5)
    // top-2 for "beta": compute okapi scores by hand (df=3)
    val cands = Map(1L -> 1, 2L -> 2, 3L -> 1) // docId -> tf
    val scored = cands.map { case (d, tf) => d -> okapi(tf, 3, dl(d)) }.toSeq
      .sortBy { case (d, s) => (-s, d) }.take(2)
    val got = eng.runQuery("#combine(beta)", 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == scored.map(_._1))
    // posterior + gram weights over the two feedback docs
    val post = RelevanceModel.posterior(scored).toMap
    val slots = corpus.toMap
    val expected = scored.flatMap { case (d, _) =>
      slots(d).split(" ").map(t => t -> post(d) * 1.0 / dl(d))
    }.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
      .toSeq.sortBy { case (t, w) => (-w, t) }.take(3)
    val rm1 = RelevanceModel.rm1(eng, "#combine(beta)", p).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(rm1.map(_._1) == expected.map(_._1))
    rm1.zip(expected).foreach { case ((_, w1), (_, w2)) =>
      assert(math.abs(w1 - w2) < 1e-12)
    }
    // expanded query wiring (QueryExpander.cpp:111-137 shape)
    val q = RelevanceModel.expandedQuery("beta", rm1, p)
    assert(q.startsWith("#weight( 0.5 #combine( beta ) 0.5 #weight("))
    // expanded run returns k results without error
    assert(RelevanceModel.runRm3(eng, "#combine(beta)", 4, p).count() > 0)
  }

  test("Ponte and TFIDF expanders match scalar reference formulas") {
    import graft.search.{Expanders, RelevanceModel}
    val eng = newEngine("okapi")
    val p = RelevanceModel.Params(fbDocs = 2, fbTerms = 5, fbOrigWeight = 0.5)
    val top = eng.runQuery("#combine(beta)", 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fbSlots = top.map { case (d, _) => d -> corpus.toMap.apply(d).split(" ").toSeq }

    // ---- Ponte (tf >= 2 only; mu=0 → dirichlet prob = tf/dl) ----
    def ctf(t: String) = corpus.flatMap(_._2.split(" ")).count(_ == t).toDouble
    val ponteExp = fbSlots.flatMap { case (d, toks) =>
      val s = top.toMap.apply(d)
      toks.distinct.map { t =>
        val tf = toks.count(_ == t)
        (t, tf, toks.length, s)
      }.filter(_._2 >= 2)
    }.groupBy(_._1).map { case (t, xs) =>
      val coll = xs.map { case (_, tf, dl, _) =>
        math.log((tf.toDouble / dl) / (ctf(t) / T)) }.sum
      val rel = xs.map { case (_, tf, dl, s) => math.exp(s) * (tf.toDouble / dl) }.sum
      (t, coll, rel)
    }.toSeq.sortBy { case (t, c, _) => (-c, t) }
    val gotPonte = Expanders.ponteTerms(eng, top, p).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(gotPonte.map(_._1) == ponteExp.map(_._1))
    gotPonte.zip(ponteExp).foreach { case ((_, c1, w1), (_, c2, w2)) =>
      assert(math.abs(c1 - c2) < 1e-12 && math.abs(w1 - w2) < 1e-12)
    }

    // ---- TFIDF ----
    def df(t: String) = corpus.count(_._2.split(" ").contains(t)).toDouble
    val avgdl = T.toDouble / N
    val tfidfExp = fbSlots.flatMap { case (_, toks) =>
      toks.distinct.map { t =>
        val tf = toks.count(_ == t).toDouble
        val bm = 1.2 * tf / (tf + 1.2 * (0.25 + 0.75 / avgdl * toks.length))
        t -> bm * math.log((N + 1) / (df(t) + 0.5))
      }
    }.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum / 2 * 0.5 }
      .toSeq.sortBy { case (t, w) => (-w, t) }.take(5)
    val gotTfidf = Expanders.tfidfTerms(eng, top, p).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(gotTfidf.map(_._1) == tfidfExp.map(_._1))
    gotTfidf.zip(tfidfExp).foreach { case ((_, w1), (_, w2)) =>
      assert(math.abs(w1 - w2) < 1e-12)
    }
    // expanded query strings parse and run
    assert(eng.runQuery(Expanders.tfidfExpand(eng, "beta", 4, p), 4).count() > 0)
    assert(eng.runQuery(Expanders.ponteExpand(eng, "#combine(beta)", 4, p), 4).count() > 0)
  }

  test("wildcard expansion caps and unions prefix matches") {
    val eng = newEngine("okapi")
    val raw = eng.evaluateRaw(QueryParser.parse("d*")).df
      .select("docId", "begins").as[(Long, Seq[Int])].collect().toMap
    assert(raw(2L) == Seq(2))          // delta at pos 2
    assert(raw(3L) == Seq(1, 2, 3))    // three deltas
  }
}

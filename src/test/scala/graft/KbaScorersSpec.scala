package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Engine, ScoringRule}
import graft.streaming.KbaScorers
import graft.streaming.KbaScorers.KbaEntity

/** Hand-computed pins for the KBA multi-model stream scorers and the
  * FilterThread LM-passage rerank (reference: kba/StreamThread.cc,
  * kba/BM25Scorer.cc, kba/LanguageModel(Ext).cc, kba/KLDivergence.cc,
  * kba/FilterThread.cc, kba/LanguageModelPsg.cc).
  */
class KbaScorersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // --- scoreStreams fixture -----------------------------------------
  // doc1: title tokens a/xy/big are ALL kept (no stop/len filter on the
  //       title+anchor channel); body drops "the" (stop), "ab" (len 2)
  // doc3: matches no entity term → never a candidate
  private val docs = Seq(
    (1L, "a xy Big", "data data merge the ab xyz"),
    (2L, "t2", "query join data"),
    (3L, "t3", "the a of")
  ).toDF("docId", "title", "body")

  private val e1 = KbaEntity("e1", Seq("data", "merge"), Seq("data", "merge", "query"))
  private val e2 = KbaEntity("e2", Seq("query", "join"), Nil)

  private lazy val scored = KbaScorers
    .scoreStreams(docs, Seq(e1, e2), stopwords = Set("the", "a"))
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3))
    .toMap

  // fixture stats, by hand:
  //   sizes: doc1 = 3 title + 4 body = 7; doc2 = 1 + 3 = 4; doc3 = 1 + 0 = 1
  //   N = 3, C = 12, avgDocSize = (int)(12/3 + 0.5) = 4
  //   data: df 2, cf 3; merge: df 1, cf 1; query: df 1, cf 1; join: df 1, cf 1
  private val N = 3.0
  private val C = 12.0
  private val Avg = 4
  private def idf(df: Double) = math.log((N - df + 0.5) / (df + 0.5))
  private def muCf(cf: Double) = 2500.0 * cf / C
  private def s(tf: Double, cf: Double, sz: Double) = {
    val total = tf + muCf(cf)
    (if (total > 0.0001) math.log(total) else 0.0) - math.log(sz + 2500.0)
  }
  private def denom(sz: Double) = 0.4375 + (sz / Avg) * 1.3125
  private def bmTerm(tf: Double, df: Double, sz: Double) =
    idf(df) * tf / (tf + denom(sz))

  test("createMinimalParsedStream token rules: title unfiltered, body len>2 + stop set") {
    // doc1/e1 BM25 over labels (data tf=2, merge tf=1) pins size 7 —
    // i.e. the 1-char/stopword title tokens counted, "the"/"ab" dropped
    val want = bmTerm(2, 2, 7) + bmTerm(1, 1, 7)
    assert(math.abs(scored((1L, "e1", "BM25")) - want) < 1e-9)
  }

  test("averageDocSize is int-truncated (12/3 + 0.5 → 4) and feeds the BM25 denominator") {
    val want = bmTerm(1, 1, 4) + bmTerm(1, 1, 4) // doc2/e2: query, join (tf=1 each)
    assert(math.abs(scored((2L, "e2", "BM25")) - want) < 1e-9)
  }

  test("LanguageModel: unmatched label term contributes its background (dirichlet mu=2500)") {
    // doc2/e1: label data matched (tf=1), merge unmatched (tf=0)
    val want = s(1, 3, 4) + s(0, 1, 4)
    assert(math.abs(scored((2L, "e1", "LanguageModel")) - want) < 1e-9)
  }

  test("Ext scorers return 0 for an entity without abstract tokens") {
    assert(scored((2L, "e2", "BM25Ext")) == 0.0)
    assert(scored((2L, "e2", "LanguageModelExt")) == 0.0)
  }

  test("LanguageModelExt scores the abstract vector with background fill-ins") {
    // doc1/e1 abstract = data(2) merge(1) query(0)
    val want = s(2, 3, 7) + s(1, 1, 7) + s(0, 1, 7)
    assert(math.abs(scored((1L, "e1", "LanguageModelExt")) - want) < 1e-9)
  }

  test("KLDivergence = Σ freq·s(w)/querySize over the abstract map; label fallback when empty") {
    // e1 on doc1: abstract map {data,merge,query} each freq 1, qsz 3
    val wantE1 = (s(2, 3, 7) + s(1, 1, 7) + s(0, 1, 7)) / 3.0
    assert(math.abs(scored((1L, "e1", "KLDivergence")) - wantE1) < 1e-9)
    // e2 (no abstract) on doc2: labelMap {query, join}, qsz 2
    val wantE2 = (s(1, 1, 4) + s(1, 1, 4)) / 2.0
    assert(math.abs(scored((2L, "e2", "KLDivergence")) - wantE2) < 1e-9)
  }

  test("candidate rule: a document matching no LABEL token is never scored") {
    // doc1 has no e2 label token; doc3 matches nothing at all
    assert(!scored.contains((1L, "e2", "BM25")))
    assert(!scored.keys.exists(_._1 == 3L))
    // but abstract terms alone do not qualify either: doc2 matches e1's
    // label "data", so it IS a candidate — pin the full candidate set
    assert(scored.keys.map(k => (k._1, k._2)).toSet ==
      Set((1L, "e1"), (2L, "e1"), (2L, "e2")))
  }

  test("kbaQueryTokens: whitespace split, len > 1, lowercase, stop, kstem (in that order)") {
    // "The" lowers to a stop word; "x" is 1 char (charLimit=1 keeps
    // STRICTLY longer); "ab" (2 chars) survives; kstem fixed points stay
    val got = KbaScorers.kbaQueryTokens("The Data x ab MERGE data", Set("the"))
    assert(got == Seq("data", "ab", "merge", "data")) // duplicates + order kept
  }

  // --- randomized scalar-mirror property -------------------------------

  test("scoreStreams == a direct scalar evaluation of the reference formulas on random corpora") {
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("data", "merge", "query", "join", "spark", "the",
      "a", "ab", "xy", "word", "filler", "scan")
    (1 to 3).foreach { round =>
      val nDocs = 5 + rnd.nextInt(20)
      val corpus = (1 to nDocs).map { i =>
        def words(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (i.toLong, words(1 + rnd.nextInt(3)), words(rnd.nextInt(12)))
      }
      val stop = Set("the", "a")
      val ents = Seq(
        KbaEntity("e1", Seq("data", "merge", "data"), Seq("data", "query", "join")),
        KbaEntity("e2", Seq("query", "join"), Nil))
      val got = KbaScorers
        .scoreStreams(corpus.toDF("docId", "title", "body"), ents, stop)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getDouble(3))
        .toMap

      // scalar mirror, straight from the reference formulas
      def parse(title: String, body: String): (Map[String, Int], Int) = {
        val tt = title.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        val bt = body.toLowerCase.split("\\s+")
          .filter(t => t.length > 2 && !stop(t)).toSeq
        val toks = tt ++ bt
        (toks.groupBy(identity).map { case (t, o) => t -> o.size }, toks.size)
      }
      val parsed = corpus.map { case (id, t, b) => id -> parse(t, b) }.toMap
      val totalDocs = nDocs.toDouble
      val collSize = parsed.values.map(_._2).sum.toDouble
      val avg = (collSize / totalDocs + 0.5).toInt
      val qTerms = ents.flatMap(e => e.labelTokens ++ e.abstractTokens).distinct
      val df = qTerms.map(t => t -> parsed.values.count(_._1.contains(t)).toDouble).toMap
      val cf = qTerms.map(t => t -> parsed.values.map(_._1.getOrElse(t, 0)).sum.toDouble).toMap
      def lmTerm(t: String, tf: Int, sz: Int): Double = {
        val total = tf + 2500.0 * cf(t) / collSize
        (if (total > 0.0001) math.log(total) else 0.0) - math.log(sz + 2500.0)
      }
      def bmTerm(t: String, tf: Int, sz: Int): Double =
        if (tf == 0) 0.0
        else math.log((totalDocs - df(t) + 0.5) / (df(t) + 0.5)) *
          tf / (tf + 0.4375 + (sz.toDouble / avg) * 1.3125)
      val expect = scala.collection.mutable.Map.empty[(Long, String, String), Double]
      corpus.foreach { case (id, _, _) =>
        val (tfm, sz) = parsed(id)
        ents.foreach { e =>
          if (e.labelTokens.exists(t => tfm.contains(t))) {
            def tf(t: String) = tfm.getOrElse(t, 0)
            val bm = e.labelTokens.map(t => bmTerm(t, tf(t), sz)).sum
            val bmx = if (e.abstractTokens.nonEmpty)
              e.abstractTokens.map(t => bmTerm(t, tf(t), sz)).sum else 0.0
            val lm = e.labelTokens.map(t => lmTerm(t, tf(t), sz)).sum
            val lmx = if (e.abstractTokens.nonEmpty)
              e.abstractTokens.map(t => lmTerm(t, tf(t), sz)).sum else 0.0
            val klSrc = if (e.abstractTokens.nonEmpty) e.abstractTokens else e.labelTokens
            val qsz = klSrc.size
            val kl = klSrc.groupBy(identity)
              .map { case (t, o) => o.size * lmTerm(t, tf(t), sz) }.sum / qsz
            Seq("BM25" -> bm, "BM25Ext" -> bmx, "LanguageModel" -> lm,
              "LanguageModelExt" -> lmx, "KLDivergence" -> kl).foreach {
              case (m, s0) => if (s0.toInt > -99999) expect((id, e.id, m)) = s0
            }
          }
        }
      }
      assert(got.keySet == expect.keySet, s"round $round candidate sets diverge")
      got.foreach { case (k, v) =>
        assert(math.abs(v - expect(k)) < 1e-9, s"round $round $k: $v vs ${expect(k)}")
      }
    }
  }

  // --- result pools + dump lines --------------------------------------

  test("retainTop: initScore cutoffs (BM25 > 0, LM > -10000) and poolSz cap") {
    val rows = KbaScorers.retainTop(
        KbaScorers.scoreStreams(docs, Seq(e1, e2), stopwords = Set("the", "a")),
        poolSz = 1)
      .select("entity", "model", "docId", "scoreInt", "rk")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getInt(3)))
      .toMap
    // poolSz=1 → at most one row per (entity, model); BM25 pools need
    // scoreInt > 0 — every fixture BM25 int-truncates to ≤ 0 (small
    // corpus, idf(data) < 0), so no BM25/BM25Ext survivors at all
    assert(!rows.keys.exists(_._2 == "BM25"))
    assert(!rows.keys.exists(_._2 == "BM25Ext"))
    // LM pools admit anything > -10000: one winner per (entity, model)
    assert(rows.contains(("e1", "LanguageModel")))
    assert(rows.contains(("e2", "KLDivergence")))
    assert(rows.values.forall(_._2 > -10000))
  }

  test("publishLines: `id wikiURL score dayDt modelName` bytes") {
    import org.apache.spark.sql.functions._
    val scored = KbaScorers.scoreStreams(docs, Seq(e2), stopwords = Set("the", "a"))
    val lines = KbaScorers.publishLines(
        KbaScorers.retainTop(scored, poolSz = 100), dayDt = "2012-05-05",
        idCol = concat(lit("d"), col("docId").cast("string")))
      .collect().map(r => r.getAs[String]("line")).toSet
    // doc2/e2 LanguageModel: s(query)+s(join) at sz=4 → int truncation
    val lm = s(1, 1, 4) + s(1, 1, 4)
    assert(lines.contains(s"d2 e2 ${lm.toInt} 2012-05-05 LanguageModel"))
  }

  // --- lmPassageRerank ------------------------------------------------

  private val cfg = IndexConfig(analyzerMode = "simple", blockSize = 8, numBuckets = 2)
  private val corpus = Seq(
    (1L, "data merge data table"),
    (2L, "query data scan"),
    (3L, "table scan row")
  )
  private lazy val index = IndexBuilder.build(corpus.toDF("docId", "content"), cfg)
  private lazy val eng = new Engine(spark, index, cfg.analyzer,
    ScoringRule(method = "dirichlet"))

  test("lmPassageRerank scores the whole-document passage at mu=2500 — the ctor IGNORES its argument") {
    // stats: C = 4+3+3 = 10; ctf: data 3, merge 1
    // candidates for "data merge": docs 1, 2
    val out = KbaScorers.lmPassageRerank(eng, Seq(("q1", "data merge")),
        requested = 10, mu = 5000.0 /* must be ignored */)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    val cTot = 10.0
    def psg(tf: Double, ctf: Double, sz: Double) =
      math.log(tf + 2500.0 * ctf / cTot) - math.log(sz + 2500.0)
    // doc1: data tf=2, merge tf=1, psgSz=4 (simple analyzer — no [OOV])
    val d1 = psg(2, 3, 4) + psg(1, 1, 4)
    // doc2: data tf=1, merge tf=0, psgSz=3
    val d2 = psg(1, 3, 3) + psg(0, 1, 3)
    assert(out.keySet == Set((1L, "q1"), (2L, "q1")))
    assert(math.abs(out((1L, "q1"))._1 - d1) < 1e-9)
    assert(math.abs(out((2L, "q1"))._1 - d2) < 1e-9)
    // indri column = the engine's dirichlet mean-of-logs #combine score
    def dir(tf: Double, ctf: Double, dl: Double) =
      math.log((tf + 2500.0 * ctf / cTot) / (dl + 2500.0))
    assert(math.abs(out((1L, "q1"))._2 - (dir(2, 3, 4) + dir(1, 1, 4)) / 2) < 1e-9)
  }

  test("filterDumpLines: the dumpKbaResult ostream bytes incl. the double space before the scores") {
    import org.apache.spark.sql.functions._
    val out = KbaScorers.lmPassageRerank(eng, Seq(("q1", "data merge")), requested = 10)
    val lines = KbaScorers.filterDumpLines(out, runId = "run7", dayDt = "2012-05-05",
        idCol = concat(lit("s"), col("docId").cast("string")))
      .collect().map(r => r.getAs[String]("line"))
    val cTot = 10.0
    def psg(tf: Double, ctf: Double, sz: Double) =
      math.log(tf + 2500.0 * ctf / cTot) - math.log(sz + 2500.0)
    def dir(tf: Double, ctf: Double, dl: Double) =
      math.log((tf + 2500.0 * ctf / cTot) / (dl + 2500.0))
    val psg1 = (psg(2, 3, 4) + psg(1, 1, 4)).toInt
    val ind1 = ((dir(2, 3, 4) + dir(1, 1, 4)) / 2).toInt
    assert(lines.contains(
      s"udel run7 s1 q1 1000 2 1 2012-05-05 NULL -1 0-0  $psg1 $ind1"))
  }

  test("lmPassageRerank cf==0 quirk: an unmatched OOV query term scores with collFreq=1") {
    // "zzz" never occurs: tf=0 AND cf=0 → the reference substitutes
    // collFreq=1 (LanguageModelPsg.cc:23-30)
    val out = KbaScorers.lmPassageRerank(eng, Seq(("q2", "data zzz")), requested = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val cTot = 10.0
    def psg(tf: Double, cfEff: Double, sz: Double) =
      math.log(tf + 2500.0 * cfEff / cTot) - math.log(sz + 2500.0)
    val d2 = psg(1, 3, 3) + psg(0, 1 /* quirk */, 3)
    assert(math.abs(out(2L) - d2) < 1e-9)
  }

  test("dayStatLines: 5-day sliding window, unsigned division, %g whole-number text") {
    // 7 days → lines for days 6 and 7 only; the window is the PREVIOUS
    // five days (current day excluded), then rotates by one
    val perDay = Seq(
      ("2012-10-01", 100L, 3L), ("2012-10-02", 50L, 2L),
      ("2012-10-03", 70L, 1L), ("2012-10-04", 10L, 1L),
      ("2012-10-05", 40L, 2L), ("2012-10-06", 999L, 9L),
      ("2012-10-07", 8L, 1L)
    ).toDF("day", "term_count", "doc_count")
    val lines = KbaScorers.dayStatLines(perDay, dirPrefix = "/x/")
      .orderBy("day").collect().map(_.getAs[String]("line"))
    // day 6: (100+50+70+10+40)/(3+2+1+1+2) = 270/9 = 30
    // day 7: (50+70+10+40+999)/(2+1+1+2+9) = 1169/15 = 77.93… → 77 (trunc)
    assert(lines.toSeq == Seq(
      "/x/2012-10-06,past-5-day,30",
      "/x/2012-10-07,past-5-day,77"))
  }

  test("highRecallRows: score>300 strtol gate, first-dash stream-id split, col-8 directory") {
    val lines = Seq(
      "anno run1 1325400000-doc-7 t1 301 1 0 2012-10-03",  // kept; docId keeps its own dash
      "anno run1 1325400001-d8 t1 300 1 0 2012-10-03",     // 300 is NOT > 300
      "anno run1 1325400002-d9 t1 299junk 1 0 2012-10-04", // strtol: 299 → dropped
      "anno run1 1325400003-d10 t1 500x 1 0 2012-10-04",   // strtol: 500 → kept
      "anno run1 nodash t1 400 1 0 2012-10-05"             // npos wrap: docId = whole id, sTime 0
    ).toDF("line")
    val out = KbaScorers.highRecallRows(lines)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set(
      (1325400000L, "doc-7", "2012-10-03"),
      (1325400003L, "d10", "2012-10-04"),
      (0L, "nodash", "2012-10-05")))
  }
}

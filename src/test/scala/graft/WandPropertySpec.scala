package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analyzer
import graft.corpus.CorpusSynthesizer
import graft.index.{IndexBuilder, IndexConfig}
import graft.search._

/** Pruning-safety property (FIXTURES.md: block-max WAND result ==
  * exhaustive DAAT == DataFrame inference-network path, exact doubles).
  */
class WandPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val docsDf = {
    val corpus = CorpusSynthesizer.corpus(spark, 600, seed = 7L)
    IndexBuilder.assignDocIds(corpus, Seq("repo", "path", "commit"))
      .select("docId", "content").cache()
  }
  // small blocks force many block boundaries — the skip logic gets real work
  private lazy val index = IndexBuilder.build(docsDf, IndexConfig(blockSize = 16, numBuckets = 8))

  private val queries = Seq(
    "return",
    "#combine(return license)",
    "#combine(class def val import)",
    "#combine(return return class)",
    "#weight(0.7 return 0.3 license)",
    "#weight(3.0 val 1.0 static 2.0 import)",
    "#combine(zzznotaword return)",
    "#combine(uniq1x5 return)" // df=1 + hot term: extreme UB spread
  )

  private def run(engine: Engine, q: String, k: Int, mode: String): Seq[(Long, Double)] = {
    val df = mode match {
      case "wand" => engine.runQuery(q, k, useDaat = true)
      case "exhaustive" =>
        engine.runDaat(QueryParser.parse(q) match {
          case TermNode(t) => Seq(t -> 1.0)
          case CombineNode(cs) => cs.map { case TermNode(t) => t -> 1.0 }
          case WeightNode(cs) => cs.map { case (w, TermNode(t)) => t -> w }
          case other => fail(s"unexpected $other")
        }, k, exhaustive = true)
      case "dataframe" => engine.runQuery(q, k, useDaat = false)
    }
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("WAND == exhaustive DAAT == DataFrame path, k=10 and k=1000, exact doubles") {
    val engine = new Engine(spark, index, Analyzer(), ScoringRule(method = "okapi"))
    for (q <- queries; k <- Seq(10, 1000)) {
      val wand = run(engine, q, k, "wand")
      val exh = run(engine, q, k, "exhaustive")
      val dfp = run(engine, q, k, "dataframe")
      assert(wand == exh, s"WAND != exhaustive for '$q' k=$k\n wand=${wand.take(5)}\n exh=${exh.take(5)}")
      assert(wand == dfp, s"WAND != DataFrame for '$q' k=$k\n wand=${wand.take(5)}\n df=${dfp.take(5)}")
    }
  }

  test("tfidf rule: WAND == exhaustive == DataFrame (pivot tie-extension regression)") {
    // regression for the unsound block-max skip when a cursor BEYOND the
    // pivot index was tied on the pivot doc: the rejection bounded only
    // cursors ≤ p while the tied cursor still contributed score, so docs
    // were silently dropped. tfidf's tighter bounds tripped it; okapi's
    // never did on this corpus.
    val engine = new Engine(spark, index, Analyzer(), ScoringRule(method = "tfidf"))
    for (q <- queries; k <- Seq(10, 50)) {
      val wand = run(engine, q, k, "wand")
      val exh = run(engine, q, k, "exhaustive")
      val dfp = run(engine, q, k, "dataframe")
      assert(wand == exh, s"WAND != exhaustive for '$q' k=$k (tfidf)")
      assert(wand == dfp, s"WAND != DataFrame for '$q' k=$k (tfidf)")
    }
  }

  test("LM rules (dirichlet/jm/two-stage): WAND == exhaustive == DataFrame, exact doubles") {
    // round 3: flat LM bags run the kernel with background-aware bounds
    // (baseMax + δ algebra). Exactness must hold bit-for-bit against the
    // belief path — including OOV children (background everywhere) and
    // duplicate terms.
    for (method <- Seq("method:dirichlet", "method:jm,collectionLambda:0.4",
                       "method:two,mu:2500,lambda:0.4")) {
      val engine = new Engine(spark, index, Analyzer(), ScoringRule.parse(method))
      for (q <- queries; k <- Seq(10, 1000)) {
        val wand = run(engine, q, k, "wand")
        val exhDf = engine.runDaatLm(QueryParser.parse(q) match {
          case TermNode(t) => Seq(t -> 1.0)
          case CombineNode(cs) => cs.map { case TermNode(t) => t -> 1.0 / cs.size }
          case WeightNode(cs) =>
            val tot = cs.map(c => math.abs(c._1)).sum
            cs.map { case (w, TermNode(t)) => t -> w / tot }
          case other => fail(s"unexpected $other")
        }, k, exhaustive = true)
        val exh = exhDf.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val dfp = run(engine, q, k, "dataframe")
        assert(wand == exh, s"WAND != exhaustive for '$q' k=$k ($method)\n wand=${wand.take(5)}\n exh=${exh.take(5)}")
        assert(wand == dfp, s"WAND != DataFrame for '$q' k=$k ($method)\n wand=${wand.take(5)}\n df=${dfp.take(5)}")
      }
    }
  }

  // round 4: SDM/FDM-shaped #combine/#weight trees with #odN/#uwN window
  // leaves run INSIDE the kernel (positions decoded from segment blocks,
  // WindowMatcher per candidate) — must be bit-identical to the nested
  // combineBeliefs DataFrame path, pruned == exhaustive, and the
  // structured dispatch must actually fire (no silent belief fallback).
  private val structuredQueries = Seq(
    graft.search.Reformulate.sdm(Seq("return", "license", "class")),
    graft.search.Reformulate.fdm(Seq("val", "import", "static")),
    "#combine(#od1(return license) #uw4(class def))",
    "#weight(0.6 #combine(return class) 0.2 #combine(#od2(return class)) 0.2 #combine(#uw8(return class)))",
    "#weight(0.8 #combine(return zzznotaword) 0.2 #combine(#od1(return zzznotaword)))",
    "#combine(#od1(return return) val)",
    "#uw12(return license class)"
  )

  test("structured kernel (windows in DAAT): == DataFrame path == exhaustive, all rules") {
    for (method <- Seq("method:okapi", "method:tfidf", "method:dirichlet",
                       "method:jm,collectionLambda:0.4", "method:two,mu:2500,lambda:0.4")) {
      val engine = new Engine(spark, index, Analyzer(), ScoringRule.parse(method))
      for (q <- structuredQueries; k <- Seq(10, 1000)) {
        val ast = QueryParser.parse(q)
        val kernelOpt = engine.runStructured(ast, k)
        assert(kernelOpt.isDefined, s"structured dispatch did not fire for '$q' ($method)")
        val kernel = kernelOpt.get.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val exh = engine.runStructured(ast, k, exhaustive = true).get
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val dfp = run(engine, q, k, "dataframe")
        assert(kernel == exh, s"structured WAND != exhaustive for '$q' k=$k ($method)\n w=${kernel.take(5)}\n e=${exh.take(5)}")
        assert(kernel == dfp, s"structured WAND != DataFrame for '$q' k=$k ($method)\n w=${kernel.take(5)}\n d=${dfp.take(5)}")
      }
    }
  }

  test("structured kernel honors the delete set (dirichlet)") {
    val engine = new Engine(spark, index, Analyzer(), ScoringRule(method = "dirichlet"))
    engine.deleteDocuments {
      import spark.implicits._
      (1L to 600L).filter(_ % 5 == 0).toDF("docId")
    }
    for (q <- structuredQueries.take(4); k <- Seq(10, 100)) {
      val wand = run(engine, q, k, "wand") // runQuery dispatches structured
      val dfp = run(engine, q, k, "dataframe")
      assert(wand == dfp, s"deleted-aware structured WAND != DataFrame for '$q' k=$k")
      assert(wand.forall(_._1 % 5 != 0), s"deleted doc leaked for '$q'")
    }
  }

  test("deleted documents: kernel skip == anti-join belief path (okapi + dirichlet)") {
    // round 3: the kernel consults the in-memory delete set (the
    // DeletedDocumentList bitmap analogue) instead of forcing the
    // belief-path fallback — results must stay bit-identical
    for (method <- Seq("okapi", "dirichlet")) {
      val engine = new Engine(spark, index, Analyzer(), ScoringRule(method = method))
      engine.deleteDocuments {
        import spark.implicits._
        (1L to 600L).filter(_ % 7 == 0).toDF("docId")
      }
      for (q <- queries; k <- Seq(10, 100)) {
        val wand = run(engine, q, k, "wand")
        val dfp = run(engine, q, k, "dataframe")
        assert(wand == dfp, s"deleted-aware WAND != DataFrame for '$q' k=$k ($method)")
        assert(wand.forall(_._1 % 7 != 0), s"deleted doc leaked for '$q' ($method)")
      }
    }
  }

  test("flat and structured kernels: k=0 returns empty like limit(0), no heap NPE") {
    // a zero-capacity TopKHeap NPEs on peek() — the kernel entries must
    // short-circuit k ≤ 0 to the DataFrame path's limit(0) = empty
    val engine = new Engine(spark, index, Analyzer(), ScoringRule(method = "okapi"))
    assert(run(engine, "#combine(return license)", 0, "wand").isEmpty)
    assert(run(engine, "#combine(return license)", 0, "dataframe").isEmpty)
    val lmEng = new Engine(spark, index, Analyzer(), ScoringRule(method = "dirichlet"))
    assert(run(lmEng, "#combine(return license)", 0, "wand").isEmpty)
    val st = lmEng.runStructured(QueryParser.parse("#combine(#od1(return license) val)"), 0)
    assert(st.isDefined && st.get.collect().isEmpty)
    // direct kernel entry: no heap is constructed at k=0
    assert(Daat.wand(Array.empty[Daat.Cursor], Daat.plan(Nil), 0, exhaustive = false).isEmpty)
  }

  test("LM topdocs seeding stays exact") {
    val td = IndexBuilder.buildTopdocs(index.postings,
      IndexConfig(topdocsMinDf = 20L, topdocsFraction = 0.05))
    val seededIdx = index.copy(topdocs = td.cache())
    val engSeeded = new Engine(spark, seededIdx, Analyzer(), ScoringRule(method = "dirichlet"))
    val engPlain = new Engine(spark, index, Analyzer(), ScoringRule(method = "dirichlet"))
    for (q <- queries; k <- Seq(10, 100)) {
      val s = run(engSeeded, q, k, "wand")
      val u = run(engPlain, q, k, "wand")
      assert(s == u, s"LM seeded != unseeded for '$q' k=$k")
    }
  }

  test("topdocs threshold seeding: results stay exact, block decodes drop") {
    // engine level: index with topdocs attached must return identical
    // results to the unseeded and exhaustive paths across the query set
    val td = IndexBuilder.buildTopdocs(index.postings,
      IndexConfig(topdocsMinDf = 20L, topdocsFraction = 0.05))
    val seededIdx = index.copy(topdocs = td.cache())
    val engSeeded = new Engine(spark, seededIdx, Analyzer(), ScoringRule(method = "okapi"))
    val engPlain = new Engine(spark, index, Analyzer(), ScoringRule(method = "okapi"))
    for (q <- queries; k <- Seq(10, 100)) {
      val s = run(engSeeded, q, k, "wand")
      val u = run(engPlain, q, k, "wand")
      assert(s == u, s"seeded != unseeded for '$q' k=$k")
    }

    // kernel level: seeding with the exact k-th best score (the tightest
    // valid θ0 — any topdocs-derived seed is ≤ it) must keep results
    // identical while decoding fewer blocks
    import org.apache.spark.sql.functions.col
    import graft.search.Daat._
    // a mid-frequency term: enough blocks that a warm θ can skip the
    // low-maxTf ones before the heap would have filled on its own
    val n = index.stats.totalDocs
    val midTerm = index.dictionary
      .where(col("df") > n / 10 && col("df") < n / 3)
      .orderBy(col("df").desc).select("term").head().getString(0)
    val terms = Seq(midTerm)
    val tstats = engPlain.termStatsFor(terms)
    val engineTerms = terms.map { t =>
      val ts = tstats.getOrElse(t, TermStats(0, 0))
      (t, 1.0, Scorers.forTerm(ScoringRule(method = "okapi"), ts.ctf.toDouble,
        index.stats.totalTerms.toDouble, ts.df.toDouble, index.stats.totalDocs))
    }
    val p = Daat.plan(engineTerms)
    val rows = index.segments.where(col("term").isin(terms: _*))
      .select("term", "firstDoc", "lastDoc", "numDocs", "maxTf", "minDl",
        "docsDelta", "tfs", "dls").collect()
    def mkCursors() = {
      val byTerm = rows.groupBy(_.getString(0))
      p.terms.map { tp =>
        val bs = byTerm.getOrElse(tp.term, Array.empty).map { r =>
          Block(r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5),
            r.getAs[Array[Byte]](6), r.getAs[Array[Byte]](7), r.getAs[Array[Byte]](8))
        }.sortBy(_.firstDoc)
        new Cursor(bs, tp)
      }
    }
    val k = 5
    val cCold = mkCursors()
    val rCold = Daat.wand(cCold, p, k, exhaustive = false)
    val theta0 = rCold.last._2 // exact k-th best = the tightest sound seed
    val cSeeded = mkCursors()
    val rSeeded = Daat.wand(cSeeded, p, k, exhaustive = false, seedTheta = theta0)
    assert(rSeeded == rCold)
    val dSeeded = cSeeded.map(_.decodedBlocks).sum
    val dCold = cCold.map(_.decodedBlocks).sum
    assert(dSeeded <= dCold)
    assert(dSeeded < dCold,
      s"seeding decoded $dSeeded blocks vs cold $dCold — no decode saving")
  }

  test("okapi topdocs seeding with NEGATIVE idf (df > N/2) stays exact") {
    import spark.implicits._
    // 'common' matches 2/3 of the corpus: okapi idf < 0, so every score
    // is negative — a seed built by clamping per-term contributions to 0
    // produced θ0 = 0 > the true k-th best and WAND returned EMPTY.
    // Seeding must disable itself (partial knowledge cannot lower-bound
    // a sum with negative terms) and results must stay exact.
    val docs = (1L to 60L).map { i =>
      val common = if (i <= 40) "common " else ""
      val rare = if (i % 12 == 0) "rare " else ""
      (i, s"$common${rare}filler$i word$i pad")
    }.toDF("docId", "content")
    val cfg = IndexConfig(blockSize = 8, numBuckets = 2,
      topdocsMinDf = 5L, topdocsFraction = 0.5)
    val idx0 = IndexBuilder.build(docs, cfg)
    val td = IndexBuilder.buildTopdocs(idx0.postings, cfg)
    assert(td.where(org.apache.spark.sql.functions.col("term") === "common")
      .count() > 0, "fixture must give 'common' a topdocs list")
    val engSeeded = new Engine(spark, idx0.copy(topdocs = td.cache()),
      Analyzer(), ScoringRule(method = "okapi"))
    val engPlain = new Engine(spark, idx0, Analyzer(), ScoringRule(method = "okapi"))
    for (q <- Seq("#combine(common)", "#combine(common rare)"); k <- Seq(5, 20)) {
      val s = run(engSeeded, q, k, "wand")
      assert(s == run(engPlain, q, k, "wand"), s"seeded != unseeded for '$q' k=$k")
      assert(s == run(engSeeded, q, k, "dataframe"), s"wand != dataframe for '$q' k=$k")
      assert(s.nonEmpty, s"'$q' k=$k returned empty — unsound seed")
    }
  }

  test("LM bounds actually prune: seeded dirichlet run decodes fewer blocks") {
    // the baseMax + δ algebra must yield non-vacuous bounds — with the
    // exact k-th best as seed, the kernel must skip block decodes on a
    // mid-frequency term, just like the okapi path
    import org.apache.spark.sql.functions.col
    import graft.search.Daat._
    val engPlain = new Engine(spark, index, Analyzer(), ScoringRule(method = "dirichlet"))
    val n = index.stats.totalDocs
    val midTerm = index.dictionary
      .where(col("df") > n / 10 && col("df") < n / 3)
      .orderBy(col("df").desc).select("term").head().getString(0)
    val terms = Seq(midTerm)
    val tstats = engPlain.termStatsFor(terms)
    val engineTerms = terms.map { t =>
      val ts = tstats.getOrElse(t, TermStats(0, 0))
      (t, 1.0, Scorers.forTerm(ScoringRule(method = "dirichlet"), ts.ctf.toDouble,
        index.stats.totalTerms.toDouble, ts.df.toDouble, index.stats.totalDocs),
        ts.ctf, ts.minDl)
    }
    val p = Daat.planLm(engineTerms, engineTerms.map(_._5).min)
    val rows = index.segments.where(col("term").isin(terms: _*))
      .select("term", "firstDoc", "lastDoc", "numDocs", "maxTf", "minDl",
        "docsDelta", "tfs", "dls").collect()
    def mkCursors() = {
      val byTerm = rows.groupBy(_.getString(0))
      p.terms.map { tp =>
        val bs = byTerm.getOrElse(tp.term, Array.empty).map { r =>
          Block(r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5),
            r.getAs[Array[Byte]](6), r.getAs[Array[Byte]](7), r.getAs[Array[Byte]](8))
        }.sortBy(_.firstDoc)
        new Cursor(bs, tp)
      }
    }
    val k = 5
    val cCold = mkCursors()
    val rCold = Daat.wand(cCold, p, k, exhaustive = false)
    val theta0 = rCold.last._2
    val cSeeded = mkCursors()
    val rSeeded = Daat.wand(cSeeded, p, k, exhaustive = false, seedTheta = theta0)
    assert(rSeeded == rCold)
    val dSeeded = cSeeded.map(_.decodedBlocks).sum
    val dCold = cCold.map(_.decodedBlocks).sum
    assert(dSeeded < dCold,
      s"LM seeding decoded $dSeeded blocks vs cold $dCold — bounds are vacuous")
  }

  test("WAND pruning actually skips block decodes on selective queries") {
    // direct kernel exercise: rare term + mid-frequency term, k=1 — once
    // the rare doc sets θ above the mid term's UB, its remaining blocks
    // must never decode. (A near-universal term like `return` has
    // NEGATIVE idf here, UB=0, and legitimately cannot be pruned when θ
    // is negative — so pick a positive-idf term with many blocks.)
    val analyzer = Analyzer()
    val engine = new Engine(spark, index, analyzer, ScoringRule(method = "okapi"))
    import org.apache.spark.sql.functions.col
    // a real df=1 term whose single posting has a small docId
    val rareTerm = index.dictionary.where(col("df") === 1)
      .join(index.postings, "term")
      .orderBy("docId").select("term")
      .head().getString(0)
    val n = index.stats.totalDocs
    val midTerm = index.dictionary
      .where(col("df") > n / 10 && col("df") < n / 3)
      .orderBy(col("df").desc).select("term")
      .head().getString(0)
    val tstats = engine.termStatsFor(Seq(midTerm, rareTerm))
    import graft.search.Daat._
    val engineTerms = Seq(rareTerm, midTerm).map { t =>
      val ts = tstats.getOrElse(t, TermStats(0, 0))
      (t, 1.0, Scorers.forTerm(ScoringRule(method = "okapi"), ts.ctf.toDouble,
        index.stats.totalTerms.toDouble, ts.df.toDouble, index.stats.totalDocs))
    }
    val p = Daat.plan(engineTerms)
    // gather all blocks locally and run the kernel twice
    import spark.implicits._
    val rows = index.segments.where($"term".isin(rareTerm, midTerm))
      .select("term", "firstDoc", "lastDoc", "numDocs", "maxTf", "minDl",
        "docsDelta", "tfs", "dls").collect()
    def mkCursors() = {
      val byTerm = rows.groupBy(_.getString(0))
      p.terms.map { tp =>
        val bs = byTerm.getOrElse(tp.term, Array.empty).map { r =>
          Block(r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4), r.getInt(5),
            r.getAs[Array[Byte]](6), r.getAs[Array[Byte]](7), r.getAs[Array[Byte]](8))
        }.sortBy(_.firstDoc)
        new Cursor(bs, tp)
      }
    }
    val cPruned = mkCursors()
    val rPruned = Daat.wand(cPruned, p, 1, exhaustive = false)
    val cFull = mkCursors()
    val rFull = Daat.wand(cFull, p, 1, exhaustive = true)
    assert(rPruned == rFull)
    val decodedPruned = cPruned.map(_.decodedBlocks).sum
    val decodedFull = cFull.map(_.decodedBlocks).sum
    assert(decodedPruned < decodedFull,
      s"pruning decoded $decodedPruned blocks, exhaustive $decodedFull — no skipping happened")
  }

  // -----------------------------------------------------------------
  // round 5: extent restriction / passages through the DAAT kernel
  // -----------------------------------------------------------------

  private lazy val fieldedIndex = IndexBuilder.build(docsDf,
    IndexConfig(blockSize = 16, numBuckets = 8),
    annotate = df => graft.index.FieldAnnotators.headField(7)(df))

  private val extentQueries = Seq(
    "#combine[head](return license)",
    "#weight[head](0.7 return 0.3 license)",
    "#or[head](return license)",
    "#max[head](return license)",
    "#sum[head](return license)",
    "#wsum[head](2.0 return 1.0 license)",
    "#not[head](return)",
    "#combine[head](zzznotaword return)", // OOV child scores background
    "#combine[passage8:4](return license)",
    "#weight[passage8:4](0.6 val 0.4 import)")

  private def runExtents(engine: Engine, q: String, k: Int,
                         useDaat: Boolean): Seq[(Long, Int, Int, Double)] =
    engine.runExtentQuery(q, k, useDaat = useDaat).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSeq

  test("extent kernel: field + passage contexts == DataFrame path, all restricted ops and LM rules") {
    for (method <- Seq("method:dirichlet", "method:jm,collectionLambda:0.4",
                       "method:two,mu:2500,lambda:0.4")) {
      val engine = new Engine(spark, fieldedIndex, Analyzer(), ScoringRule.parse(method))
      for (q <- extentQueries; k <- Seq(10, 1000)) {
        val kernel = runExtents(engine, q, k, useDaat = true)
        val dfp = runExtents(engine, q, k, useDaat = false)
        assert(kernel == dfp,
          s"extent kernel != DataFrame for '$q' k=$k ($method)\n k=${kernel.take(5)}\n d=${dfp.take(5)}")
      }
    }
  }

  test("extent kernel: all-OOV bags return the empty result on both paths") {
    val engine = new Engine(spark, fieldedIndex, Analyzer(), ScoringRule(method = "dirichlet"))
    val q = "#combine[head](zzznotaword qqqalsonotaword)"
    assert(runExtents(engine, q, 10, useDaat = true).isEmpty)
    assert(runExtents(engine, q, 10, useDaat = false).isEmpty)
  }

  test("extent kernel guards: k=0 empty on both paths, non-positive passage increment rejected") {
    val engine = new Engine(spark, fieldedIndex, Analyzer(), ScoringRule(method = "dirichlet"))
    // k=0: the DataFrame path limits to nothing; the kernel's
    // zero-capacity heap must not NPE on its first offer
    assert(runExtents(engine, "#combine[head](return)", 0, useDaat = true).isEmpty)
    assert(runExtents(engine, "#combine[passage8:4](return)", 0, useDaat = true).isEmpty)
    // increment 0 never advances the sliding window — the kernel would
    // loop forever where the old explode path's sequence() errored;
    // both now fail fast at parse
    for (bad <- Seq("#combine[passage10:0](return)",
                    "#combine[passage10:-2](return)",
                    "#combine[passage0:5](return)")) {
      intercept[IllegalArgumentException](engine.runExtentQuery(bad, 10))
    }
  }

  test("extent kernel honors the delete set (dirichlet)") {
    val engine = new Engine(spark, fieldedIndex, Analyzer(), ScoringRule(method = "dirichlet"))
    engine.deleteDocuments {
      import spark.implicits._
      (1L to 600L).filter(_ % 5 == 0).toDF("docId")
    }
    for (q <- Seq("#weight[head](0.7 return 0.3 license)",
                  "#combine[passage8:4](return license)"); k <- Seq(10, 100)) {
      val kernel = runExtents(engine, q, k, useDaat = true)
      val dfp = runExtents(engine, q, k, useDaat = false)
      assert(kernel == dfp, s"deleted-aware extent kernel != DataFrame for '$q' k=$k")
      assert(kernel.forall(_._1 % 5 != 0), s"deleted doc leaked for '$q'")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{Analyzer, KrovetzStemmer, PorterStemmer}
import graft.index.{IndexBuilder, IndexConfig}
import graft.pipeline.TextPipeline
import graft.search.{Engine, QueryParser, ScoringRule}

/** Semantic and robustness properties that cross-engine parity alone
  * cannot pin: MinHash must actually ESTIMATE Jaccard (a deterministic
  * but wrong hash formula would still match a DuckDB reproduction of
  * itself), the analyzer must hold its slot invariants on adversarial
  * input, and the parser/evaluator must survive arbitrary well-formed
  * operator nestings.
  */
class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("minhash signature agreement estimates shingle Jaccard (128 hashes, seeded overlap spectrum)") {
    val rnd = new scala.util.Random(7)
    val vocab = Array.tabulate(400)(i => s"w$i")
    // doc pairs with controlled token overlap 0%, 25%, 50%, 75%, 100%
    val pairs = Seq(0, 50, 100, 150, 200).zipWithIndex.map { case (shift, pi) =>
      val a = (0 until 200).map(vocab(_))
      val b = (shift until shift + 200).map(vocab(_))
      (pi, a.mkString(" "), b.mkString(" "))
    }
    val docs = pairs.flatMap { case (pi, a, b) =>
      Seq((pi * 2L, a), (pi * 2L + 1, b))
    }.toDF("doc_id", "text")
    val sigs = TextPipeline.minhash(docs, "doc_id", "text", numHashes = 128)
      .collect().map(r => r.getLong(0) -> (1 to 128).map(j => r.getString(j)).toArray).toMap
    pairs.foreach { case (pi, a, b) =>
      def shingles(s: String) = s.split(" ").toSeq.sliding(3).map(_.mkString(" ")).toSet
      val (sa, sb) = (shingles(a), shingles(b))
      val trueJ = sa.intersect(sb).size.toDouble / sa.union(sb).size
      val (ga, gb) = (sigs(pi * 2L), sigs(pi * 2L + 1))
      val est = ga.zip(gb).count { case (x, y) => x == y }.toDouble / 128
      assert(math.abs(est - trueJ) < 0.15,
        s"pair $pi: estimated $est vs true $trueJ")
    }
  }

  test("analyzer slot invariants hold on adversarial input (all modes)") {
    val rnd = new scala.util.Random(11)
    val fragments = Array(
      "<b>", "</b>", "<!-- c -->", "&amp;", "&#65;", "U.S.A.", "-12.5",
      "naïve", "ＵＴＦ", "a" * 600, "<tag attr=\"x\">", "\u0000", "\t\n ",
      "word", "42,000", "e.g.", "http://x.y/z?a=1", "</", "<", "&", ";;")
    val analyzers = Seq(
      Analyzer(mode = "simple"),
      Analyzer(mode = "indri"),
      Analyzer(mode = "indri", stopwords = Set("word", "a"), stemmer = PorterStemmer),
      Analyzer(mode = "indri", stemmer = KrovetzStemmer))
    (0 until 50).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(30) + 1)(fragments(rnd.nextInt(fragments.length)))
        .mkString(rnd.nextInt(3) match { case 0 => " "; case 1 => ""; case _ => "\n" })
      analyzers.foreach { az =>
        val slots = az.analyze(text)                      // must not throw
        val raw = az.rawTokens(text)
        assert(slots.length == raw.length,
          s"slot/raw length mismatch for mode=${az.mode} on ${text.take(60)}")
        slots.filter(_ != null).foreach(t => assert(t.length <= az.maxTermLength))
      }
    }
  }

  test("parser + evaluator survive arbitrary well-formed operator nestings with finite scores") {
    val corpus = Seq(
      (1L, "alpha beta alpha gamma delta"),
      (2L, "beta beta delta alpha"),
      (3L, "alpha delta delta delta beta gamma"),
      (4L, "gamma gamma alpha beta epsilon")
    ).toDF("docId", "content")
    val cfg = IndexConfig(analyzerMode = "simple", blockSize = 8, numBuckets = 2)
    val index = IndexBuilder.build(corpus, cfg)
    val eng = new Engine(spark, index, cfg.analyzer, ScoringRule(method = "dirichlet"))
    val rnd = new scala.util.Random(13)
    val terms = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    def gen(depth: Int): String =
      if (depth == 0) terms(rnd.nextInt(terms.length))
      else rnd.nextInt(8) match {
        case 0 => s"#combine(${gen(depth - 1)} ${gen(depth - 1)})"
        case 1 => s"#weight(${rnd.nextInt(3) + 1} ${gen(depth - 1)} 1 ${gen(depth - 1)})"
        case 2 => s"#od${rnd.nextInt(3) + 1}(${terms(rnd.nextInt(6))} ${terms(rnd.nextInt(6))})"
        case 3 => s"#uw${rnd.nextInt(4) + 2}(${terms(rnd.nextInt(6))} ${terms(rnd.nextInt(6))})"
        case 4 => s"#syn(${terms(rnd.nextInt(6))} ${terms(rnd.nextInt(6))})"
        case 5 => s"#band(${terms(rnd.nextInt(6))} ${terms(rnd.nextInt(6))})"
        case 6 => s"#max(${gen(depth - 1)} ${gen(depth - 1)})"
        case 7 => s"#wsum(1 ${gen(depth - 1)} 2 ${gen(depth - 1)})"
      }
    (0 until 15).foreach { _ =>
      val q = gen(2)
      val rows = eng.runQuery(q, 10)
        .select("docId", "score").as[(Long, Double)].collect()
      rows.foreach { case (_, s) =>
        assert(!s.isNaN && !s.isInfinity, s"non-finite score for $q")
      }
    }
  }

  test("reformulate transform is total over adversarial input; output reparses") {
    val rnd = new scala.util.Random(17)
    val frags = Array("what", "is", "the", "apple", "why do we", "-bad", "+good",
      "\"a phrase\"", "U.S.A.", "42", "", " ", "\t", "ÄÖÜ", "a" * 80,
      "can anyone tell me what", "find", "#combine", "(", ")")
    import graft.search.{Reformulate, QueryParser}
    (0 until 60).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(8) + 1)(frags(rnd.nextInt(frags.length)))
        .mkString(" ")
      Seq(Reformulate.GenCombine, Reformulate.GenSDM, Reformulate.GenFDM,
          Reformulate.GenCMUFDM).foreach { mode =>
        // never throws; non-empty output; SDM/FDM/combine outputs reparse
        val out = Reformulate.transform(Reformulate.makeIndriFriendly(text), mode)
        assert(out.nonEmpty)
        if (out != "EMPTYQUERY" && mode != Reformulate.GenCMUFDM)
          QueryParser.parse(out) // must be a valid engine query
      }
    }
  }

  test("indrilang parser fuzz: garbage parses or throws IllegalArgument, never crashes") {
    import graft.search.QueryParser
    val rnd = new scala.util.Random(11)
    val alphabet = "ab q#()<>{}.\"-*/:[]=0123456789é\\,"
    (0 until 600).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(28))(alphabet(rnd.nextInt(alphabet.length))).mkString
      try { QueryParser.parse(s); () }
      catch { case _: IllegalArgumentException => () } // documented rejection
    }
    // operator-shaped near-misses take the documented path too
    Seq("#base64(!!!)", "#base64()", "#base64quote(@@)", "#datebefore()",
      "#datebetween(01/11/2004)", "#combine(", "\"", "#od(", "#wsyn(x y)")
      .foreach { q =>
        try { QueryParser.parse(q); () }
        catch { case _: IllegalArgumentException => () }
      }
  }

  test("NEXI parser: boolean surface fuzz — parses or throws IllegalArgument, never crashes") {
    val rnd = new scala.util.Random(19)
    val frags = Array("//sec", "//a//b", "[", "]", "about(., x y)", "about(., +x -y)",
      "and", "or", "AND", "about(.,)", "x", "(", ")", "//", "about(.//s, x)",
      ".//n > 5", "about(., \"p q\")")
    import graft.search.NexiParser
    (0 until 80).foreach { _ =>
      val q = Seq.fill(rnd.nextInt(6) + 1)(frags(rnd.nextInt(frags.length)))
        .mkString(" ")
      try {
        val parsed = NexiParser.parse(q)
        assert(parsed.nexiClauses.nonEmpty)
      } catch {
        case _: IllegalArgumentException => // documented rejection path
      }
    }
  }
}

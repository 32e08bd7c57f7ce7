package graft.apps

import org.apache.spark.sql.SparkSession

import graft.analysis.Analyzer
import graft.search.{Engine, RelevanceModel, ScoringRule}

/** The clarity application surface (reference: clarity/clarity.cpp):
  * per query, build a SMOOTHED unigram relevance model from the top
  * `documents` results, then print the query-clarity score
  * KL(RM ‖ collection LM) in bits over the top `terms` grams, plus each
  * gram's contribution.
  *
  * Parameter surface (clarity.cpp:114-143): `index`* / `server`*,
  * `query`*, `documents` (default 5), `terms` (default 10), `smoothing`
  * (RM smoothing rule), `rule`* (retrieval smoothing). The reference's
  * built-in smoothing default string is "method:jm,lambda,0.5" — whose
  * comma-separated "lambda,0.5" tail never parses as a key:value pair
  * (TermScoreFunctionFactory parse splits key:value on commas,
  * src/TermScoreFunctionFactory.cpp:108-127), so the EFFECTIVE default
  * is Jelinek-Mercer with collectionLambda 0.4; we reproduce that
  * effective default and the tolerant colon-less-token parse.
  *
  * Output per query (printClarity, clarity.cpp:83-112):
  * `# query: <q> = <count> <clarity>` then `<term> <contribution>`
  * lines (contribution = p(w|Q)·log₂(p(w|Q)/p(w)), unnormalized).
  */
object ClarityApp {

  final case class Params(
      indexPaths: Seq[String] = Nil,
      queries: Seq[String] = Nil,
      documents: Int = 5,
      terms: Int = 10,
      smoothing: String = "method:jm",
      rule: Option[String] = None,
      rules: Seq[String] = Nil)

  /** tolerant rule parse: comma-separated tokens, only `key:value`
    * shaped tokens survive (the factory's int-truncation parse drops
    * colon-less tokens into garbage keys — same effective result)
    */
  def parseSmoothing(spec: String): ScoringRule = {
    val clean = spec.split(",").iterator.map(_.trim)
      .filter(t => t.nonEmpty && t.contains(':')).mkString(",")
    ScoringRule.parse(if (clean.isEmpty) "method:jm" else clean)
  }

  def parseParams(xml: String): Params = fromTree(ParamTree.parseXml(xml))

  def fromTree(t: ParamTree): Params = Params(
    indexPaths = t.kids.collect {
      case (n, v) if n == "index" || n == "server" => v.value
    },
    queries = t.all("query").map(q =>
      q.first("text").map(_.value).getOrElse(q.value)),
    documents = t.getInt("documents", 5),
    terms = t.getInt("terms", 10),
    smoothing = t.get("smoothing", "method:jm"),
    rule = t.getOpt("rule"),
    rules = t.list("rule"))

  def overlay(p: Params, args: Seq[String]): Params =
    args.foldLeft(p) { (acc, a) =>
      val s = a.stripPrefix("-")
      val i = s.indexOf('=')
      require(i > 0, s"command-line parameter must be -key=value: $a")
      val (k, v) = (s.substring(0, i), s.substring(i + 1))
      k match {
        case "index" | "server" => acc.copy(indexPaths = acc.indexPaths :+ v)
        case "query" => acc.copy(queries = acc.queries :+ v)
        case "documents" => acc.copy(documents = v.toInt)
        case "terms" => acc.copy(terms = v.toInt)
        case "smoothing" => acc.copy(smoothing = v)
        case "rule" => acc.copy(rule = Some(v), rules = acc.rules :+ v)
        case _ => acc
      }
    }

  def validate(p: Params): Unit = {
    require(p.queries.nonEmpty && p.indexPaths.nonEmpty,
      "clarity usage: clarity -query=myquery -index=myindex -documents=10 -terms=5")
  }

  /** top-`terms` smoothed RM grams with clarity contributions:
    * (term, pwq, contribution) — pwq the smoothed gram weight, pw the
    * collection stem frequency ctf/|C| of the gram's FIRST term
    * (clarity.cpp uses grams[j]->terms[0], :70-78), contribution in bits.
    */
  def clarityRows(engine: Engine, query: String, p: Params): Seq[(String, Double, Double)] = {
    val grams = RelevanceModel.gramModel(engine, query,
      RelevanceModel.GramParams(documents = p.documents, maxGrams = 1,
        smoothing = Some(parseSmoothing(p.smoothing))))
      .limit(p.terms).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSeq
    if (grams.isEmpty) return Nil
    val tstats = engine.termStatsFor(grams.map(_._1.split(' ').head))
    val tt = engine.termCount().toDouble
    grams.map { case (g, pwq) =>
      val pw = tstats.get(g.split(' ').head).map(_.ctf.toDouble).getOrElse(0.0) / tt
      (g, pwq, pwq * math.log(pwq / pw) / math.log(2.0))
    }
  }

  /** the scalar clarity score over the rows: Σcontrib / Σpwq
    * (clarity.cpp:62-81 `clarity`; Σpwq=0 guards to 1)
    */
  def clarityOf(rows: Seq[(String, Double, Double)]): Double = {
    val sum = rows.map(_._2).sum
    rows.map(_._3).sum / (if (sum != 0.0) sum else 1.0)
  }

  /** printClarity lines (clarity.cpp:83-112) */
  def clarityLines(query: String, rows: Seq[(String, Double, Double)]): Seq[String] =
    s"# query: $query = ${rows.size} ${RunQuery.cppDouble(clarityOf(rows))}" +:
      rows.map { case (t, _, c) => s"$t ${RunQuery.cppDouble(c)}" }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ClarityApp <param.xml> [-key=value ...]")
    val xml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args.head)), "UTF-8")
    val p = overlay(parseParams(xml), args.tail.toSeq)
    validate(p)
    val spark = SparkSession.builder()
      .appName("graft-clarity")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    // rules (plural) ride along so a selector-carrying rule engages the
    // per-scorer matching list instead of applying globally
    val rq = RunQuery.Params(indexPaths = p.indexPaths, rule = p.rule,
      rules = p.rules)
    val engine = RunQuery.openEnvironment(spark, rq, Analyzer())
    for (q <- p.queries; line <- clarityLines(q, clarityRows(engine, q, p)))
      println(line)
    spark.stop()
  }
}

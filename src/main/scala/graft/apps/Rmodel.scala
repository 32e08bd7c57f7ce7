package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analysis.Analyzer
import graft.search.{Engine, RelevanceModel}

/** The rmodel application surface (reference: rmodel/rmodel.cpp):
  * builds an n-gram relevance model from the top `documents` results of
  * each query and prints the gram table.
  *
  * Parameter surface (rmodel.cpp:19-23,79-120): `index`* / `server`*
  * (federate via addIndex), `query`*, `documents` (required — feedback
  * set size), `maxGrams` (default 1 = unigram), `rule`* (smoothing for
  * the RETRIEVAL; the model itself always uses the unsmoothed
  * occurrences/contextLength branch — rmodel.cpp:110 passes
  * rmSmoothing "").
  *
  * Output per query (printGrams, rmodel.cpp:63-77):
  * `# query: <text>` then one line per gram:
  * `<weight, ostream setw(15) setprecision(15)> <termCount> <terms…> `.
  */
object Rmodel {

  final case class Params(
      indexPaths: Seq[String] = Nil,
      queries: Seq[String] = Nil,
      documents: Int = 10,
      maxGrams: Int = 1,
      rule: Option[String] = None,
      rules: Seq[String] = Nil)

  def parseParams(xml: String): Params = fromTree(ParamTree.parseXml(xml))

  def fromTree(t: ParamTree): Params = Params(
    indexPaths = t.kids.collect {
      case (n, v) if n == "index" || n == "server" => v.value
    },
    queries = t.all("query").map(q =>
      q.first("text").map(_.value).getOrElse(q.value)),
    documents = t.getInt("documents", 10),
    maxGrams = t.getInt("maxGrams", 1),
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
        case "maxGrams" => acc.copy(maxGrams = v.toInt)
        case "rule" => acc.copy(rule = Some(v), rules = acc.rules :+ v)
        case _ => acc
      }
    }

  /** usage gate (rmodel.cpp:79-89): query, index|server and documents
    * are all required
    */
  def validate(p: Params): Unit = {
    require(p.queries.nonEmpty && p.indexPaths.nonEmpty,
      "rmodel usage: rmodel -query=myquery -index=myindex -documents=10 -maxGrams=2")
  }

  /** one gram table per query: (gram, n, weight) weight-descending */
  def execute(engine: Engine, p: Params): Seq[(String, DataFrame)] =
    p.queries.map { q =>
      q -> RelevanceModel.gramModel(engine, q,
        RelevanceModel.GramParams(documents = p.documents, maxGrams = p.maxGrams))
    }

  /** ostream `setw(15) << setprecision(15)` double text: %.15g general
    * formatting, trailing zeros trimmed, right-padded to width 15
    * (reference: rmodel.cpp:66-68)
    */
  def gramWeightText(w: Double): String = {
    val s = RunQuery.cppDouble(w, precision = 15)
    if (s.length >= 15) s else (" " * (15 - s.length)) + s
  }

  /** printGrams lines for one query's gram table (rmodel.cpp:63-77) */
  def gramLines(query: String, grams: DataFrame): Seq[String] = {
    val rows = grams.collect()
    s"# query: $query" +: rows.toSeq.map { r =>
      val terms = r.getString(0).split(' ')
      s"${gramWeightText(r.getDouble(2))} ${terms.length} ${terms.mkString(" ")} "
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Rmodel <param.xml> [-key=value ...]")
    val xml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args.head)), "UTF-8")
    val p = overlay(parseParams(xml), args.tail.toSeq)
    validate(p)
    val spark = SparkSession.builder()
      .appName("graft-rmodel")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    // rules (plural) ride along so a selector-carrying rule engages the
    // per-scorer matching list instead of applying globally
    val rq = RunQuery.Params(indexPaths = p.indexPaths, rule = p.rule,
      rules = p.rules)
    val engine = RunQuery.openEnvironment(spark, rq, Analyzer())
    for ((q, grams) <- execute(engine, p); line <- gramLines(q, grams))
      println(line)
    spark.stop()
  }
}

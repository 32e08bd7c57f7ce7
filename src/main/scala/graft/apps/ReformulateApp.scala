package graft.apps

import graft.search.Reformulate

/** The reformulate application surface (reference:
  * reformulate/ReformulateQuery.cpp): read `query` entries from an
  * indri parameter file, push the WHOLE parameter tree into the
  * reformulator (`QueryEnvironment::setFormulationParameters`,
  * src/QueryEnvironment.cpp:1410-1414 — the formulation knobs live at
  * the top level), transform each query, and write a new
  * `<parameters>` queries file.
  *
  * Reference behaviors reproduced exactly:
  *  - query numbers: `<number>` when present, else `queryOffset + i`
  *    with queryOffset HARDCODED to 1 in the app (ReformulateQuery
  *    .cpp:24 — the parameter-file queryOffset is never read here,
  *    unlike IndriRunQuery);
  *  - bare `<query>text</query>` entries and `<query><text>…</text>
  *    </query>` blocks both accepted, the block form only when `text`
  *    exists (queryText falls back to the node value when empty);
  *  - formulation knobs (src/ReformulateQuery.cpp:320-345):
  *    stopStructures / liteStop (default true), genSDM / genFDM /
  *    genCMUFDM (default false, checked in that order), weightT/O/U,
  *    `queryField` blocks (name + weight) for the weighted-field
  *    SDM/FDM variants, and the CMU mixture weights (weightMixture,
  *    weightDependency, weightURL/Title/Body/Meta/Alt/Inlink);
  *  - output file (default `queries.param`):
  *    `<parameters>` line, then per query
  *    `<query><number>N</number>\n<text>REFORM</text>\n</query>` line,
  *    then `</parameters>` line (ReformulateQuery.cpp:26-50 — the
  *    `\n` inside the block comes from the literal, the line breaks
  *    from std::endl).
  */
object ReformulateApp {

  final case class QueryIn(number: Option[String], text: String)

  final case class Params(
      queries: Seq[QueryIn] = Nil,
      outfile: String = "queries.param",
      formulation: Reformulate.Params = Reformulate.Params(),
      mode: Reformulate.Mode = Reformulate.GenCombine)

  def fromTree(t: ParamTree): Params = {
    val queries = t.all("query").map { q =>
      val text = q.first("text").map(_.value).filter(_.nonEmpty).getOrElse(q.value)
      QueryIn(q.first("number").map(_.value), text)
    }
    val fields = t.all("queryField").map(f =>
      Reformulate.WeightedField(f.get("name", ""), f.get("weight", "")))
    val cmuFw = Seq("URL" -> "url", "Title" -> "title", "Body" -> "body",
      "Meta" -> "meta", "Alt" -> "alt", "Inlink" -> "inlink").flatMap {
      case (suffix, field) => t.getOpt(s"weight$suffix").map(field -> _)
    }.toMap
    val formulation = Reformulate.Params(
      weightT = t.get("weightT", "0.85"),
      weightO = t.get("weightO", "0.1"),
      weightU = t.get("weightU", "0.05"),
      stopStructures = t.getBool("stopStructures", default = true),
      liteStop = t.getBool("liteStop", default = true),
      fields = fields,
      mixtureWeight = t.get("weightMixture", "1.0"),
      dependencyWeight = t.get("weightDependency", "1.0"),
      fieldWeights = cmuFw)
    // genSDM, then genFDM, then genCMUFDM — the reference checks the
    // flags in this order (src/ReformulateQuery.cpp:344-352)
    val mode =
      if (t.getBool("genSDM", default = false)) Reformulate.GenSDM
      else if (t.getBool("genFDM", default = false)) Reformulate.GenFDM
      else if (t.getBool("genCMUFDM", default = false)) Reformulate.GenCMUFDM
      else Reformulate.GenCombine
    Params(queries, t.get("outfile", "queries.param"), formulation, mode)
  }

  /** the output `<parameters>` file body (exact reference ostream bytes) */
  def render(p: Params): String = {
    val sb = new StringBuilder
    sb.append("<parameters>\n")
    p.queries.zipWithIndex.foreach { case (q, i) =>
      val number = q.number.getOrElse((1 + i).toString)
      val reform = Reformulate.transform(q.text, p.mode, p.formulation)
      sb.append(s"<query><number>$number</number>\n<text>$reform</text>\n</query>\n")
    }
    sb.append("</parameters>\n")
    sb.toString
  }

  def run(paramXml: String, overlays: Seq[String]): (String, String) = {
    val tree = ParamTree.overlay(ParamTree.parseXml(paramXml), overlays)
    val p = fromTree(tree)
    (p.outfile, render(p))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ReformulateApp <param.xml> [-key=value ...]")
    val xml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args.head)), "UTF-8")
    val (outfile, body) = run(xml, args.tail.toSeq)
    java.nio.file.Files.write(java.nio.file.Paths.get(outfile),
      body.getBytes("UTF-8"))
  }
}

package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.HarvestLinks

/** The harvestlinks application surface (reference:
  * harvestlinks/harvestlinks.cpp): extract the anchor/link graph from a
  * corpus into an output directory that the pagerank application (and
  * anchor-text indexing) consume.
  *
  * Parameter surface (harvestlinks.cpp:663-681): `corpus` (required),
  * `output` (required), `class` (corpus file class — here `parquet`, a
  * table of (doc_id, url, html); the reference default trecweb names a
  * container format this engine's input tables replace), `redirect`
  * (optional two-column whitespace text: from-url to-url). The phase
  * toggles `delete`/`harvest`/`sort`/`clean`/`combine` and
  * `mergethreads` orchestrate the reference's temp-file pipeline
  * (:687-767) — one Spark job subsumes them, they parse as no-ops.
  *
  * Output layout: `<output>/links` — resolved in-corpus link records
  * (src_doc, src_url, link_ord, dst_url, anchor, dst_doc), the sorted/
  * combined product of the reference pipeline; `<output>/anchors` —
  * per-target anchor-text records (dst_doc, n_inlinks, anchors), the
  * AnchorTextAnnotator input shape.
  */
object HarvestLinksApp {

  final case class Params(
      corpus: String = "",
      output: String = "",
      fileClass: String = "parquet",
      redirect: Option[String] = None)

  def parseParams(xml: String): Params = fromTree(ParamTree.parseXml(xml))

  def fromTree(t: ParamTree): Params = Params(
    corpus = t.get("corpus", ""),
    output = t.get("output", ""),
    fileClass = t.get("class", "parquet"),
    redirect = t.getOpt("redirect").filter(_.nonEmpty))

  def overlay(p: Params, args: Seq[String]): Params =
    args.foldLeft(p) { (acc, a) =>
      val s = a.stripPrefix("-")
      val i = s.indexOf('=')
      require(i > 0, s"command-line parameter must be -key=value: $a")
      val (k, v) = (s.substring(0, i), s.substring(i + 1))
      k match {
        case "corpus" => acc.copy(corpus = v)
        case "output" => acc.copy(output = v)
        case "class" => acc.copy(fileClass = v)
        case "redirect" => acc.copy(redirect = Some(v).filter(_.nonEmpty))
        case _ => acc
      }
    }

  def validate(p: Params): Unit = {
    require(p.corpus.nonEmpty && p.output.nonEmpty,
      "harvestlinks usage: harvestlinks -corpus=<path> -output=<path>")
    require(p.fileClass == "parquet",
      s"unsupported corpus class '${p.fileClass}' — the engine ingests " +
        "tables (class=parquet with doc_id, url, html columns)")
  }

  /** two-column whitespace redirect file → (from_url, to_url) */
  def readRedirects(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(trim(col("value")), "\\s+").as("f"))
      .where(size(col("f")) >= 2)
      .select(element_at(col("f"), 1).as("from_url"),
        element_at(col("f"), 2).as("to_url"))

  /** harvest → conflate → resolve → write links + anchors */
  def run(spark: SparkSession, p: Params): DataFrame = {
    val docs = spark.read.parquet(p.corpus)
    val raw = HarvestLinks.harvest(docs)
    val conflated = p.redirect match {
      case Some(r) => HarvestLinks.conflate(raw, readRedirects(spark, r))
      case None => raw
    }
    val resolved = HarvestLinks.resolve(conflated,
      docs.select(col("url"), col("doc_id")))
    resolved.write.mode("overwrite").parquet(s"${p.output}/links")
    HarvestLinks.anchorText(resolved)
      .write.mode("overwrite").parquet(s"${p.output}/anchors")
    resolved
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: HarvestLinksApp <param.xml> [-key=value ...]")
    val xml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args.head)), "UTF-8")
    val p = overlay(parseParams(xml), args.tail.toSeq)
    validate(p)
    val spark = SparkSession.builder()
      .appName("graft-harvestlinks")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    run(spark, p)
    println(s"harvested links into ${p.output}")
    spark.stop()
  }
}

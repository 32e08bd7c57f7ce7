package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.PageRank

/** The pagerank application surface (reference: pagerank/pagerank.cpp):
  * compute PageRank over harvestlinks output and write raw scores,
  * integer ranks and/or makeprior-ready log-probability priors.
  *
  * Parameter surface (pagerank.cpp:18-61,133-194): `corpus` (the page
  * table — doc_id, url, html), `links` (harvestlinks output directory),
  * `output` (basename for the result files), `index` (optional — with
  * an index the reference runs all docs per iteration with defaults
  * iters=100, c=0.85; without, iters=10, c=0.5), `docs` (docs per
  * iteration in the reference's streaming loop — one Spark job always
  * processes every doc, parses as a no-op), `iters`, `c`, `writeRaw`,
  * `writeRanks`, `writePriors` (default true).
  *
  * `convert` mode (pagerank.cpp:142-152 + convertPriors :84-131):
  * `-convert=true -input=<doc score text, score-sorted> -output=<file>
  * -numDocs=N` bins an EXTERNAL score file into ranks and emits
  * (doc, logprob) lines without running PageRank.
  *
  * Outputs (one text line per doc, score-descending):
  * `<output>.raw` — `docno score`; `<output>.ranks` — `docno rank`
  * (ranks 1..10, src/PageRank.cpp:276-301); `<output>.prior` —
  * `docno logprob` via the `_intToProb` table, the makeprior input
  * format (pagerank.cpp:59-60).
  */
object PageRankApp {

  final case class Params(
      corpus: String = "",
      links: String = "",
      output: String = "",
      index: Option[String] = None,
      docsPerIter: Int = 1000,
      iters: Option[Int] = None,
      c: Option[Double] = None,
      writeRaw: Boolean = false,
      writeRanks: Boolean = false,
      writePriors: Boolean = true,
      convert: Boolean = false,
      input: String = "",
      numDocs: Long = 0L)

  /** effective damping/iterations: index present → (100, 0.85), absent →
    * (10, 0.5) (pagerank.cpp:166-176)
    */
  def effectiveIters(p: Params): Int = p.iters.getOrElse(if (p.index.isDefined) 100 else 10)
  def effectiveC(p: Params): Double = p.c.getOrElse(if (p.index.isDefined) 0.85 else 0.5)

  def parseParams(xml: String): Params = fromTree(ParamTree.parseXml(xml))

  def fromTree(t: ParamTree): Params = Params(
    corpus = t.get("corpus", ""),
    links = t.get("links", ""),
    output = t.get("output", ""),
    index = t.getOpt("index").filter(_.nonEmpty),
    docsPerIter = t.getInt("docs", 1000),
    iters = t.getOpt("iters").map(_.toInt),
    c = t.getOpt("c").map(_.toDouble),
    writeRaw = t.getBool("writeRaw", default = false),
    writeRanks = t.getBool("writeRanks", default = false),
    writePriors = t.getBool("writePriors", default = true),
    convert = t.getBool("convert", default = false),
    input = t.get("input", ""),
    numDocs = t.get("numDocs", "0").toLong)

  def overlay(p: Params, args: Seq[String]): Params =
    args.foldLeft(p) { (acc, a) =>
      val s = a.stripPrefix("-")
      val i = s.indexOf('=')
      require(i > 0, s"command-line parameter must be -key=value: $a")
      val (k, v) = (s.substring(0, i), s.substring(i + 1))
      k match {
        case "corpus" => acc.copy(corpus = v)
        case "links" => acc.copy(links = v)
        case "output" => acc.copy(output = v)
        case "index" => acc.copy(index = Some(v).filter(_.nonEmpty))
        case "docs" => acc.copy(docsPerIter = v.toInt)
        case "iters" => acc.copy(iters = Some(v.toInt))
        case "c" => acc.copy(c = Some(v.toDouble))
        case "writeRaw" => acc.copy(writeRaw = v == "true" || v == "1")
        case "writeRanks" => acc.copy(writeRanks = v == "true" || v == "1")
        case "writePriors" => acc.copy(writePriors = v == "true" || v == "1")
        case "convert" => acc.copy(convert = v == "true" || v == "1")
        case "input" => acc.copy(input = v)
        case "numDocs" => acc.copy(numDocs = v.toLong)
        case _ => acc
      }
    }

  def validate(p: Params): Unit =
    if (p.convert)
      require(p.input.nonEmpty && p.output.nonEmpty && p.numDocs > 0,
        "pagerank convert usage: -convert=true -input=<file> -output=<file> -numDocs=N")
    else
      require(p.corpus.nonEmpty && p.links.nonEmpty && p.output.nonEmpty,
        "pagerank usage: pagerank -corpus=<path> -links=<path> -output=<basename>")

  /** PageRank scores over the harvested link graph: nodes = every
    * corpus page, edges = distinct resolved (src, dst). Returns
    * (docno, id, pr) — docno is the corpus table's `docno` column when
    * it carries one (the retrieveMetadatum analogue, pagerank.cpp's
    * index path), else the doc_id as text (the no-index path,
    * pagerank.cpp:38-40). The `index` parameter here only switches the
    * iteration/damping defaults — the reference's other index effect
    * (all docs per iteration instead of `docs`-sized batches) is how
    * a Spark job always runs.
    */
  def computeScores(spark: SparkSession, p: Params): DataFrame = {
    val corpus = spark.read.parquet(p.corpus)
    val links = spark.read.parquet(s"${p.links}/links")
    val edges = links.select(col("src_doc").as("src"), col("dst_doc").as("dst"))
      .distinct()
    val pr = PageRank.compute(corpus.select(col("doc_id")), edges,
      c = effectiveC(p), iterations = effectiveIters(p))
    val docnoCol =
      if (corpus.columns.contains("docno")) col("docno")
      else col("doc_id").cast("string")
    val docno = corpus.select(col("doc_id").as("id"), docnoCol.as("docno"))
    pr.join(docno, Seq("id")).select(col("docno"), col("id"), col("pr"))
  }

  /** run + write the requested files; returns (docno, id, pr, rank,
    * logprob) for callers/tests. Output files are written DISTRIBUTED
    * (range-partitioned sorted text parts under `<output><suffix>/`;
    * part files in name order = the reference's sorted flat file) — the
    * prior file of a web-scale corpus is corpus-sized, it must never
    * collect or funnel through one reducer; MakePrior.readInput and
    * spark.read.text consume the directory exactly like the
    * reference's flat file.
    */
  def run(spark: SparkSession, p: Params): DataFrame = {
    val scores = computeScores(spark, p)
    val ranked = PageRank.toIntRanks(scores.select(col("id"), col("pr")))
    val prob = udf((r: Int) => PageRank.IntToProb(r))
    val full = scores.join(ranked.select(col("id"), col("rank")), Seq("id"))
      .select(col("docno"), col("id"), col("pr"), col("rank"),
        prob(col("rank")).as("logprob"))
      .cache()
    // globally-sorted DISTRIBUTED write: range partitions are assigned
    // ascending partition ids, so the part files concatenated in name
    // order ARE the reference's sorted flat file — no single reducer
    // funnels a corpus-sized prior file
    def write(suffix: String, line: org.apache.spark.sql.Column): Unit =
      full.repartitionByRange(round(col("pr"), 6).desc, col("id").asc)
        .sortWithinPartitions(round(col("pr"), 6).desc, col("id").asc)
        .select(line.cast("string").as("value"))
        .write.mode("overwrite").text(p.output + suffix)
    if (p.writeRaw)
      write(".raw", concat_ws(" ", col("docno"), col("pr").cast("string")))
    if (p.writeRanks)
      write(".ranks", concat_ws(" ", col("docno"), col("rank").cast("string")))
    if (p.writePriors)
      write(".prior", concat_ws(" ", col("docno"), col("logprob").cast("string")))
    full
  }

  /** convert mode: bin an external score-sorted (doc, score) text file
    * (convertPriors, pagerank.cpp:84-131). numDocs sets B — the
    * reference bins against the COLLECTION size, not the file's row
    * count. The global position comes from the same range-partitioned
    * row-number shape as `PageRank.toIntRanks` (a prior file is
    * corpus-sized — no single-reducer sort).
    */
  def convert(spark: SparkSession, p: Params): Unit = {
    val in = spark.read.text(p.input)
      .select(split(trim(col("value")), "\\s+").as("f"))
      .where(size(col("f")) >= 2)
      .select(element_at(col("f"), 1).as("doc"),
        element_at(col("f"), 2).cast("double").as("val"))
    val (numbered, ranged, _) =
      PageRank.globalRowNumber(in, Seq(col("val").desc, col("doc").asc))
    val rankCol =
      PageRank.rankFromBounds(col("__rn"), PageRank.binBounds(p.numDocs, 10))
    val prob = udf((r: Int) => PageRank.IntToProb(r))
    // the numbering window hash-shuffles on __pid (ENSURE_REQUIREMENTS),
    // so `numbered` is NOT in range order anymore — re-range-partition
    // on the sort keys like run()'s writers so part files concatenated
    // in name order form the global sort; distributed, no repartition(1)
    numbered.select(col("doc"), col("val"), prob(rankCol).as("lp"))
      .repartitionByRange(col("val").desc, col("doc").asc)
      .sortWithinPartitions(col("val").desc, col("doc").asc)
      .select(concat_ws(" ", col("doc"), col("lp").cast("string")).as("value"))
      .write.mode("overwrite").text(p.output)
    ranged.unpersist(false)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PageRankApp <param.xml> [-key=value ...]")
    val xml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args.head)), "UTF-8")
    val p = overlay(parseParams(xml), args.tail.toSeq)
    validate(p)
    val spark = SparkSession.builder()
      .appName("graft-pagerank")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    if (p.convert) convert(spark, p) else run(spark, p)
    spark.stop()
  }
}

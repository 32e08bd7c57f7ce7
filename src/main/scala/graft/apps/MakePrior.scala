package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The makeprior application surface (reference: makeprior/makeprior.cpp):
  * build a NAMED per-document log-prior table from a (docno, logprob)
  * text file and install it inside a repository, where `#prior(name)`
  * queries find it.
  *
  * Parameter surface (makeprior.cpp:387-422): `index` (repository),
  * `input` (two-column whitespace text: docno, log probability), `name`
  * (the prior's name), `memory` (sort budget — parsed for parity,
  * unused: Spark sorts/spills itself).
  *
  * Semantics kept from the reference:
  *  - docnos resolve through the repository's docno metadata; entries
  *    whose docno doesn't exist are skipped SILENTLY
  *    (convert_docnoscore_to_binary, makeprior.cpp:278-280); a docno
  *    matching several documents takes the FIRST (result[0], :282);
  *  - the installed prior is conceptually DENSE over all documents:
  *    docs missing from the input carry lowProbability = −1e10
  *    (merge_sorted_runs, makeprior.cpp:130,142-145,164-167) — stored
  *    sparse here, the default applied at query bind (Engine.setPrior);
  *  - installing over an existing prior of the same name replaces it
  *    (install_prior, :374-376).
  *
  * The reference's ≤256-distinct-value compression table
  * (makeprior.cpp:340-362) is a file-format detail — Parquet dictionary
  * encoding does the same transparently.
  */
object MakePrior {

  /** lowProbability (makeprior.cpp:130) */
  val DefaultLogPrior: Double = -1e10

  final case class Params(
      indexPath: String = "",
      input: String = "",
      name: String = "")

  def parseParams(xml: String): Params = fromTree(ParamTree.parseXml(xml))

  def fromTree(t: ParamTree): Params = Params(
    indexPath = t.get("index", ""),
    input = t.get("input", ""),
    name = t.get("name", ""))

  def overlay(p: Params, args: Seq[String]): Params =
    args.foldLeft(p) { (acc, a) =>
      val s = a.stripPrefix("-")
      val i = s.indexOf('=')
      require(i > 0, s"command-line parameter must be -key=value: $a")
      val (k, v) = (s.substring(0, i), s.substring(i + 1))
      k match {
        case "index" => acc.copy(indexPath = v)
        case "input" => acc.copy(input = v)
        case "name" => acc.copy(name = v)
        case _ => acc
      }
    }

  def validate(p: Params): Unit =
    require(p.indexPath.nonEmpty && p.input.nonEmpty && p.name.nonEmpty,
      "makeprior usage: makeprior -index=myindex -input=myinputfile -name=priorname")

  /** parse the two-column whitespace input file into (docno, logPrior) —
    * the `in >> docno >> score` stream read (makeprior.cpp:261-266)
    */
  def readInput(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(trim(col("value")), "\\s+").as("f"))
      .where(size(col("f")) >= 2)
      .select(element_at(col("f"), 1).as("docno"),
        element_at(col("f"), 2).cast("double").as("logPrior"))

  /** resolve docnos through the repo metadata and write the prior table
    * under `<index>/prior/<name>` (install_prior layout,
    * makeprior.cpp:364-385)
    */
  def install(spark: SparkSession, indexPath: String, name: String,
              input: DataFrame): Unit = {
    val meta = BuildIndex.openMetadata(spark, indexPath).getOrElse(
      throw new IllegalArgumentException(
        s"repository $indexPath has no docno metadata — cannot resolve priors"))
    val resolved = input
      // input-file order: a repeated docno keeps its FIRST line's score,
      // deterministically (an unordered first() could install different
      // values across reruns). Defined deviation: the reference's merge
      // writes BOTH duplicate scores positionally and corrupts every
      // later doc's slot (makeprior.cpp:139-162 never skips equal keys
      // after an unstable qsort) — undefined behavior we replace.
      .withColumn("__line", monotonically_increasing_id())
      .join(meta.select(col("docId"), col("docno")), Seq("docno"))
      // first matching document per docno (documentIDsFromMetadata
      // result[0], makeprior.cpp:282)
      .groupBy("docno").agg(min(col("docId")).as("docId"),
        min_by(col("logPrior"), col("__line")).as("logPrior"))
      .select(col("docId"), col("logPrior"))
    // distributed write, range-clustered by docId: a pagerank prior is
    // one row per corpus document, so a coalesce(1) here would funnel
    // the whole resolve join through one task; range clustering gives
    // each parquet file a tight docId min/max for scan pruning
    resolved.repartitionByRange(col("docId")).write.mode("overwrite")
      .parquet(priorDir(indexPath, name))
  }

  def priorDir(indexPath: String, name: String): String =
    s"$indexPath/prior/$name"

  /** names of the priors installed in a repository */
  def storedPriors(indexPath: String): Seq[String] = {
    val d = java.nio.file.Paths.get(indexPath, "prior")
    if (!java.nio.file.Files.isDirectory(d)) return Nil
    val s = java.nio.file.Files.list(d)
    try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
      .filter(java.nio.file.Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq.sorted
    finally s.close()
  }

  def open(spark: SparkSession, indexPath: String, name: String): DataFrame =
    spark.read.parquet(priorDir(indexPath, name))

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: MakePrior <param.xml> [-key=value ...]")
    val xml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args.head)), "UTF-8")
    val p = overlay(parseParams(xml), args.tail.toSeq)
    validate(p)
    val spark = SparkSession.builder()
      .appName("graft-makeprior")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    install(spark, p.indexPath, p.name, readInput(spark, p.input))
    println(s"installed prior '${p.name}' in ${p.indexPath}")
    spark.stop()
  }
}

package graft.apps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.{FieldSpec, IndexBuilder, IndexConfig, InvertedIndex, SegmentStore}

/** The IndriBuildIndex application surface (reference:
  * buildindex/IndriBuildIndex.cpp:958-1100): an XML parameter file names
  * the corpus, the output repository, the indexed fields, the metadata
  * fields, and the analysis chain (stemmer / stopper / normalize); the
  * app builds the repository and leaves it openable by RunQuery.
  *
  * Parameter surface (same element names as the reference's usage
  * block, IndriBuildIndex.cpp:27-260): `index`, `corpus.path`* (+
  * `corpus.class`), `memory` (accepted and size-parsed for parameter
  * compatibility; Spark owns executor memory so it does not steer the
  * build), `field`* (`name`, `numeric`, `parserName`), `metadata`
  * (`field`/`forward`/`backward`* — one Spark-side metadata table serves
  * both lookup directions, and `docno` is auto-added like the
  * reference's IndriBuildIndex.cpp:1012-1021), `stemmer.name`,
  * `normalize`, `stopper.word`*. Command-line overlays are `-key=value`
  * dotted paths on the [[ParamTree]].
  *
  * Corpus contract: each `corpus.path` is a parquet table of
  * source-code documents with columns (repo, path, commit, content) —
  * the engine's input shape. The reference's `corpus.class` names a
  * file container format (trectext, warc, …); here the container IS the
  * table, so only `parquet`/`table` (or omitted) are accepted and
  * anything else raises the contract error rather than misreading data.
  * The external document id (`docno` metadata) is `repo/path@commit`.
  *
  * Create-vs-open: the reference appends to an existing repository
  * after `_recoverRepository` crash recovery (IndriBuildIndex.cpp:
  * 1042-1056). Our store's analogue is checkpointed resumability —
  * `SegmentStore.writeAll` skips every table whose success marker and
  * config fingerprint already match, so rerunning the app after a crash
  * resumes instead of rebuilding. Appending NEW documents to a live
  * repository is the streaming surface
  * (graft.streaming.IncrementalIndexer generations), not this app.
  */
object BuildIndex {

  final case class Params(
      repoPath: String,
      corpusPaths: Seq[String],
      memoryBytes: Long = 1024L * 1024 * 1024,
      fields: Seq[FieldSpec] = Nil,
      metadataFields: Seq[String] = Nil, // docno NOT included; always written
      // <corpus><metadata> offset metadata files (docno\tkey\tvalue),
      // reference: IndriBuildIndex.cpp:1091-1092 setOffsetMetadataPath
      offsetMetadataFiles: Seq[String] = Nil,
      stemmerName: String = "none",
      normalize: Boolean = true,
      stopwords: Set[String] = Set.empty)

  // ------------------------------------------------------------------
  // parameter parsing
  // ------------------------------------------------------------------

  def parseParams(xml: String): Params = fromTree(ParamTree.parseXml(xml))

  def fromTree(t: ParamTree): Params = {
    val corpora = t.all("corpus")
    require(corpora.nonEmpty, "required parameter <corpus> is missing")
    val paths = corpora.map { c =>
      val p = c.get("path", "")
      require(p.nonEmpty, "required parameter <corpus><path> is missing")
      c.getOpt("class").foreach { cls =>
        require(cls == "parquet" || cls == "table",
          s"corpus class '$cls' unsupported: the Spark engine reads a " +
            "parquet table of (repo, path, commit, content) rows; " +
            "container file classes (trectext, warc, ...) do not apply")
      }
      p
    }
    val offsetMeta = corpora.flatMap(_.getOpt("metadata")).filter(_.nonEmpty)
    val repo = t.get("index", "")
    require(repo.nonEmpty, "required parameter <index> is missing")
    // reference: metadata names are downcased, docno auto-added
    // (IndriBuildIndex.cpp:1004-1021); field/forward/backward converge
    // on the one metadata table here
    val meta = (t.list("metadata.field") ++ t.list("metadata.forward") ++
      t.list("metadata.backward")).map(_.toLowerCase(java.util.Locale.ROOT))
      .distinct.filterNot(_ == "docno")
    Params(
      repoPath = repo,
      corpusPaths = paths,
      memoryBytes = parseMemory(t.get("memory", "1G")),
      fields = t.all("field").map(fieldSpec),
      metadataFields = meta,
      offsetMetadataFiles = offsetMeta,
      stemmerName = stemmerFor(t.get("stemmer.name", "none")),
      normalize = t.getBool("normalize", default = true),
      stopwords = t.list("stopper.word").toSet)
  }

  /** `<field><name>n</name><numeric>true</numeric><parserName>…` →
    * FieldSpec. parserName wins over the numeric flag when both appear,
    * matching the reference's per-parser registration
    * (IndriBuildIndex.cpp process_numeric_fields: parserName default
    * NumericFieldAnnotator; DateFieldAnnotator → date parsing).
    */
  def fieldSpec(f: ParamTree): FieldSpec = {
    val name = f.get("name", "")
    require(name.nonEmpty, "field block without <name>")
    val numeric = f.getBool("numeric", default = false)
    val parse = f.getOpt("parserName") match {
      case Some("DateFieldAnnotator") => "date"
      case Some("NumericFieldAnnotator") => "int"
      case Some(other) => throw new IllegalArgumentException(
        s"unknown field parserName '$other' " +
          "(NumericFieldAnnotator|DateFieldAnnotator)")
      case None => if (numeric) "int" else "none"
    }
    FieldSpec(name.toLowerCase(java.util.Locale.ROOT), parse)
  }

  /** reference stemmer names → engine stemmer registry. The arabic
    * family maps only for the light10 variants we implement; the other
    * Larkey variants fail loudly instead of silently stemming wrong.
    */
  def stemmerFor(name: String): String =
    name.toLowerCase(java.util.Locale.ROOT) match {
      case "none" | "" => "none"
      case "porter" => "porter"
      case "krovetz" => "krovetz"
      case "arabic_light10" | "arabic_light10_stop" => "arabic"
      case other => throw new IllegalArgumentException(
        s"unsupported stemmer '$other' (porter|krovetz|arabic_light10)")
    }

  /** `<memory>100M</memory>`: decimal digits + optional K/M/G suffix,
    * case-insensitive (reference usage block: K=1000, M=1e6, G=1e9).
    */
  def parseMemory(s: String): Long = {
    val t = s.trim
    require(t.nonEmpty, "empty memory value")
    val (digits, scale) = t.last.toUpper match {
      case 'K' => (t.dropRight(1), 1000L)
      case 'M' => (t.dropRight(1), 1000000L)
      case 'G' => (t.dropRight(1), 1000000000L)
      case _ => (t, 1L)
    }
    require(digits.nonEmpty && digits.forall(_.isDigit),
      s"memory must be digits plus optional K/M/G suffix: '$s'")
    digits.toLong * scale
  }

  def config(p: Params, base: IndexConfig = IndexConfig()): IndexConfig =
    base.copy(stemmerName = p.stemmerName, stopwords = p.stopwords,
      fields = p.fields, normalize = p.normalize)

  // ------------------------------------------------------------------
  // build
  // ------------------------------------------------------------------

  /** external document id — the docno metadata value */
  def docno(repo: Column, path: Column, commit: Column): Column =
    concat(repo, lit("/"), path, lit("@"), commit)

  /** Read every corpus table, build, write the repository (resumable —
    * complete tables skip), and persist the metadata side table
    * (docId, docno, requested columns) at `<repo>/metadata`. Returns
    * the built index handle.
    */
  def run(spark: SparkSession, p: Params,
          base: IndexConfig = IndexConfig()): InvertedIndex = {
    val cfg = config(p, base)
    val corpus = p.corpusPaths.map(spark.read.parquet(_)).reduce(_ unionByName _)
    val required = Seq("repo", "path", "commit", "content")
    val missing = required.filterNot(corpus.columns.contains)
    require(missing.isEmpty,
      s"corpus table lacks column(s) ${missing.mkString(", ")} — expected " +
        "(repo, path, commit, content)")
    val badMeta = p.metadataFields.filterNot(corpus.columns.map(
      _.toLowerCase(java.util.Locale.ROOT)).contains)
    require(badMeta.isEmpty,
      s"metadata field(s) ${badMeta.mkString(", ")} not in the corpus table")

    // same id assignment + content-sha invariant as buildFromCorpus,
    // kept open here so the id→docno mapping can persist as metadata
    val withSha = corpus.withColumn("content_sha256", sha2(col("content"), 256))
    val (docs, idCache) =
      IndexBuilder.assignDocIdsScalableCached(withSha, Seq("repo", "path", "commit"))
    val idx = IndexBuilder.build(docs.select(col("docId"), col("content")), cfg)
    SegmentStore.writeAll(idx, p.repoPath, cfg)
    writeChain(p.repoPath, cfg)
    val metaBase = docs.select(
      col("docId") +:
        docno(col("repo"), col("path"), col("commit")).as("docno") +:
        p.metadataFields.map(col): _*)
    // offset metadata injection (reference: OffsetMetadataAnnotator,
    // wired per corpus — pairs from every <corpus><metadata> file union
    // here since docnos embed the corpus identity)
    val metaOut =
      if (p.offsetMetadataFiles.isEmpty) metaBase
      else OffsetMetadata.annotate(spark, metaBase,
        p.offsetMetadataFiles.flatMap(OffsetMetadata.parseFile))
    metaOut.write.mode("overwrite").parquet(metadataDir(p.repoPath))
    // the CompressedCollection analogue: the raw document text persists
    // beside the index so `dumpindex dt/dd` and snippet surfaces serve
    // from the repository like the reference collection (reference:
    // src/CompressedCollection.cpp — Parquet page compression stands in
    // for the zlib stream)
    docs.select(col("docId"), col("content"))
      .write.mode("overwrite").parquet(collectionDir(p.repoPath))
    idx.doclens.count()
    idCache.unpersist(false)
    idx
  }

  def metadataDir(repoPath: String): String = s"$repoPath/metadata"

  def collectionDir(repoPath: String): String = s"$repoPath/collection"

  /** the stored collection (docId, content), when this repo has one —
    * gated on the write's _SUCCESS marker like [[openMetadata]], so a
    * build killed mid-collection-write is not silently served truncated
    */
  def openCollection(spark: SparkSession, repoPath: String): Option[DataFrame] =
    if (java.nio.file.Files.exists(
      java.nio.file.Paths.get(collectionDir(repoPath), "_SUCCESS")))
      Some(spark.read.parquet(collectionDir(repoPath)))
    else None

  private def chainFile(repoPath: String) =
    java.nio.file.Paths.get(repoPath, "analysis.properties")

  /** Persist the analysis chain in the repository, like the reference
    * manifest (Repository::save writes the parameters — stemmer,
    * stopper, normalize — so QueryEnvironment reopens with the SAME
    * chain the documents were indexed with, src/Repository.cpp:
    * _copyParameters/save).
    */
  def writeChain(repoPath: String, cfg: IndexConfig): Unit = {
    val lines = Seq(s"mode=${cfg.analyzerMode}",
      s"stemmer=${cfg.stemmerName}", s"normalize=${cfg.normalize}") ++
      cfg.stopwords.toSeq.sorted.map(w => s"stopword=$w")
    java.nio.file.Files.writeString(chainFile(repoPath),
      lines.mkString("", "\n", "\n"))
  }

  /** The analyzer a repository was built with, when the repo records
    * its chain. Openers prefer this over a caller-supplied analyzer —
    * querying through a different chain than the index's is always a
    * bug (terms would stem/stop differently than the postings).
    */
  def storedAnalyzer(repoPath: String): Option[Analyzer] = {
    val f = chainFile(repoPath)
    if (!java.nio.file.Files.exists(f)) return None
    val kvs = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(f)).asScala
      .filter(_.contains('=')).map { l =>
        val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1))
      }.toSeq
    def one(k: String, d: String) = kvs.collectFirst { case (`k`, v) => v }.getOrElse(d)
    Some(Analyzer(
      mode = one("mode", "indri"),
      stopwords = kvs.collect { case ("stopword", w) => w }.toSet,
      stemmer = graft.analysis.Stemmers.byName(one("stemmer", "none")),
      normalize = one("normalize", "true") == "true"))
  }

  /** metadata table of a stored repository, when the repo has one */
  def openMetadata(spark: SparkSession, repoPath: String): Option[DataFrame] =
    if (java.nio.file.Files.exists(
      java.nio.file.Paths.get(metadataDir(repoPath), "_SUCCESS")))
      Some(spark.read.parquet(metadataDir(repoPath)))
    else None

  /** parse file + overlay args + build — the `main` shape */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BuildIndex <param.xml> [-key=value ...]")
    val xml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args.head)), "UTF-8")
    val p = fromTree(ParamTree.overlay(ParamTree.parseXml(xml), args.tail.toSeq))
    val spark = SparkSession.builder()
      .appName("graft-buildindex")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    val idx = run(spark, p)
    val st = idx.stats
    println(s"Created repository ${p.repoPath}")
    println(s"documents: ${st.totalDocs} terms: ${st.totalTerms} " +
      s"unique terms: ${st.uniqueTerms}")
    spark.stop()
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.apps.{BuildIndex, ParamTree, RunQuery}
import graft.corpus.CorpusSynthesizer
import graft.index.{FieldSpec, IndexBuilder, IndexConfig, SegmentStore}

/** The IndriBuildIndex application surface: parameter parsing (corpus /
  * field / metadata / stemmer / normalize / stopper / memory), config
  * mapping, the end-to-end build (create → resumable rerun → RunQuery
  * opens it with docno metadata attached), mixed-case indexing
  * (normalize=false), and federated metadata rebase.
  */
class BuildIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parseParams covers the reference build parameter surface") {
    val p = BuildIndex.parseParams(
      """<parameters>
        |  <index>/tmp/repoX</index>
        |  <memory>100M</memory>
        |  <corpus><path>/data/a</path><class>parquet</class></corpus>
        |  <corpus><path>/data/b</path></corpus>
        |  <field><name>Title</name></field>
        |  <field><name>price</name><numeric>true</numeric></field>
        |  <field><name>when</name><parserName>DateFieldAnnotator</parserName></field>
        |  <metadata>
        |    <field>Lang</field><forward>repo</forward><backward>lang</backward>
        |  </metadata>
        |  <stemmer><name>krovetz</name></stemmer>
        |  <normalize>false</normalize>
        |  <stopper><word>the</word><word>of</word></stopper>
        |</parameters>""".stripMargin)
    assert(p.repoPath == "/tmp/repoX")
    assert(p.memoryBytes == 100000000L)
    assert(p.corpusPaths == Seq("/data/a", "/data/b"))
    // field names downcase; numeric → int parse; DateFieldAnnotator → date
    assert(p.fields == Seq(FieldSpec("title"), FieldSpec("price", "int"),
      FieldSpec("when", "date")))
    // metadata names downcase + dedup; docno never listed (always added)
    assert(p.metadataFields == Seq("lang", "repo"))
    assert(p.stemmerName == "krovetz" && !p.normalize)
    assert(p.stopwords == Set("the", "of"))

    val cfg = BuildIndex.config(p, IndexConfig(numBuckets = 4))
    assert(cfg.stemmerName == "krovetz" && cfg.stopwords == Set("the", "of"))
    assert(cfg.fields == p.fields && !cfg.normalize && cfg.numBuckets == 4)
  }

  test("parameter validation fails loudly, like require_parameter") {
    def err(xml: String): String =
      intercept[IllegalArgumentException](BuildIndex.parseParams(xml)).getMessage
    assert(err("<parameters><index>/x</index></parameters>")
      .contains("<corpus>"))
    assert(err("<parameters><corpus><path>/x</path></corpus></parameters>")
      .contains("<index>"))
    assert(err(
      """<parameters><index>/x</index>
        |<corpus><path>/a</path><class>trectext</class></corpus>
        |</parameters>""".stripMargin).contains("trectext"))
    assert(err(
      """<parameters><index>/x</index><corpus><path>/a</path></corpus>
        |<stemmer><name>arabic_norm2</name></stemmer></parameters>""".stripMargin)
      .contains("arabic_norm2"))
    assert(err(
      """<parameters><index>/x</index><corpus><path>/a</path></corpus>
        |<field><name>p</name><parserName>Bogus</parserName></field>
        |</parameters>""".stripMargin).contains("Bogus"))
    // stemmer name mapping incl. the light10 variants
    assert(BuildIndex.stemmerFor("PORTER") == "porter")
    assert(BuildIndex.stemmerFor("arabic_light10_stop") == "arabic")
    // memory suffixes are decimal powers, case-insensitive
    assert(BuildIndex.parseMemory("100k") == 100000L)
    assert(BuildIndex.parseMemory("2G") == 2000000000L)
    assert(BuildIndex.parseMemory("12345") == 12345L)
    intercept[IllegalArgumentException](BuildIndex.parseMemory("1.5G"))
  }

  test("normalize=false keeps case, dots and apostrophes (chain skip)") {
    val az = Analyzer(normalize = false)
    // normalized chain: U.S.A → usa; skipped chain: token unchanged
    assert(Analyzer().processTerm("U.S.A") == "usa")
    assert(az.processTerm("U.S.A") == "U.S.A")
    assert(az.processTerm("don't") == "don't")
    // stopping and stemming still apply downstream of the skip
    val azStop = Analyzer(stopwords = Set("the"), normalize = false)
    assert(azStop.processTerm("the") == null)
    assert(azStop.processTerm("The") == "The") // mixed case ≠ stopword
    // build-level: mixed-case terms reach the dictionary
    val docs = Seq((1L, "Spark SPARK spark")).toDF("docId", "content")
    val idx = IndexBuilder.build(docs, IndexConfig(numBuckets = 2, normalize = false))
    val terms = idx.dictionary.select("term").as[String].collect().sorted
    assert(terms.toSeq == Seq("SPARK", "Spark", "spark"))
  }

  test("build → resumable rerun → RunQuery opens with docno metadata") {
    val corpusDir = tmp("graft-bi-corpus")
    val repoDir = tmp("graft-bi-repo")
    CorpusSynthesizer.corpus(spark, 120, seed = 11L)
      .write.mode("overwrite").parquet(corpusDir)
    val params = BuildIndex.Params(
      repoPath = repoDir, corpusPaths = Seq(corpusDir),
      metadataFields = Seq("lang"))
    val base = IndexConfig(blockSize = 32, numBuckets = 4)
    val idx = BuildIndex.run(spark, params, base)

    // parity: the app build == a direct buildFromCorpus with the same cfg
    val direct = IndexBuilder.buildFromCorpus(
      spark.read.parquet(corpusDir), BuildIndex.config(params, base))
    assert(idx.stats == direct.stats)
    assert(idx.dictionary.orderBy("term").collect()
      .sameElements(direct.dictionary.orderBy("term").collect()))

    // rerun resumes: every table skips via its marker (no rebuild crash,
    // same stored stats)
    BuildIndex.run(spark, params, base)
    val st = SegmentStore.open(spark, repoDir)
    assert(st.stats == idx.stats)

    // RunQuery over the stored repo attaches metadata: docnos resolve
    // both ways and TREC lines print them
    val rp = RunQuery.parseParams(
      s"""<parameters>
         |  <index>$repoDir</index>
         |  <query>return license</query>
         |  <count>5</count><baseline>okapi</baseline>
         |  <trecFormat>true</trecFormat><runID>bi</runID>
         |</parameters>""".stripMargin)
    val eng = RunQuery.openEnvironment(spark, rp, Analyzer())
    val meta = spark.read.parquet(BuildIndex.metadataDir(repoDir))
    assert(meta.columns.toSet == Set("docId", "docno", "lang"))
    val firstDocno = meta.orderBy("docId").select("docno").as[String].head()
    assert(firstDocno.contains("/") && firstDocno.contains("@"))
    val ids = eng.documentIDsFromMetadata("docno", Seq(firstDocno))
      .as[Long].collect()
    assert(ids.toSeq == Seq(meta.orderBy("docId").select("docId").as[Long].head()))
    val lines = RunQuery.execute(eng, rp).map { case (num, df) =>
      RunQuery.trecLines(eng, num, df, rp)
    }.head.select("line").as[String].collect()
    assert(lines.nonEmpty && lines.forall(_.matches("0 Q0 \\S+/\\S+@\\S+ \\d+ \\S+ bi")))
  }

  test("two repositories federate with rebased docno metadata") {
    val corpusDir = tmp("graft-bi-fed-corpus")
    CorpusSynthesizer.corpus(spark, 140, seed = 12L)
      .write.mode("overwrite").parquet(corpusDir)
    val full = spark.read.parquet(corpusDir)
    val halves = Seq(
      full.where(xxhash64(col("path")) % 2 === 0),
      full.where(xxhash64(col("path")) % 2 =!= 0))
    val base = IndexConfig(blockSize = 32, numBuckets = 4)
    val repoDirs = halves.zipWithIndex.map { case (half, i) =>
      val cDir = tmp(s"graft-bi-fed-c$i"); val rDir = tmp(s"graft-bi-fed-r$i")
      half.write.mode("overwrite").parquet(cDir)
      BuildIndex.run(spark,
        BuildIndex.Params(repoPath = rDir, corpusPaths = Seq(cDir)), base)
      rDir
    }
    val rp = RunQuery.parseParams(
      s"""<parameters>
         |  <index>${repoDirs(0)}</index><index>${repoDirs(1)}</index>
         |  <query>return</query><count>10</count><baseline>okapi</baseline>
         |</parameters>""".stripMargin)
    val eng = RunQuery.openEnvironment(spark, rp, Analyzer())
    // every docno in either member resolves to exactly one federated
    // docId, and the docno set is the union of both members'
    val docnos = repoDirs.flatMap(d =>
      spark.read.parquet(BuildIndex.metadataDir(d))
        .select("docno").as[String].collect())
    assert(docnos.size == docnos.distinct.size && docnos.size == 140)
    val resolved = eng.documentIDsFromMetadata("docno", docnos.take(20))
      .as[Long].collect()
    assert(resolved.length == 20 && resolved.distinct.length == 20)
    // round-trip: metadata of the resolved ids returns the same docnos
    val back = eng.documentMetadata(resolved.toSeq.toDF("docId"), Seq("docno"))
      .select("docno").as[String].collect()
    assert(back.sorted.toSeq == docnos.take(20).sorted)
  }
}

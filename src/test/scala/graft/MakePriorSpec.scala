package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.apps.{BuildIndex, MakePrior, RunQuery}
import graft.corpus.CorpusSynthesizer

/** The makeprior application surface: input parsing, docno resolution
  * with silent skips, install/replace under `<index>/prior/<name>`, the
  * dense −1e10 default at query time, RunQuery auto-attach, and the
  * federated rebase (reference: makeprior/makeprior.cpp).
  */
class MakePriorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private lazy val repoDir: String = {
    val corpusDir = tmp("graft-mp-corpus")
    val rDir = tmp("graft-mp-repo")
    CorpusSynthesizer.corpus(spark, 120, seed = 21L)
      .write.mode("overwrite").parquet(corpusDir)
    BuildIndex.run(spark, BuildIndex.Params(repoPath = rDir,
      corpusPaths = Seq(corpusDir)),
      graft.index.IndexConfig(blockSize = 32, numBuckets = 4))
    rDir
  }

  test("parameter surface, overlay and the usage gate") {
    val p = MakePrior.overlay(MakePrior.parseParams(
      """<parameters>
        |  <index>/tmp/repo</index><input>/tmp/in.txt</input>
        |  <name>pagerank</name><memory>50M</memory>
        |</parameters>""".stripMargin), Seq("-name=recency"))
    assert(p.indexPath == "/tmp/repo" && p.input == "/tmp/in.txt")
    assert(p.name == "recency") // overlay wins (last occurrence)
    intercept[IllegalArgumentException] {
      MakePrior.validate(MakePrior.Params(indexPath = "/x", input = "/y"))
    }
  }

  test("input parse: whitespace two-column stream, malformed lines dropped") {
    val f = java.nio.file.Files.createTempFile("graft-mp", ".txt")
    java.nio.file.Files.writeString(f,
      "docA -1.25\n  docB\t-0.5\n\nloneToken\ndocC    -2.0  trailing\n")
    val rows = MakePrior.readInput(spark, f.toString)
      .as[(String, Double)].collect().toMap
    assert(rows == Map("docA" -> -1.25, "docB" -> -0.5, "docC" -> -2.0))
  }

  test("a repeated docno installs its FIRST line's score, deterministically") {
    // defined deviation: the reference merge writes BOTH duplicate
    // scores positionally and corrupts every later doc's slot
    // (makeprior.cpp:139-162) — undefined behavior replaced by
    // first-line-wins (an unordered first() could flip across reruns)
    val meta = spark.read.parquet(BuildIndex.metadataDir(repoDir))
      .select("docId", "docno").as[(Long, String)].collect().sortBy(_._1)
    val (docId, docno) = meta.head
    val f = java.nio.file.Files.createTempFile("graft-mp-dup", ".txt")
    java.nio.file.Files.writeString(f, s"$docno -1.5\n$docno -9.0\n")
    try for (_ <- 1 to 3) {
      MakePrior.install(spark, repoDir, "dup",
        MakePrior.readInput(spark, f.toString))
      val stored = MakePrior.open(spark, repoDir, "dup")
        .as[(Long, Double)].collect().toMap
      assert(stored == Map(docId -> -1.5))
    } finally {
      // the shared repoDir's prior list is asserted by a later test
      val d = java.nio.file.Paths.get(MakePrior.priorDir(repoDir, "dup"))
      val walk = java.nio.file.Files.walk(d)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("install resolves docnos (silent skip), replace works, RunQuery attaches") {
    val meta = spark.read.parquet(BuildIndex.metadataDir(repoDir))
      .select("docId", "docno").as[(Long, String)].collect().sortBy(_._1)
    // priors for every 3rd doc, plus an unknown docno that must skip
    val entries = meta.filter(_._1 % 3 == 0)
      .map { case (id, dn) => (dn, math.log(1.0 / (1.0 + id % 5))) }
    val f = java.nio.file.Files.createTempFile("graft-mp-in", ".txt")
    java.nio.file.Files.writeString(f,
      (entries.map { case (dn, lp) => s"$dn $lp" } :+ "no/such@docno -9.9")
        .mkString("\n"))
    MakePrior.install(spark, repoDir, "boost",
      MakePrior.readInput(spark, f.toString))
    assert(MakePrior.storedPriors(repoDir) == Seq("boost"))

    // the stored table is exactly the resolvable entries
    val stored = MakePrior.open(spark, repoDir, "boost")
      .as[(Long, Double)].collect().toMap
    val expected = meta.filter(_._1 % 3 == 0)
      .map { case (id, _) => id -> math.log(1.0 / (1.0 + id % 5)) }.toMap
    assert(stored.keySet == expected.keySet)
    for ((k, v) <- expected) assert(math.abs(stored(k) - v) < 1e-12)

    // RunQuery auto-attaches: #prior(boost) scores docs WITH a prior
    // above the −1e10 default mass of the rest
    val rp = RunQuery.parseParams(
      s"""<parameters>
         |  <index>$repoDir</index>
         |  <query>#combine(return #prior(boost))</query>
         |  <count>200</count><rule>method:dirichlet</rule>
         |</parameters>""".stripMargin)
    val eng = RunQuery.openEnvironment(spark, rp, Analyzer())
    val res = RunQuery.execute(eng, rp).head._2
      .select("docId", "score").as[(Long, Double)].collect()
    assert(res.nonEmpty)
    val (withPrior, without) = res.partition(r => expected.contains(r._1))
    assert(withPrior.nonEmpty && without.nonEmpty)
    // default-log mass: 0.5·(−1e10) dominates — every no-prior doc ranks
    // below every with-prior doc
    assert(withPrior.map(_._2).min > without.map(_._2).max)
    assert(without.forall(_._2 < -1e9))

    // reinstall with different values REPLACES (install_prior remove)
    val f2 = java.nio.file.Files.createTempFile("graft-mp-in2", ".txt")
    java.nio.file.Files.writeString(f2, s"${meta.head._2} -0.125")
    MakePrior.install(spark, repoDir, "boost",
      MakePrior.readInput(spark, f2.toString))
    val replaced = MakePrior.open(spark, repoDir, "boost")
      .as[(Long, Double)].collect().toMap
    assert(replaced == Map(meta.head._1 -> -0.125))
  }

  test("a docno matching several documents takes the first docId") {
    // synthetic input resolved against a metadata table with a dupe
    val metaDir = tmp("graft-mp-dupe")
    val repo2 = tmp("graft-mp-dupe-repo")
    // fabricate a minimal repo layout: metadata only (install touches
    // nothing else)
    Seq((5L, "X"), (9L, "X"), (2L, "Y")).toDF("docId", "docno")
      .write.parquet(BuildIndex.metadataDir(repo2))
    val f = java.nio.file.Files.createTempFile("graft-mp-in3", ".txt")
    java.nio.file.Files.writeString(f, "X -1.0\nY -2.0")
    MakePrior.install(spark, repo2, "p", MakePrior.readInput(spark, f.toString))
    val got = MakePrior.open(spark, repo2, "p").as[(Long, Double)].collect().toMap
    assert(got == Map(5L -> -1.0, 2L -> -2.0))
  }
}

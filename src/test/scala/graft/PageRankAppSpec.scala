package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.apps.{HarvestLinksApp, MakePrior, PageRankApp}
import graft.pipeline.PageRank

/** The harvestlinks + pagerank application surfaces: parameter
  * parsing, the rawToInt rank binning against a reference-loop scalar
  * oracle, the output files (raw/ranks/prior), convert mode, and the
  * prior file feeding makeprior's input parser (reference:
  * harvestlinks/harvestlinks.cpp, pagerank/pagerank.cpp,
  * src/PageRank.cpp).
  */
class PageRankAppSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** the reference _raw2int loop (src/PageRank.cpp:276-301) with the
    * first-bin clamp — rank of each 1-based sorted position
    */
  private def refRanks(n: Int): IndexedSeq[Int] = {
    val B = math.pow(n + 1.0, 0.1)
    var b = math.max(1L, (B - 1.0).toLong)
    var num = b
    var rank = 10
    (1 to n).map { _ =>
      val out = rank // num > 0 always holds (clamped first bin)
      num -= 1
      if (num == 0) {
        b = math.ceil(B * b).toLong
        num = b
        if (rank > 1) rank -= 1
      }
      out
    }
  }

  test("parameter surface: defaults switch on index presence") {
    val p = PageRankApp.parseParams(
      """<parameters>
        |  <corpus>/c</corpus><links>/l</links><output>/o/pr</output>
        |  <writeRaw>true</writeRaw><writeRanks>true</writeRanks>
        |</parameters>""".stripMargin)
    assert(PageRankApp.effectiveIters(p) == 10 && PageRankApp.effectiveC(p) == 0.5)
    assert(p.writeRaw && p.writeRanks && p.writePriors)
    val withIdx = PageRankApp.overlay(p, Seq("-index=/repo"))
    assert(PageRankApp.effectiveIters(withIdx) == 100 &&
      PageRankApp.effectiveC(withIdx) == 0.85)
    val explicit = PageRankApp.overlay(withIdx, Seq("-iters=7", "-c=0.6"))
    assert(PageRankApp.effectiveIters(explicit) == 7 &&
      PageRankApp.effectiveC(explicit) == 0.6)
    intercept[IllegalArgumentException] {
      PageRankApp.validate(PageRankApp.Params(corpus = "/c", links = "/l"))
    }
    intercept[IllegalArgumentException] {
      PageRankApp.validate(PageRankApp.Params(convert = true, input = "/i"))
    }
  }

  test("toIntRanks matches the reference binning loop (N=2000 and clamped N=37)") {
    for (n <- Seq(2000, 37)) {
      // synthetic distinct scores: pr = n - i so sorted order == id order
      val scores = (1 to n).map(i => (i.toLong, (n - i).toDouble / n)).toDF("id", "pr")
      val got = PageRank.toIntRanks(scores)
        .select("id", "rank").as[(Long, Int)].collect().sortBy(_._1)
      val exp = refRanks(n)
      assert(got.map(_._2).toSeq == exp, s"n=$n")
      // bin shape sanity at n=2000: 1 doc rank 10, 3 docs rank 9, 7 rank 8
      if (n == 2000) {
        val by = got.groupBy(_._2).map { case (r, xs) => r -> xs.length }
        assert(by(10) == 1 && by(9) == 3 && by(8) == 7)
      }
    }
  }

  test("harvest + pagerank end-to-end: links, anchors, output files, makeprior chain") {
    // 12-page fixture: page i links to (i+1)%12 with anchor text, plus a
    // whitespace-anchor link (drops) and an off-corpus link (drops)
    val n = 12
    val docs = (0 until n).map { i =>
      val url = s"http://t.test/p$i"
      val nxt = s"http://t.test/p${(i + 1) % n}"
      val redirected = s"http://t.test/r${i % 3}"
      (i.toLong, url,
        s"""<a href="$nxt">go next $i</a><a href="http://ext.test/x"> </a>""" +
          s"""<a href="$redirected">via redirect</a>""")
    }.toDF("doc_id", "url", "html")
    val corpusDir = tmp("graft-pr-corpus")
    docs.write.mode("overwrite").parquet(corpusDir)
    // redirect file: r0/r1/r2 → p3/p4/p5
    val redirFile = java.nio.file.Files.createTempFile("graft-pr-redir", ".txt")
    java.nio.file.Files.writeString(redirFile,
      (0 until 3).map(k => s"http://t.test/r$k http://t.test/p${k + 3}").mkString("\n"))

    val outDir = tmp("graft-pr-links")
    val hp = HarvestLinksApp.overlay(HarvestLinksApp.parseParams(
      s"""<parameters><corpus>$corpusDir</corpus><output>$outDir</output>
         |</parameters>""".stripMargin), Seq(s"-redirect=$redirFile"))
    HarvestLinksApp.validate(hp)
    HarvestLinksApp.run(spark, hp)
    val links = spark.read.parquet(s"$outDir/links")
    // 2 surviving links per page (next + redirect target); the
    // whitespace anchor and the external target both drop
    assert(links.count() == 2L * n)
    assert(links.where(col("dst_url").startsWith("http://t.test/r")).count() == 0)
    val anchors = spark.read.parquet(s"$outDir/anchors")
    assert(anchors.columns.toSet == Set("dst_doc", "n_inlinks", "anchors"))

    val prOut = tmp("graft-pr-out") + "/pr"
    val pp = PageRankApp.parseParams(
      s"""<parameters>
         |  <corpus>$corpusDir</corpus><links>$outDir</links>
         |  <output>$prOut</output>
         |  <writeRaw>true</writeRaw><writeRanks>true</writeRanks>
         |</parameters>""".stripMargin)
    PageRankApp.validate(pp)
    val full = PageRankApp.run(spark, pp)
    assert(full.count() == n)
    // ranks are 1..10 and follow the reference bins for N=12
    val ranked = full.select(col("id"), col("rank"))
      .as[(Long, Int)].collect().toMap
    val order = full.orderBy(round(col("pr"), 6).desc, col("id").asc)
      .select("id").as[Long].collect()
    val exp = refRanks(n)
    assert(order.zipWithIndex.forall { case (id, i) => ranked(id) == exp(i) })
    // the three files exist and the prior file round-trips through
    // MakePrior.readInput (the documented chain, pagerank.cpp:59-60)
    for (suffix <- Seq(".raw", ".ranks", ".prior"))
      assert(spark.read.text(prOut + suffix).count() == n, suffix)
    val priorRows = MakePrior.readInput(spark, prOut + ".prior")
      .as[(String, Double)].collect()
    assert(priorRows.length == n)
    val expProb = ranked.map { case (id, r) => id.toString -> PageRank.IntToProb(r) }
    priorRows.foreach { case (dn, lp) =>
      assert(math.abs(lp - expProb(dn)) < 1e-12, dn)
    }
    // the distributed write claim: part files concatenated in NAME order
    // are the reference's globally sorted flat file
    val prByDoc = full.select(col("docno"), round(col("pr"), 6))
      .as[(String, Double)].collect().toMap
    val partLines = java.nio.file.Files.list(
        java.nio.file.Paths.get(prOut + ".raw")).iterator()
      .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val lines = scala.jdk.CollectionConverters.IteratorHasAsScala(partLines)
      .asScala.filter(_.getFileName.toString.startsWith("part-"))
      .toSeq.sortBy(_.getFileName.toString)
      .flatMap(p => scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(p)).asScala)
    assert(lines.size == n)
    val keys = lines.map { l =>
      val doc = l.split(" ")(0)
      (-prByDoc(doc), doc.toLong)
    }
    assert(keys == keys.sorted,
      "part files in name order do not form the global (pr desc, id asc) sort")
  }

  test("convert mode bins an external score file with numDocs semantics") {
    val in = java.nio.file.Files.createTempFile("graft-pr-conv", ".txt")
    val n = 40
    java.nio.file.Files.writeString(in,
      (1 to n).map(i => s"doc${"%02d".format(i)} ${(n - i).toDouble / n}")
        .mkString("\n"))
    val out = tmp("graft-pr-convout") + "/conv.prior"
    val p = PageRankApp.Params(convert = true, input = in.toString,
      output = out, numDocs = n)
    PageRankApp.validate(p)
    // keep AQE from coalescing the range shuffle to one partition so
    // the multi-part global-order property below is actually exercised
    // (AQE coalescing merges only ADJACENT partitions, so order is
    // preserved when it IS on — this just de-vacuates the check)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try PageRankApp.convert(spark, p)
    finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    // part files in NAME order are the reference's sorted flat file
    // (score desc, doc asc) — the numbering window hash-shuffles on
    // __pid, so the writer must re-range-partition (regression pin)
    val parts = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val lines = scala.jdk.CollectionConverters.IteratorHasAsScala(parts)
      .asScala.filter(_.getFileName.toString.startsWith("part-"))
      .toSeq.sortBy(_.getFileName.toString)
      .flatMap(f => scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(f)).asScala)
      .filter(_.nonEmpty)
    assert(lines.size == n)
    val fileDocs = lines.map(_.split(" ")(0))
    // input scores descend with doc number, so name-order == doc order
    assert(fileDocs == fileDocs.sorted,
      "convert part files in name order do not form the global sort")
    val got = MakePrior.readInput(spark, out).as[(String, Double)].collect()
      .sortBy(_._1)
    assert(got.length == n)
    val exp = refRanks(n)
    // docNN sorts like score rank (scores descend with NN)
    got.zipWithIndex.foreach { case ((dn, lp), i) =>
      assert(math.abs(lp - PageRank.IntToProb(exp(i))) < 1e-12, dn)
    }
  }
}

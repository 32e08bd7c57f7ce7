package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.apps.{BuildIndex, OffsetMetadata, RunQuery}
import graft.index.IndexConfig

/** OffsetMetadataAnnotator parity (reference:
  * src/OffsetMetadataAnnotator.cpp) — loader quirks, per-document
  * key-exists skip, first-pair-wins, and the build→open→
  * documentIDsFromMetadata lifecycle.
  */
class OffsetMetadataSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("loader quirks: blank-line termination, key downcase, extra fields drop") {
    val lines = Seq(
      "d1\torigURL\thttp://a.test/1",
      "d1\tLANG\ten\textra\tdropped",   // 4th+ field ignored
      "d2\torigurl\thttp://a.test/2",
      "",                                // blank line ENDS the parse
      "d3\torigurl\tnever-seen").iterator
    val pairs = OffsetMetadata.parsePairs(lines)
    assert(pairs == Seq(
      ("d1", "origurl", "http://a.test/1"),
      ("d1", "lang", "en"),
      ("d2", "origurl", "http://a.test/2")))
    // reference UB (value NULL → strlen segfault) fails loudly here
    val e = intercept[IllegalArgumentException] {
      OffsetMetadata.parsePairs(Seq("d1\tonlykey").iterator)
    }
    assert(e.getMessage.contains("malformed"))
    val e2 = intercept[IllegalArgumentException] {
      OffsetMetadata.parsePairs(Seq("d1\tk\t" + "x" * 256).iterator)
    }
    assert(e2.getMessage.contains("255-char"))
  }

  test("annotate: first pair wins, existing per-doc values skip, new keys append") {
    val meta = Seq(
      (1L, "d1", "preset"),
      (2L, "d2", null),
      (3L, "d3", "kept")).toDF("docId", "docno", "src")
    val pairs = Seq(
      ("d1", "origurl", "u1"),
      ("d1", "origurl", "u1-dup"),   // second pair for the key: skipped
      ("d2", "src", "filled"),       // doc's src is NULL → injected
      ("d3", "src", "ignored"),      // doc already has src → skipped
      ("d2", "origurl", "u2"),
      ("d1", "docno", "OVERRIDE"),   // docno always present → skipped
      ("dX", "origurl", "no-doc"))   // unknown docno drops
    val out = OffsetMetadata.annotate(spark, meta, pairs)
      .orderBy("docId").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("d1", "d2", "d3"))
    assert(out.map(_.getString(2)).toSeq == Seq("preset", "filled", "kept"))
    assert(out.map(_.getString(3)).toSeq == Seq("u1", "u2", null))
    assert(out.length == 3)
  }

  test("annotate: a key case-colliding with an existing column fills, never replaces") {
    // withColumn resolves case-insensitively: a file key "docid" used to
    // REPLACE the Long docId column with a mostly-null string column
    val meta = Seq(
      (1L, "d1", null.asInstanceOf[java.lang.Long]),
      (2L, "d2", java.lang.Long.valueOf(9L)))
      .toDF("docId", "docno", "pageRank")
    val pairs = Seq(
      ("d1", "docid", "42"),        // collides with docId — never null → skip
      ("d1", "pagerank", "7"),      // d1's pageRank is NULL → filled, cast LONG
      ("d2", "pagerank", "ignored"))// d2 already has one → skipped
    val out = OffsetMetadata.annotate(spark, meta, pairs)
    // schema keeps the ORIGINAL spelling and types — no new columns
    assert(out.columns.toSeq == Seq("docId", "docno", "pageRank"))
    assert(out.schema("docId").dataType.typeName == "long")
    assert(out.schema("pageRank").dataType.typeName == "long")
    val rows = out.orderBy("docId").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.map(_.getLong(2)).toSeq == Seq(7L, 9L))
  }

  test("annotate: keys with Column-syntax characters are plain names") {
    // the reference accepts arbitrary key strings (only ASCII-downcased)
    // — a dotted key must become a column NAMED "og.url", not a
    // nested-field access that fails analysis
    val meta = Seq((1L, "d1", "s")).toDF("docId", "docno", "src")
    val pairs = Seq(
      ("d1", "og.url", "u1"),
      ("d1", "a`b", "v2"))
    val out = OffsetMetadata.annotate(spark, meta, pairs)
    assert(out.columns.toSeq == Seq("docId", "docno", "src", "og.url", "a`b"))
    val r = out.collect().head
    assert(r.getString(3) == "u1" && r.getString(4) == "v2")
  }

  test("build with <corpus><metadata> serves documentIDsFromMetadata") {
    val corpusDir = java.nio.file.Files.createTempDirectory("om-c").toString
    val repoDir = java.nio.file.Files.createTempDirectory("om-r").toString
    Seq(("r1", "p1", "c1", "alpha beta"),
        ("r1", "p2", "c1", "beta gamma"),
        ("r1", "p3", "c1", "gamma delta"))
      .toDF("repo", "path", "commit", "content")
      .write.mode("overwrite").parquet(corpusDir)
    val omFile = java.nio.file.Files.createTempFile("om", ".tsv")
    java.nio.file.Files.write(omFile, Seq(
      "r1/p1@c1\torigURL\thttp://s.test/p1",
      "r1/p2@c1\torigurl\thttp://s.test/p2",
      "r1/p1@c1\tLANG\ten",
      "r1/p2@c1\tlang\ttr",
      "",
      "r1/p3@c1\torigurl\thttp://after-blank.test").mkString("\n").getBytes)
    BuildIndex.run(spark, BuildIndex.parseParams(
      s"""<parameters>
         |  <index>$repoDir</index>
         |  <corpus>
         |    <path>$corpusDir</path>
         |    <metadata>$omFile</metadata>
         |  </corpus>
         |</parameters>""".stripMargin),
      IndexConfig(blockSize = 16, numBuckets = 2))
    val p = RunQuery.Params(indexPaths = Seq(repoDir),
      queries = Seq(RunQuery.QuerySpec(None, "beta")), count = 10)
    val eng = RunQuery.openEnvironment(spark, p, graft.analysis.Analyzer())
    // key downcased at load; doc 3's pair fell after the blank line
    assert(eng.documentIDsFromMetadata("origurl", Seq("http://s.test/p2"))
      .as[Long].collect().toSeq == Seq(2L))
    assert(eng.documentIDsFromMetadata("lang", Seq("en", "tr"))
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(eng.documentIDsFromMetadata("origurl", Seq("http://after-blank.test"))
      .count() == 0)
    // docno untouched
    assert(eng.documentIDsFromMetadata("docno", Seq("r1/p3@c1"))
      .as[Long].collect().toSeq == Seq(3L))
  }
}

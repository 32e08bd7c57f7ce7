package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.apps.{BuildIndex, ModifyFieldsApp, RunQuery}
import graft.index.{IndexConfig, SegmentStore}

/** The modifyfields application surface: offset-annotation parsing,
  * the byte→token conversion rounding rules of convert_annotations,
  * and end-to-end field surgery on a stored repository (reference:
  * modifyfields/ModifyFields.cpp, src/OffsetAnnotationAnnotator.cpp).
  */
class ModifyFieldsAppSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // token spans of "alpha beta gamma delta":
  // alpha[0,5) beta[6,10) gamma[11,16) delta[17,22)
  private val bs = Array(0, 6, 11, 17)
  private val es = Array(5, 10, 16, 22)

  test("byte→token conversion: midpoint rounding, zero-length drop, clamps") {
    import ModifyFieldsApp.toTokenExtent
    // exact alignment
    assert(toTokenExtent(6, 10, bs, es).contains((1, 2)))
    // begin inside a token rounds by the integer midpoint (beta mid = 8)
    assert(toTokenExtent(7, 16, bs, es).contains((1, 3))) // 7 ≤ 8 → begin 1
    assert(toTokenExtent(9, 16, bs, es).contains((2, 3))) // 9 > 8 → begin 2
    // end inside a token: ≤ begin → previous boundary; ≤ mid → previous;
    // > mid → next (gamma[11,16) mid = 13)
    assert(toTokenExtent(0, 11, bs, es).contains((0, 2))) // 11 ≤ bs(2)
    assert(toTokenExtent(0, 13, bs, es).contains((0, 2))) // 13 ≤ mid
    assert(toTokenExtent(0, 14, bs, es).contains((0, 3))) // 14 > mid
    // a tag spanning [0,10): end lands inside beta, 10 > mid 8 → end 2
    assert(toTokenExtent(0, 10, bs, es).contains((0, 2)))
    // zero token-length tags drop (gap between alpha and beta)
    assert(toTokenExtent(5, 6, bs, es).isEmpty)
    // begins after the last token end → drop
    assert(toTokenExtent(22, 30, bs, es).isEmpty)
    // unclosed tag runs to the document end
    assert(toTokenExtent(17, 99, bs, es).contains((3, 4)))
    // tiny tag inside one token: closes at the NEXT token's check
    // (the reference closes before activating, so end = p+1's rules)
    assert(toTokenExtent(7, 8, bs, es).contains((1, 2)))
    // empty extent is faithful to the reference (begin rounds forward,
    // end rounds back)
    assert(toTokenExtent(9, 10, bs, es).contains((2, 2)))
  }

  test("tokenOffsets: indri mode skips markup, simple mode spans runs") {
    val (b1, e1) = Analyzer().tokenOffsets("<p>ab cd</p> ef")
    assert(b1.toSeq == Seq(3, 6, 13) && e1.toSeq == Seq(5, 8, 15))
    val (b2, e2) = Analyzer(mode = "simple").tokenOffsets("Ab, cd!")
    assert(b2.toSeq == Seq(0, 4) && e2.toSeq == Seq(2, 6))
  }

  test("parameter surface and validation") {
    val p = ModifyFieldsApp.parseParams(
      """<parameters>
        |  <index>/r</index><corpus>/c</corpus><annotations>/a.tsv</annotations>
        |  <addField>
        |    <field><name>MK</name><numeric>true</numeric></field>
        |    <field><name>sub</name></field>
        |  </addField>
        |  <removeField><name>Old</name></removeField>
        |  <fileclass>parquet</fileclass><memory>100M</memory>
        |</parameters>""".stripMargin)
    assert(p.addFields == Seq(ModifyFieldsApp.FieldAdd("mk", numeric = true),
      ModifyFieldsApp.FieldAdd("sub", numeric = false)))
    assert(p.removeFields == Seq("old"))
    intercept[IllegalArgumentException] {
      ModifyFieldsApp.validate(p.copy(annotations = ""))
    }
    intercept[IllegalArgumentException] {
      ModifyFieldsApp.validate(ModifyFieldsApp.Params(indexPath = "/r"))
    }
  }

  test("end-to-end: annotations add fields with ordinals/parents, removal undoes") {
    val corpusDir = tmp("graft-mf-corpus")
    val repoDir = tmp("graft-mf-repo")
    Seq(
      ("r", "a", "x", "alpha beta gamma delta"),
      ("r", "b", "x", "one two three")
    ).toDF("repo", "path", "commit", "content")
      .write.mode("overwrite").parquet(corpusDir)
    BuildIndex.run(spark, BuildIndex.Params(repoPath = repoDir,
      corpusPaths = Seq(corpusDir)), IndexConfig(blockSize = 16, numBuckets = 2))
    val docnos = spark.read.parquet(BuildIndex.metadataDir(repoDir))
      .orderBy("docId").select("docId", "docno").as[(Long, String)].collect()
    val (idA, dnA) = docnos(0)
    val (idB, dnB) = docnos(1)

    val tsv = java.nio.file.Files.createTempFile("graft-mf-ann", ".tsv")
    java.nio.file.Files.writeString(tsv, Seq(
      s"$dnA\tTAG\t1\tMK\t0\t10\t7\t0\tdebug col ignored",
      s"$dnA\tTAG\t2\tmk\t11\t5\t9\t0",
      s"$dnA\tTAG\t3\tsub\t6\t4\t0\t1", // parent = tag id 1 (mk ordinal 1)
      s"$dnB\tTAG\t4\tmk\t0\t3\t5\t0",
      s"$dnB\tATTRIBUTE\t5\tcolor\t0\t0\tblue\t4", // ignored
      s"no/such@docno\tTAG\t6\tmk\t0\t5\t1\t0", // silently skipped
      "malformed line"
    ).mkString("\n"))

    val p = ModifyFieldsApp.Params(indexPath = repoDir, corpus = corpusDir,
      annotations = tsv.toString,
      addFields = Seq(ModifyFieldsApp.FieldAdd("mk", numeric = true),
        ModifyFieldsApp.FieldAdd("sub", numeric = false)))
    ModifyFieldsApp.validate(p)
    ModifyFieldsApp.run(spark, p, BuildIndex.storedAnalyzer(repoDir).get)

    val fields = spark.read.parquet(s"$repoDir/fields")
      .select("docId", "field", "begin", "end", "number", "ordinal",
        "parentField", "parentOrdinal")
      .as[(Long, String, Int, Int, Long, Int, String, Int)]
      .collect().sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(fields == Seq(
      (idA, "mk", 0, 2, 7L, 1, null, 0),
      (idA, "mk", 2, 3, 9L, 2, null, 0),
      (idA, "sub", 1, 2, 0L, 1, "mk", 1),
      (idB, "mk", 0, 1, 5L, 1, null, 0)))

    // the rewritten store answers field queries through RunQuery
    val rp = RunQuery.Params(indexPaths = Seq(repoDir))
    val eng = RunQuery.openEnvironment(spark, rp, Analyzer())
    assert(eng.expressionCount("#any:mk") == 3L)

    // removal undoes the surgery
    ModifyFieldsApp.run(spark,
      ModifyFieldsApp.Params(indexPath = repoDir, removeFields = Seq("mk", "sub")),
      Analyzer())
    assert(spark.read.parquet(s"$repoDir/fields").count() == 0)
  }
}

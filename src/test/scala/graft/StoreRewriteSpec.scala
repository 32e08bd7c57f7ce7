package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index.{FieldAnnotators, IndexBuilder, IndexConfig, SegmentStore}

/** Offline field surgery (reference: modifyfields/ModifyFields.cpp):
  * SegmentStore.rewriteFields must equal a full rebuild with the new
  * field set — postings and doclens untouched, extents regenerated.
  */
class StoreRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta", 7L),
    (2L, "beta beta epsilon", 3L),
    (3L, "gamma alpha", 9L)
  ).toDF("docId", "content", "nval")
  private val cfg = IndexConfig(analyzerMode = "simple", blockSize = 16, numBuckets = 2)

  private def extentSet(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Int, Int, Long)] =
    df.select(col("docId"), col("field"), col("begin"), col("end"),
        coalesce(col("number"), lit(0L)).as("number"))
      .as[(Long, String, Int, Int, Long)].collect().toSet

  test("rewriteFields(remove + add) == full rebuild with the new field set") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rewrite").toString
    // original index: head field + numeric nval field
    val idx = IndexBuilder.build(docs, cfg,
      annotate = df => FieldAnnotators.numericField("nval", "nval")(
        FieldAnnotators.headField(2)(df)))
    SegmentStore.writeAll(idx, dir, cfg)
    assert(extentSet(SegmentStore.open(spark, dir).fieldExtents)
      .exists(_._2 == "nval"))

    // surgery: drop nval, add offset-annotation field "note" ([1,3) of
    // docs 1 and 2) — no re-tokenization anywhere
    val notes = Seq((1L, "note", 1, 3), (2L, "note", 1, 3))
      .toDF("docId", "field", "begin", "end")
    SegmentStore.rewriteFields(spark, dir, remove = Seq("nval"), add = notes)

    val rewritten = SegmentStore.open(spark, dir)
    // reference rebuild: same corpus, head + note annotators
    val rebuilt = IndexBuilder.build(docs, cfg,
      annotate = df => {
        val withHead = FieldAnnotators.headField(2)(df)
        withHead.withColumn("fields", array_union(col("fields"), array(
          when(col("docId").isin(1L, 2L), struct(
            lit("note").as("field"), lit(1).as("begin"), lit(3).as("end"),
            lit(0L).as("number"), lit(1).as("ordinal"),
            lit(null).cast("string").as("parentField"), lit(0).as("parentOrdinal")))
        ))).withColumn("fields", filter(col("fields"), _.isNotNull))
      })
    assert(extentSet(rewritten.fieldExtents) == extentSet(rebuilt.fieldExtents))

    // postings/doclens/stats untouched by the surgery
    val lens = rewritten.doclens.as[(Long, Int)].collect().toMap
    assert(lens == Map(1L -> 4, 2L -> 3, 3L -> 2))
    assert(rewritten.stats.totalTerms == idx.stats.totalTerms)

    // a second surgery with only a removal works from the rewritten state
    SegmentStore.rewriteFields(spark, dir, remove = Seq("note"))
    val fields2 = extentSet(SegmentStore.open(spark, dir).fieldExtents)
    assert(fields2.map(_._2) == Set("head"))
  }
}

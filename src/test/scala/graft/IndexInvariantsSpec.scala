package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.corpus.CorpusSynthesizer
import graft.index._

/** dumpindex-style consistency invariants
  * (reference: dumpindex/dumpindex.cpp:60-110 cross-checks; FIXTURES.md §3).
  */
class IndexInvariantsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val (docs, index) = {
    val corpus = CorpusSynthesizer.corpus(spark, 500)
    val withSha = corpus.withColumn("content_sha256", sha2(col("content"), 256))
    val d = IndexBuilder.assignDocIds(withSha, Seq("repo", "path", "commit")).cache()
    val idx = IndexBuilder.build(d.select("docId", "content"), IndexConfig(blockSize = 64, numBuckets = 8))
    (d, idx)
  }

  test("docIds dense 1..N and deterministic") {
    val ids = docs.select("docId").as[Long](spark.implicits.newLongEncoder).collect().sorted
    assert(ids.toSeq == (1L to ids.length).toSeq)
    // re-assign on a repartitioned copy must agree (layout independence)
    val re = IndexBuilder.assignDocIds(docs.drop("docId").repartition(7), Seq("repo", "path", "commit"))
    val pairs = docs.select("repo", "path", "commit", "docId")
      .join(re.select(col("repo"), col("path"), col("commit"), col("docId").as("docId2")),
        Seq("repo", "path", "commit"))
    assert(pairs.where(col("docId") =!= col("docId2")).count() == 0)
  }

  test("scalable docId assignment equals the window form") {
    val re = IndexBuilder.assignDocIdsScalable(
      docs.drop("docId").repartition(5), Seq("repo", "path", "commit"), partitions = 7)
    val pairs = docs.select("repo", "path", "commit", "docId")
      .join(re.select(col("repo"), col("path"), col("commit"), col("docId").as("docId2")),
        Seq("repo", "path", "commit"))
    assert(pairs.count() == docs.count())
    assert(pairs.where(col("docId") =!= col("docId2")).count() == 0)
  }

  test("content sha256 row invariant preserved") {
    val bad = docs.where(sha2(col("content"), 256) =!= col("content_sha256")).count()
    assert(bad == 0)
  }

  test("postings sorted positions, tf == size(positions)") {
    val bad = index.postings
      .where(col("tf") =!= size(col("positions")) ||
        col("positions") =!= array_sort(col("positions")))
      .count()
    assert(bad == 0)
  }

  test("dictionary df/ctf match postings aggregates") {
    val agg = index.postings.groupBy("term").agg(
      count(lit(1)).as("df2"), sum(col("tf").cast("long")).as("ctf2"),
      max("doclen").as("maxDl2"), min("doclen").as("minDl2"))
    val joined = index.dictionary.join(agg, "term")
    assert(joined.where(col("df") =!= col("df2") || col("ctf") =!= col("ctf2") ||
      col("maxDocLen") =!= col("maxDl2") || col("minDocLen") =!= col("minDl2")).count() == 0)
    assert(index.dictionary.count() == agg.count())
  }

  test("doclen == sum(tf) + stopped slots; corpus stats consistent") {
    // with no stopwords every position is indexed: doclen == Σ tf per doc
    val perDoc = index.postings.groupBy("docId").agg(sum(col("tf").cast("long")).as("tfsum"))
    val joined = index.doclens.join(perDoc, "docId")
    assert(joined.where(col("length") =!= col("tfsum")).count() == 0)
    val st = index.stats
    assert(st.totalDocs == 500)
    val sumLen = index.doclens.agg(sum(col("length").cast("long"))).head().getLong(0)
    assert(st.totalTerms == sumLen)
    assert(st.uniqueTerms == index.dictionary.count())
  }

  test("stopped corpus: doclen counts null slots") {
    val cfg = IndexConfig(stopwords = Set("return", "class"))
    val idx2 = IndexBuilder.build(docs.select("docId", "content"), cfg)
    // doclens identical to unstopped build (positions preserved)
    val diff = idx2.doclens.join(index.doclens.withColumnRenamed("length", "l2"), "docId")
      .where(col("length") =!= col("l2")).count()
    assert(diff == 0)
    // stopped terms absent from dictionary
    assert(idx2.dictionary.where(col("term").isin("return", "class")).count() == 0)
  }

  test("segment blocks decode back to exact postings") {
    import spark.implicits._
    val blocks = index.segments.as[SegmentBlock].collect()
    val decoded = blocks.flatMap { b =>
      val (ds, tfs, dls, pos) = IndexBuilder.decodeBlock(b)
      assert(b.firstDoc == ds.head && b.lastDoc == ds.last && b.numDocs == ds.length)
      assert(b.maxTf == tfs.max && b.minDl == dls.min)
      assert(ds.toSeq == ds.sorted.toSeq)
      ds.indices.map(i => (b.term, ds(i), tfs(i), dls(i), pos(i).toSeq))
    }.toSeq.sortBy(r => (r._1, r._2))
    val expected = index.postings
      .select("term", "docId", "tf", "doclen", "positions").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getSeq[Int](4)))
      .toSeq.sortBy(r => (r._1, r._2))
    assert(decoded.size == expected.size)
    decoded.zip(expected).foreach { case (a, b) => assert(a == b) }
  }

  test("segment blocks respect blockSize and per-term docId-range disjointness") {
    import spark.implicits._
    val blocks = index.segments.as[SegmentBlock].collect()
    assert(blocks.forall(_.numDocs <= 64))
    blocks.groupBy(_.term).foreach { case (_, bs) =>
      val sorted = bs.sortBy(_.firstDoc)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.lastDoc < b.firstDoc)
        case _ =>
      }
    }
  }

  test("salted build equals unsalted build (skew fixture)") {
    val unsalted = IndexBuilder.buildSegments(index.postings, index.stats.totalDocs,
      IndexConfig(blockSize = 64, numBuckets = 1))
    import spark.implicits._
    def flat(df: org.apache.spark.sql.Dataset[SegmentBlock]) =
      df.collect().flatMap { b =>
        val (ds, tfs, dls, pos) = IndexBuilder.decodeBlock(b)
        ds.indices.map(i => (b.term, ds(i), tfs(i), dls(i), pos(i).toSeq))
      }.toSeq.sortBy(r => (r._1, r._2))
    assert(flat(index.segments.as[SegmentBlock]) == flat(unsalted))
  }

  test("topdocs kept for hot terms only, ranked by tf/len") {
    val td = IndexBuilder.buildTopdocs(index.postings, IndexConfig(topdocsMinDf = 100))
    val hot = index.dictionary.where(col("df") > 100).select("term").collect().map(_.getString(0)).toSet
    val tdTerms = td.select("term").distinct().collect().map(_.getString(0)).toSet
    assert(tdTerms.subsetOf(hot))
    if (hot.nonEmpty) assert(tdTerms.nonEmpty)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Engine, ScoringRule}
import graft.streaming.{IncrementalIndexer, StreamFilter}

/** Streaming: incremental index generations via foreachBatch (the
  * MemoryIndex flush/merge lifecycle, reference: src/Repository.cpp:
  * 720-814) and the KBA standing-query filter
  * (reference: kba/BM25Scorer.cc:6-64).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val cfg = IndexConfig(analyzerMode = "simple", blockSize = 8, numBuckets = 2)

  private val allDocs = Seq(
    (1L, "alpha beta alpha gamma"),
    (2L, "beta beta delta"),
    (3L, "alpha delta delta delta beta"),
    (4L, "gamma gamma"),
    (5L, "alpha alpha beta"),
    (6L, "delta gamma beta alpha")
  )

  test("foreachBatch generations == batch build; compact preserves results") {
    val dir = Files.tmp("inc-index")
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF().toDF("docId", "content")
      .writeStream
      .option("checkpointLocation", s"$dir/_ckpt")
      .foreachBatch(IncrementalIndexer.sink(dir, cfg))
      .start()
    input.addData(allDocs.slice(0, 2))
    q.processAllAvailable()
    input.addData(allDocs.slice(2, 4))
    q.processAllAvailable()
    input.addData(allDocs.slice(4, 6))
    q.processAllAvailable()
    q.stop()

    val streamed = IncrementalIndexer.open(spark, dir, cfg)
    val batch = IndexBuilder.build(allDocs.toDF("docId", "content"), cfg)

    // identical postings and dictionary
    assert(streamed.postings.select("term", "docId", "tf")
      .exceptAll(batch.postings.select("term", "docId", "tf")).count() == 0)
    assert(batch.postings.select("term", "docId", "tf")
      .exceptAll(streamed.postings.select("term", "docId", "tf")).count() == 0)
    assert(streamed.stats == batch.stats)

    // identical BM25 results through the full engine (DAAT over segments)
    val eS = new Engine(spark, streamed, cfg.analyzer, ScoringRule(method = "okapi"))
    val eB = new Engine(spark, batch, cfg.analyzer, ScoringRule(method = "okapi"))
    val rS = eS.runQuery("#combine(alpha beta)", 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rB = eB.runQuery("#combine(alpha beta)", 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rS == rB)

    // replayed batch id is idempotent (restart contract)
    IncrementalIndexer.appendBatch(allDocs.slice(0, 2).toDF("docId", "content"), 0L, dir, cfg)
    assert(IncrementalIndexer.open(spark, dir, cfg).stats == batch.stats)

    // compaction (TRIM merge) keeps the same index content
    IncrementalIndexer.compact(spark, dir, cfg)
    val compacted = IncrementalIndexer.open(spark, dir, cfg)
    assert(compacted.stats == batch.stats)
    val rC = new Engine(spark, compacted, cfg.analyzer, ScoringRule(method = "okapi"))
      .runQuery("#combine(alpha beta)", 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rC == rB)
  }

  test("repeated compaction preserves all generations; crash between merge commit and GC never double-counts") {
    val dir = Files.tmp("inc-compact")
    val docs = allDocs.toDF("docId", "content")
    // batches 0,1 → compact → batches 2,3 → compact again: the second
    // compact must fold the PRIOR merged output too (TRIM merges ALL
    // indexes, reference: src/Repository.cpp:754-814)
    IncrementalIndexer.appendBatch(docs.where(col("docId").isin(1L, 2L)), 0L, dir, cfg)
    IncrementalIndexer.appendBatch(docs.where(col("docId").isin(3L)), 1L, dir, cfg)
    IncrementalIndexer.compact(spark, dir, cfg)
    IncrementalIndexer.appendBatch(docs.where(col("docId").isin(4L, 5L)), 2L, dir, cfg)
    IncrementalIndexer.appendBatch(docs.where(col("docId").isin(6L)), 3L, dir, cfg)
    IncrementalIndexer.compact(spark, dir, cfg)

    val batch = IndexBuilder.build(docs, cfg)
    val compacted = IncrementalIndexer.open(spark, dir, cfg)
    assert(compacted.stats == batch.stats) // every doc exactly once
    assert(compacted.postings.select("term", "docId", "tf")
      .exceptAll(batch.postings.select("term", "docId", "tf")).count() == 0)
    assert(batch.postings.select("term", "docId", "tf")
      .exceptAll(compacted.postings.select("term", "docId", "tf")).count() == 0)

    // only the latest merge survives on disk
    val gens = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).filter(_.contains("gen=")).sorted
    assert(gens.length == 1 && gens.head.endsWith("gen=merged-2"), gens.toSeq)

    // crash simulation: a consumed source's marker+data resurface (crash
    // happened after the merge marker committed but before GC finished) —
    // open() must keep hiding it via the merge's consumed list
    IncrementalIndexer.appendBatch(docs.where(col("docId").isin(1L, 2L)), 4L, dir, cfg)
    IncrementalIndexer.compact(spark, dir, cfg) // merged-3 consumes [4, merged-2]
    val m3 = java.nio.file.Paths.get(s"$dir/gen=4/_GEN_SUCCESS")
    java.nio.file.Files.createDirectories(m3.getParent)
    java.nio.file.Files.writeString(m3, cfg.fingerprint) // marker back, no data needed
    val afterCrash = IncrementalIndexer.open(spark, dir, cfg)
    // docs 1,2 appear ONCE from batch 4's merge, not twice
    assert(afterCrash.doclens.count() == batch.stats.totalDocs + 2)
    assert(afterCrash.doclens.where(col("docId") === 1L).count() == 1 + 1) // batch0 copy + batch4 copy, both live in merged-3

    // a replayed batchId that was merged+GC'd is NOT resurrected
    IncrementalIndexer.appendBatch(docs.where(col("docId").isin(6L)), 3L, dir, cfg)
    assert(IncrementalIndexer.open(spark, dir, cfg).doclens.count() == afterCrash.doclens.count())
  }

  test("deletes spanning generations + compactDeletes == fresh build of survivors") {
    // round-4 integration: deletions issued against a GENERATIONAL
    // (IncrementalIndexer) store, one victim per generation, then
    // delete-compaction — must equal a fresh batch build of the
    // survivors bit-exactly (CompactSpec covers the single-build case)
    val dir = Files.tmp("inc-del")
    val docs = allDocs.toDF("docId", "content")
    IncrementalIndexer.appendBatch(docs.where(col("docId").isin(1L, 2L, 3L)), 0L, dir, cfg)
    IncrementalIndexer.appendBatch(docs.where(col("docId").isin(4L, 5L, 6L)), 1L, dir, cfg)

    val eng = new Engine(spark, IncrementalIndexer.open(spark, dir, cfg),
      cfg.analyzer, ScoringRule(method = "okapi"))
    eng.deleteDocuments(Seq(2L, 5L).toDF("docId")) // one per generation
    val trimmed = eng.compacted(cfg)

    val survivors = allDocs.filterNot(d => d._1 == 2L || d._1 == 5L)
    val fresh = new Engine(spark,
      IndexBuilder.build(survivors.toDF("docId", "content"), cfg),
      cfg.analyzer, ScoringRule(method = "okapi"))

    assert(trimmed.index.stats == fresh.index.stats)
    assert(trimmed.index.dictionary.select("term", "df", "ctf")
      .exceptAll(fresh.index.dictionary.select("term", "df", "ctf")).count() == 0)
    assert(fresh.index.dictionary.select("term", "df", "ctf")
      .exceptAll(trimmed.index.dictionary.select("term", "df", "ctf")).count() == 0)
    val rT = trimmed.runQuery("#combine(alpha beta)", 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rF = fresh.runQuery("#combine(alpha beta)", 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rT == rF && rT.nonEmpty) // bit-exact scores over survivors
    assert(!rT.exists(r => r._1 == 2L || r._1 == 5L))
  }

  test("open() rejects a generation stack built under a different analyzer config") {
    val dir = Files.tmp("inc-fp")
    IncrementalIndexer.appendBatch(
      allDocs.slice(0, 2).toDF("docId", "content"), 0L, dir, cfg)
    // same directory opened under a different tokenization — merging its
    // dictionary with new generations would silently corrupt df/ctf
    val e = intercept[IllegalArgumentException] {
      IncrementalIndexer.open(spark, dir, cfg.copy(analyzerMode = "indri"))
    }
    assert(e.getMessage.contains("fingerprint"))
  }

  test("compact garbage-collects consumed generation dirs orphaned by a crashed GC") {
    val dir = Files.tmp("inc-orphan")
    val docs = allDocs.toDF("docId", "content")
    IncrementalIndexer.appendBatch(docs.where(col("docId").isin(1L, 2L)), 0L, dir, cfg)
    IncrementalIndexer.appendBatch(docs.where(col("docId").isin(3L)), 1L, dir, cfg)
    IncrementalIndexer.compact(spark, dir, cfg) // merged-1 consumes 0,1
    // crash simulation: gen=0's data resurfaces WITHOUT its marker (the
    // GC died between the marker delete and the tree delete) — invisible
    // to queries, but before the scrub it leaked on disk forever
    val orphan = java.nio.file.Paths.get(s"$dir/gen=0/postings")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.writeString(orphan.resolve("stale.parquet"), "leak")
    IncrementalIndexer.appendBatch(docs.where(col("docId").isin(4L)), 2L, dir, cfg)
    IncrementalIndexer.compact(spark, dir, cfg) // scrub removes the orphan too
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/gen=0")))
    assert(IncrementalIndexer.open(spark, dir, cfg).doclens.count() == 4)
  }

  test("streaming exact-dedup (flatMapGroupsWithState) matches batch exactDedup") {
    import graft.pipeline.TextPipeline
    import graft.streaming.StreamDedup
    val docs = Seq(
      (1L, "alpha beta"), (2L, "gamma"), (3L, "alpha beta"),   // batch 1 (3 dups 1)
      (4L, "delta"), (5L, "gamma"), (6L, "alpha beta"),        // batch 2 (5 dups 2, 6 dups 1)
      (7L, "epsilon"), (8L, "delta")                           // batch 3 (8 dups 4)
    )
    val input = MemoryStream[(Long, String)](spark)
    val out = StreamDedup.dedupStream(input.toDF().toDF("docId", "content"))
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    input.addData(docs.slice(0, 3)); q.processAllAvailable()
    input.addData(docs.slice(3, 6)); q.processAllAvailable()
    input.addData(docs.slice(6, 8)); q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("select docId, keeper, isDup from dedup_out")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

    // batch oracle: ids ascend in arrival order, so first-arrival keeper
    // == min-id keeper
    val batch = TextPipeline.exactDedup(docs.toDF("docId", "content"), "docId", "content")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2) == 1))).toMap
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    assert(streamed(6L) == ((1L, true)) && streamed(8L) == ((4L, true))) // cross-batch state
  }

  test("KBA standing-query stream filter matches scalar BM25 (k1=1.75)") {
    // background stats from the full corpus
    val idx = IndexBuilder.build(allDocs.toDF("docId", "content"), cfg)
    val termDf = idx.dictionary.select("term", "df").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val queries = Seq(
      StreamFilter.StandingQuery("e1", "alpha gamma"),
      StreamFilter.StandingQuery("e2", "delta missingterm"))

    val got = StreamFilter.score(
      allDocs.toDF("docId", "content"), queries, idx.stats, termDf,
      cfg.analyzer, cutoff = Double.NegativeInfinity)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap

    // scalar oracle, straight from kba/BM25Scorer.cc
    val n = idx.stats.totalDocs.toDouble
    val avgdl = idx.stats.avgDocLength
    def idf(t: String) = math.log((n - termDf(t) + 0.5) / (termDf(t) + 0.5))
    def score(content: String, terms: Seq[String]): Double = {
      val toks = content.split(" ")
      val dl = toks.length
      val denom = 1.75 * 0.25 + (dl / avgdl) * 1.75 * 0.75
      terms.filter(termDf.contains).map { t =>
        val f = toks.count(_ == t)
        if (f > 0) idf(t) * (f.toDouble / (f + denom)) else 0.0
      }.sum
    }
    allDocs.foreach { case (id, content) =>
      assert(math.abs(got((id, "e1")) - score(content, Seq("alpha", "gamma"))) < 1e-9)
      assert(math.abs(got((id, "e2")) - score(content, Seq("delta", "missingterm"))) < 1e-9)
    }

    // and the same transform runs as a real stream
    val input = MemoryStream[(Long, String)](spark)
    val out = StreamFilter.score(
      input.toDF().toDF("docId", "content"), queries, idx.stats, termDf,
      cfg.analyzer, cutoff = -0.5)
    val sq = out.writeStream.format("memory").queryName("kba_out").start()
    input.addData(allDocs)
    sq.processAllAvailable()
    sq.stop()
    val streamed = spark.sql("select * from kba_out").count()
    val static = StreamFilter.score(allDocs.toDF("docId", "content"), queries,
      idx.stats, termDf, cfg.analyzer, cutoff = -0.5).count()
    assert(streamed == static && streamed > 0)
  }
}

private object Files {
  def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

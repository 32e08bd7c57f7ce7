package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.index._
import graft.search.{Engine, ScoringRule}

/** Checkpoint/resume contract of the segment store
  * (reference: src/Repository.cpp:1198-1215 checkpoint;
  * buildindex/IndriBuildIndex.cpp:609-656 recovery; FIXTURES.md resume
  * test: rerun after partial failure == single-run output).
  */
class StoreResumeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val cfg = IndexConfig(analyzerMode = "simple", blockSize = 32, numBuckets = 4)

  private def buildIdx() = {
    val corpus = graft.corpus.CorpusSynthesizer.corpus(spark, 200)
    val docs = IndexBuilder.assignDocIdsScalable(corpus, Seq("repo", "path", "commit"))
    IndexBuilder.build(docs.select("docId", "content"), cfg)
  }

  test("writeAll → open round-trips; resume skips committed tables") {
    val dir = java.nio.file.Files.createTempDirectory("segstore").toString
    val idx = buildIdx()
    val written1 = SegmentStore.writeAll(idx, dir, cfg)
    assert(written1 == Set("segments", "dictionary", "doclens", "stats", "manifest", "fields"))

    // identical rerun writes nothing (full resume)
    assert(SegmentStore.writeAll(idx, dir, cfg).isEmpty)

    // simulate a crash that lost two tables' markers (partial failure)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "dictionary", "_GRAFT_SUCCESS"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "stats", "_GRAFT_SUCCESS"))
    val written2 = SegmentStore.writeAll(idx, dir, cfg)
    assert(written2 == Set("dictionary", "stats"))

    // config change invalidates everything (fingerprint mismatch)
    val cfg2 = cfg.copy(blockSize = 16)
    val idx2 = buildIdx().copy(segments =
      IndexBuilder.buildSegments(idx.postings, idx.stats.totalDocs, cfg2).toDF())
    assert(SegmentStore.writeAll(idx2, dir, cfg2).size == 6)

    // open() view answers queries identically to the in-memory build
    val stored = SegmentStore.open(spark, dir)
    assert(stored.stats == idx.stats)
    val storedIdx = InvertedIndex(
      postings = null, dictionary = stored.dictionary, doclens = stored.doclens,
      stats = stored.stats, segments = stored.segments)
    val eMem = new Engine(spark, idx, cfg.analyzer, ScoringRule(method = "okapi"))
    val eDisk = new Engine(spark, storedIdx, cfg.analyzer, ScoringRule(method = "okapi"))
    val q = Seq("return" -> 1.0, "license" -> 1.0)
    val rMem = eMem.runDaat(q, 10, exhaustive = false).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rDisk = eDisk.runDaat(q, 10, exhaustive = false).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rMem == rDisk && rMem.nonEmpty)

    // per-partition lineage manifest rows audit the build
    val manifest = spark.read.parquet(s"$dir/manifest")
    assert(manifest.where(col("status") === "complete").count() > 0)
    val totalPostings = manifest.agg(sum("postings")).head().getLong(0)
    assert(totalPostings == idx.postings.count())
  }
}

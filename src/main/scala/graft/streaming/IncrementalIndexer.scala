package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{CorpusStats, IndexBuilder, IndexConfig, InvertedIndex}

/** Incremental (streaming) index maintenance — the Spark-native shape of
  * the reference's Repository index stack: one writable MemoryIndex that
  * is periodically flushed to disk and merged in the background
  * (reference: src/Repository.cpp:223-243,720-814,
  * src/RepositoryMaintenanceThread.cpp:110-165).
  *
  * Mapping: a Structured Streaming micro-batch = one MemoryIndex flush;
  * `foreachBatch(sink(dir, cfg))` appends a new immutable generation
  * directory `gen=<batchId>` holding that batch's postings+doclens;
  * `open` unions the generations (the index-stack view a query sees);
  * `compact` merges all generations into one (the TRIM merge,
  * reference: src/Repository.cpp:754-814).
  *
  * Crash safety / exactly-once: a generation is visible only after its
  * `_GEN_SUCCESS` marker is written; a replayed batchId (Spark restarts
  * from its own checkpoint) is skipped if the marker exists — the
  * checkpoint/recovery contract (reference: src/Repository.cpp:1198-1215,
  * buildindex/IndriBuildIndex.cpp:609-656).
  *
  * docIds must be globally unique across batches (carried on the rows,
  * e.g. an event/document id), mirroring sequential docID assignment.
  */
object IncrementalIndexer {

  private def genDir(dir: String, gen: String) = s"$dir/gen=$gen"
  private def marker(dir: String, gen: String) =
    Paths.get(genDir(dir, gen), "_GEN_SUCCESS")

  /** Write one micro-batch of (docId, content) rows as a generation.
    * Idempotent per batchId.
    */
  def appendBatch(batch: DataFrame, batchId: Long, dir: String, cfg: IndexConfig): Unit = {
    val gen = batchId.toString
    if (Files.exists(marker(dir, gen))) return // replay after restart
    val tokenized = IndexBuilder.tokenize(batch, cfg)
    val postings = IndexBuilder.buildPostings(tokenized, cfg)
    postings.write.mode("overwrite").parquet(s"${genDir(dir, gen)}/postings")
    IndexBuilder.buildDocLens(tokenized).write.mode("overwrite")
      .parquet(s"${genDir(dir, gen)}/doclens")
    Files.createDirectories(Paths.get(genDir(dir, gen)))
    Files.writeString(marker(dir, gen), cfg.fingerprint)
  }

  /** foreachBatch sink closure:
    * {{{ docsStream.writeStream.foreachBatch(IncrementalIndexer.sink(dir, cfg)) }}}
    */
  def sink(dir: String, cfg: IndexConfig): (DataFrame, Long) => Unit =
    (batch, batchId) => appendBatch(batch, batchId, dir, cfg)

  private def completedGens(dir: String): Seq[String] = {
    val d = Paths.get(dir)
    if (!Files.exists(d)) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val s = Files.list(d)
    try {
      s.forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("gen=")) {
          val g = name.stripPrefix("gen=")
          if (Files.exists(marker(dir, g))) out += g
        }
      }
    } finally s.close()
    out.toSeq.sorted
  }

  /** Open the union view over all committed generations and rebuild the
    * derived tables (dictionary / doclens / stats / segments). The union
    * is the "stack of indexes" a reference query iterates
    * (reference: src/InferenceNetwork.cpp:285-365 loops the index stack).
    */
  def open(spark: SparkSession, dir: String, cfg: IndexConfig): InvertedIndex = {
    val gens = completedGens(dir)
    require(gens.nonEmpty, s"no committed generations under $dir")
    val postings = spark.read.parquet(gens.map(g => s"${genDir(dir, g)}/postings"): _*)
    val doclens = spark.read.parquet(gens.map(g => s"${genDir(dir, g)}/doclens"): _*)
    val dictionary = IndexBuilder.buildDictionary(postings)
    val stats = IndexBuilder.buildStats(doclens, dictionary)
    val segments = IndexBuilder.buildSegments(postings, stats.totalDocs, cfg).toDF()
    InvertedIndex(postings, dictionary, doclens, stats, segments)
  }

  /** Merge every committed generation into a single one — the background
    * TRIM/merge (reference: src/Repository.cpp:754-814; deleted-doc skip
    * during merge is the caller's anti-join before compaction, reference:
    * src/IndexWriter.cpp:575-580). Atomic: the merged generation commits
    * its marker before old generations are dropped.
    */
  def compact(spark: SparkSession, dir: String, cfg: IndexConfig,
              mergedGen: String = "merged"): Unit = {
    val gens = completedGens(dir).filterNot(_ == mergedGen)
    if (gens.isEmpty) return
    val postings = spark.read.parquet(gens.map(g => s"${genDir(dir, g)}/postings"): _*)
    val doclens = spark.read.parquet(gens.map(g => s"${genDir(dir, g)}/doclens"): _*)
    postings.write.mode("overwrite").parquet(s"${genDir(dir, mergedGen)}/postings")
    doclens.write.mode("overwrite").parquet(s"${genDir(dir, mergedGen)}/doclens")
    Files.writeString(marker(dir, mergedGen), cfg.fingerprint)
    gens.foreach { g =>
      // drop the old generation (marker first, so a crash mid-delete
      // leaves only invisible garbage, never a half-visible generation)
      val gd = Paths.get(genDir(dir, g))
      Files.deleteIfExists(marker(dir, g))
      Files.walk(gd).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }
}

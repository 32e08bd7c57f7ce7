package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.analysis.Analyzer

/** Index build configuration.
  *
  * @param blockSize     postings per compressed block — the analogue of the
  *                      reference's 4 KB skip batches
  *                      (reference: src/IndexWriter.cpp:527, minimumSkip 1<<12)
  * @param numBuckets    docId-range buckets per term for the salted
  *                      sort-merge shuffle; hot terms (e.g. `return`,
  *                      `license` in code corpora) split across buckets so
  *                      no single reducer owns a whole mega-posting-list
  * @param topdocsMinDf  df threshold that triggers a topdocs list
  *                      (reference: include/indri/IndexWriter.hpp:229-232)
  * @param topdocsFraction fraction of df kept in topdocs
  *                      (reference: src/IndexWriter.cpp:530-534)
  */
final case class IndexConfig(
    analyzerMode: String = "indri",
    stopwords: Set[String] = Set.empty,
    stemmerName: String = "none",
    blockSize: Int = 1024,
    numBuckets: Int = 32,
    topdocsMinDf: Long = 1000L,
    topdocsFraction: Double = 0.01,
    storePositions: Boolean = true
) {
  def analyzer: Analyzer =
    Analyzer(analyzerMode, stopwords, graft.analysis.Stemmers.byName(stemmerName))
  /** stable fingerprint for resume checks */
  def fingerprint: String = {
    val s = s"$analyzerMode|${stopwords.toSeq.sorted.mkString(",")}|$stemmerName|$blockSize|$numBuckets|$topdocsMinDf|$topdocsFraction|$storePositions"
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}

/** One compressed posting block — the segment-table row. Blocks of a term
  * are disjoint docId ranges ordered by firstDoc; (maxTf, minDl) are the
  * block-max WAND bounds (Ding & Suel block-max metadata as columns).
  */
final case class SegmentBlock(
    term: String,
    bucket: Int,
    firstDoc: Long,
    lastDoc: Long,
    numDocs: Int,
    maxTf: Int,
    minDl: Int,
    docsDelta: Array[Byte],
    tfs: Array[Byte],
    dls: Array[Byte],
    positionsDelta: Array[Byte]
)

/** Logical handle over all built index tables. */
final case class InvertedIndex(
    postings: DataFrame,   // (term, docId, tf, positions, doclen)
    dictionary: DataFrame, // (term, df, ctf, maxDocLen, minDocLen)
    doclens: DataFrame,    // (docId, length)
    stats: CorpusStats,
    segments: DataFrame    // SegmentBlock schema
)

final case class CorpusStats(totalDocs: Long, totalTerms: Long, uniqueTerms: Long) {
  /** avgdl = contextSize / documentCount — global, includes null slots
    * (reference: src/TermScoreFunctionFactory.cpp:95,
    * src/MemoryIndex.cpp:617 totalTerms += words.size()).
    */
  def avgDocLength: Double = totalTerms / totalDocs.toDouble
}

object IndexBuilder {

  /** Dense 1-based docIds over the corpus-table primary key, mirroring
    * sequential assignment at add time (reference: src/MemoryIndex.cpp:550-552).
    * Never `monotonically_increasing_id` — not dense, not layout-stable.
    *
    * Scale note: a single-partition global window is a bottleneck at
    * 10^12 rows; there we'd switch to zipWithIndex over a range-sorted
    * Dataset (per-partition offsets computed from partition counts — one
    * extra count job, no single-reducer sort). Semantics are identical;
    * the window form keeps the plan fully declarative at test scale.
    */
  def assignDocIds(corpus: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = Window.orderBy(keyCols.map(col): _*)
    corpus.withColumn("docId", row_number().over(w).cast(LongType))
  }

  /** (docId, content) → (docId, slots) where slots has one entry per token
    * position; null slot = stopped/over-long term (position still counts).
    */
  def tokenize(docs: DataFrame, cfg: IndexConfig,
               contentCol: String = "content"): DataFrame = {
    val az = cfg.analyzer
    val analyzeUdf = udf((text: String) => az.analyze(text))
    docs.withColumn("slots", analyzeUdf(col(contentCol)))
  }

  /** Positional postings with denormalized doclen:
    * (term, docId, tf, positions, doclen).
    *
    * posexplode + two-level agg; Spark's partial (map-side) aggregation of
    * the groupBy is the analogue of the reference's in-memory
    * DocListMemoryBuilder (reference: src/MemoryIndex.cpp:538-651).
    * Positions are 0-based like the reference.
    */
  def buildPostings(tokenized: DataFrame, cfg: IndexConfig): DataFrame = {
    val exploded = tokenized
      .select(col("docId"), size(col("slots")).as("doclen"),
        posexplode(col("slots")).as(Seq("pos", "term")))
      .where(col("term").isNotNull)
    exploded
      .groupBy(col("term"), col("docId"))
      .agg(
        count(lit(1)).cast(IntegerType).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"),
        first(col("doclen")).as("doclen")
      )
  }

  /** Per-term statistics (reference TermData semantics:
    * include/indri/TermData.hpp:35-66 — df, ctf, min/max doclen kept for
    * max-score pruning).
    */
  def buildDictionary(postings: DataFrame): DataFrame = {
    postings.groupBy("term").agg(
      count(lit(1)).as("df"),
      sum(col("tf").cast(LongType)).as("ctf"),
      max(col("doclen")).as("maxDocLen"),
      min(col("doclen")).as("minDocLen")
    )
  }

  /** (docId, length); length counts ALL positions including null slots
    * (reference: src/MemoryIndex.cpp:647 words.size()).
    */
  def buildDocLens(tokenized: DataFrame): DataFrame =
    tokenized.select(col("docId"), size(col("slots")).as("length"))

  def buildStats(doclens: DataFrame, dictionary: DataFrame): CorpusStats = {
    val r = doclens.agg(
      count(lit(1)).as("docs"),
      sum(col("length").cast(LongType)).as("terms")).head()
    CorpusStats(r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1),
      dictionary.count())
  }

  /** Topdocs per term: df > topdocsMinDf → keep top fraction ranked by
    * tf/length (reference: src/IndexWriter.cpp:530-534,585-608).
    */
  def buildTopdocs(postings: DataFrame, cfg: IndexConfig): DataFrame = {
    val w = Window.partitionBy("term")
      .orderBy(col("frac").desc, col("docId").asc)
    postings
      .withColumn("frac", col("tf").cast(DoubleType) / col("doclen"))
      .withColumn("rk", row_number().over(w))
      .withColumn("dfw", count(lit(1)).over(Window.partitionBy("term")))
      .where(col("dfw") > cfg.topdocsMinDf &&
        col("rk") <= greatest(lit(1), ceil(col("dfw") * cfg.topdocsFraction)))
      .select(col("term"), col("docId"), col("tf"), col("doclen").as("length"))
  }

  /** The sort-merge core: shuffle postings by (term, docId-range bucket),
    * sort runs by (term, docId), block-compress.
    *
    * This is the Spark-native analogue of the reference's k-way
    * priority-queue merge in (term, docID) order
    * (reference: src/IndexWriter.cpp:810-879) — Spark's sort-based shuffle
    * IS that merge. The bucket in the shuffle key is the skew salt: a term
    * with df = 50% of the corpus spreads over `numBuckets` reducers, each
    * building disjoint docId-range blocks, instead of one reducer owning
    * the whole list (north-rule skew requirement).
    */
  def buildSegments(postings: DataFrame, totalDocs: Long, cfg: IndexConfig): Dataset[SegmentBlock] = {
    val spark = postings.sparkSession
    import spark.implicits._
    val buckets = math.max(1, cfg.numBuckets)
    val span = math.max(1L, (totalDocs + buckets - 1) / buckets)
    val blockSize = cfg.blockSize
    val storePos = cfg.storePositions

    val withBucket = postings
      .withColumn("bucket", ((col("docId") - 1L) / span).cast(IntegerType))
      .select("term", "bucket", "docId", "tf", "positions", "doclen")
      .repartition(col("term"), col("bucket"))
      .sortWithinPartitions("term", "bucket", "docId")

    withBucket.mapPartitions { rows =>
      new Iterator[SegmentBlock] {
        private var curTerm: String = null
        private var curBucket: Int = -1
        private val docs = scala.collection.mutable.ArrayBuffer.empty[Long]
        private val tfs = scala.collection.mutable.ArrayBuffer.empty[Long]
        private val dls = scala.collection.mutable.ArrayBuffer.empty[Long]
        private val poss = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
        private var pending: SegmentBlock = null
        private val it = rows.buffered

        private def flush(): SegmentBlock = {
          val n = docs.length
          val dArr = docs.toArray; val tArr = tfs.toArray; val lArr = dls.toArray
          val block = SegmentBlock(
            term = curTerm, bucket = curBucket,
            firstDoc = dArr(0), lastDoc = dArr(n - 1), numDocs = n,
            maxTf = tArr.max.toInt, minDl = lArr.min.toInt,
            docsDelta = BlockCodec.encodeDeltas(dArr),
            tfs = BlockCodec.encodePlain(tArr),
            dls = BlockCodec.encodePlain(lArr),
            positionsDelta = if (storePos) BlockCodec.encodePositions(poss.toArray) else Array.emptyByteArray
          )
          docs.clear(); tfs.clear(); dls.clear(); poss.clear()
          block
        }

        override def hasNext: Boolean = pending != null || it.hasNext || docs.nonEmpty

        override def next(): SegmentBlock = {
          if (pending != null) { val b = pending; pending = null; return b }
          while (it.hasNext) {
            val r = it.head
            val term = r.getString(0); val bucket = r.getInt(1)
            if (curTerm == null) { curTerm = term; curBucket = bucket }
            if (term != curTerm || bucket != curBucket || docs.length >= blockSize) {
              if (docs.nonEmpty) {
                val b = flush()
                curTerm = term; curBucket = bucket
                return b
              }
              curTerm = term; curBucket = bucket
            }
            it.next()
            docs += r.getLong(2)
            tfs += r.getInt(3).toLong
            dls += r.getInt(5).toLong
            if (storePos) {
              val ps = r.getSeq[Int](4)
              poss += ps.toArray
            }
          }
          if (docs.nonEmpty) flush()
          else throw new NoSuchElementException
        }
      }
    }
  }

  /** Decode a segment block back to (docId, tf, doclen, positions). */
  def decodeBlock(b: SegmentBlock): (Array[Long], Array[Int], Array[Int], Array[Array[Int]]) = {
    val docs = BlockCodec.decodeDeltas(b.docsDelta, b.numDocs)
    val tfs = BlockCodec.decodePlain(b.tfs, b.numDocs).map(_.toInt)
    val dls = BlockCodec.decodePlain(b.dls, b.numDocs).map(_.toInt)
    val pos = if (b.positionsDelta.nonEmpty) BlockCodec.decodePositions(b.positionsDelta, b.numDocs)
              else Array.empty[Array[Int]]
    (docs, tfs, dls, pos)
  }

  /** Full build from a corpus-shaped table (repo, path, commit, lang,
    * content). Adds content_sha256 (the per-row invariant column).
    */
  def buildFromCorpus(corpus: DataFrame, cfg: IndexConfig = IndexConfig()): InvertedIndex = {
    val withSha = corpus.withColumn("content_sha256", sha2(col("content"), 256))
    val docs = assignDocIds(withSha, Seq("repo", "path", "commit"))
    build(docs.select(col("docId"), col("content")), cfg)
  }

  /** Full build from (docId, content). */
  def build(docs: DataFrame, cfg: IndexConfig = IndexConfig()): InvertedIndex = {
    val tokenized = tokenize(docs, cfg).persist()
    val postings = buildPostings(tokenized, cfg)
    val dictionary = buildDictionary(postings)
    val doclens = buildDocLens(tokenized)
    val stats = buildStats(doclens, dictionary)
    val segments = buildSegments(postings, stats.totalDocs, cfg).toDF()
    InvertedIndex(postings, dictionary, doclens, stats, segments)
  }
}

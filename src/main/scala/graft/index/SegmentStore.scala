package graft.index

import java.nio.file.{Files, Paths, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed segment store in an Iceberg-compatible layout:
  * one directory per table, a JSON manifest recording the build
  * fingerprint and per-partition lineage, and a _GRAFT_SUCCESS marker
  * per table making the on-disk state openable at any time — the
  * analogue of the reference's repository checkpoint
  * (reference: src/Repository.cpp:1198-1215) and crash recovery
  * (reference: buildindex/IndriBuildIndex.cpp:609-656).
  *
  * Resume contract: `writeAll` skips any table whose success marker and
  * fingerprint match the current config — a rerun after a partial
  * failure only rebuilds the missing tables (per-table lineage; the
  * per-partition lineage rows inside `manifest` audit the shuffle
  * output). No Iceberg runtime jar ships in this sandbox; the layout
  * keeps table IO behind this object so an Iceberg catalog can drop in.
  */
object SegmentStore {

  val Tables = Seq("segments", "dictionary", "doclens", "stats", "manifest")

  private def marker(dir: String, table: String): Path =
    Paths.get(dir, table, "_GRAFT_SUCCESS")

  /** stable catalog name for the bucketed segments table of a store dir */
  private def segmentsTableName(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    s"graft_segments_$h"
  }

  /** catalog DDL for the segments table: CLUSTERED BY (bucket) makes the
    * scan one task per bucket with files never split — every DAAT task
    * holds complete (term × bucket) posting groups and the per-query
    * exchange disappears (the Iceberg/warehouse analogue of the
    * reference's per-server index layout,
    * src/QueryEnvironment.cpp:242-316).
    */
  private def registerSegmentsTable(spark: SparkSession, dir: String,
                                    numBuckets: Int): String = {
    val name = segmentsTableName(dir)
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $name (
         |  term STRING, bucket INT, firstDoc BIGINT, lastDoc BIGINT,
         |  numDocs INT, maxTf INT, minDl INT,
         |  docsDelta BINARY, tfs BINARY, dls BINARY, positionsDelta BINARY
         |) USING PARQUET
         |CLUSTERED BY (bucket) SORTED BY (term) INTO $numBuckets BUCKETS
         |LOCATION '$dir/segments'""".stripMargin)
    name
  }

  def isComplete(dir: String, table: String, fingerprint: String): Boolean = {
    val m = marker(dir, table)
    Files.exists(m) && Files.readString(m).trim == fingerprint
  }

  private def commit(dir: String, table: String, fingerprint: String): Unit =
    Files.writeString(marker(dir, table), fingerprint)

  /** Write all index tables; skips tables already committed with the same
    * fingerprint (resume path).
    * Returns the set of tables actually (re)written.
    */
  def writeAll(index: InvertedIndex, dir: String, cfg: IndexConfig): Set[String] = {
    val spark = index.postings.sparkSession
    val fp = cfg.fingerprint
    Files.createDirectories(Paths.get(dir))
    var written = Set.empty[String]
    // segments feed two tables (segments + manifest) — persist so the
    // shuffle+encode pipeline runs once
    index.segments.persist()

    val lock = new Object
    def writeTable(name: String)(df: => DataFrame): Unit = {
      if (!isComplete(dir, name, fp)) {
        df.write.mode("overwrite").parquet(s"$dir/$name")
        commit(dir, name, fp)
        lock.synchronized { written += name }
      }
    }

    // segments: a BUCKETED datasource table (one file set per bucket,
    // scan = one task per bucket, no per-query exchange in the DAAT
    // path). Repartition by bucket first so each write task emits its
    // own bucket's file instead of one file per bucket per task.
    if (!isComplete(dir, "segments", fp)) {
      val spark2 = index.segments.sparkSession
      val name = segmentsTableName(dir)
      spark2.sql(s"DROP TABLE IF EXISTS $name")
      val buckets = math.max(1, cfg.numBuckets)
      index.segments
        .repartition(buckets, col("bucket"))
        .write.mode("overwrite")
        .bucketBy(buckets, "bucket").sortBy("term")
        .option("path", s"$dir/segments")
        .saveAsTable(name)
      Files.writeString(Paths.get(dir, "segments", "_BUCKETS"), buckets.toString)
      commit(dir, "segments", fp)
      lock.synchronized { written += "segments" }
    }
    // the small tables are independent jobs — run them concurrently so
    // their driver-side commit latencies overlap instead of summing
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    try {
      val fs = Seq(
        pool.submit(new Runnable { def run(): Unit = writeTable("dictionary")(index.dictionary) }),
        pool.submit(new Runnable { def run(): Unit = writeTable("doclens")(index.doclens) }),
        pool.submit(new Runnable { def run(): Unit = writeTable("stats") {
          import spark.implicits._
          Seq(index.stats).toDF()
        } })
      )
      fs.foreach(_.get())
    } finally pool.shutdown()
    // Per-partition lineage rows: one per (bucket) shuffle output, with
    // row counts and an order-insensitive checksum — the audit trail for
    // partial-rerun equality (north-rule lineage requirement).
    writeTable("manifest") {
      index.segments.groupBy("bucket").agg(
        count(lit(1)).as("blocks"),
        sum(col("numDocs").cast("long")).as("postings"),
        countDistinct(col("term")).as("terms"),
        // xor of per-block hashes — associative+commutative, so stable
        // under any partition evaluation order (and overflow-free under
        // ANSI mode, unlike a sum)
        expr("bit_xor(xxhash64(term, firstDoc, lastDoc, numDocs))").as("checksum")
      ).withColumn("status", lit("complete"))
       .withColumn("fingerprint", lit(fp))
    }
    index.segments.unpersist()
    written
  }

  def open(spark: SparkSession, dir: String): StoredIndex = {
    val stats = spark.read.parquet(s"$dir/stats").head()
    // stores written before the bucketed-table change have no _BUCKETS
    // file — open those as a plain (unbucketed) parquet read instead of
    // failing with NoSuchFileException
    val bucketsFile = Paths.get(dir, "segments", "_BUCKETS")
    val numBuckets =
      if (Files.exists(bucketsFile)) Files.readString(bucketsFile).trim.toInt else 0
    // (re)register the bucketed table — catalog metadata is per-session,
    // the files + bucket spec on disk are the durable state
    val segments =
      if (numBuckets > 0)
        spark.table(registerSegmentsTable(spark, dir, numBuckets))
      else spark.read.parquet(s"$dir/segments")
    StoredIndex(
      segments = segments,
      dictionary = spark.read.parquet(s"$dir/dictionary"),
      doclens = spark.read.parquet(s"$dir/doclens"),
      stats = CorpusStats(
        stats.getAs[Long]("totalDocs"),
        stats.getAs[Long]("totalTerms"),
        stats.getAs[Long]("uniqueTerms")),
      numBuckets = numBuckets
    )
  }
}

final case class StoredIndex(
    segments: DataFrame,
    dictionary: DataFrame,
    doclens: DataFrame,
    stats: CorpusStats,
    numBuckets: Int = 0
)

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

  val Tables = Seq("segments", "dictionary", "doclens", "stats", "manifest", "fields")

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
      ) ++ (if (index.fieldExtents != null)
        Seq(pool.submit(new Runnable {
          def run(): Unit = writeTable("fields")(index.fieldExtents)
        }))
      else Nil)
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
      numBuckets = numBuckets,
      fieldExtents =
        if (Files.exists(Paths.get(dir, "fields"))) spark.read.parquet(s"$dir/fields")
        else null
    )
  }

  /** Offline field surgery — the modifyfields analogue (reference:
    * modifyfields/ModifyFields.cpp): rewrite the stored field-extent
    * table WITHOUT re-tokenizing or touching postings. `remove` drops
    * whole field classes; `add` is an offset-annotation table
    * (docId, field, begin, end [, number, ordinal, parentField,
    * parentOrdinal]) — new extents come from annotations exactly as the
    * reference sources added fields from the OffsetAnnotationAnnotator
    * file (markup-derived fields would need the token stream, which
    * neither engine re-parses here). Token positions and postings are
    * untouched, so a rewrite equals a full rebuild with the new
    * FieldSpec set over the same annotator inputs (StoreRewriteSpec).
    */
  def rewriteFields(spark: SparkSession, dir: String,
                    remove: Seq[String] = Nil,
                    add: DataFrame = null): Unit = {
    val fieldsPath = Paths.get(dir, "fields")
    val schema = "docId BIGINT, field STRING, begin INT, end INT, " +
      "number BIGINT, ordinal INT, parentField STRING, parentOrdinal INT"
    val existing =
      if (Files.exists(fieldsPath)) spark.read.parquet(s"$dir/fields")
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schema))
    val kept =
      if (remove.isEmpty) existing
      else existing.where(!col("field").isin(remove: _*))
    val added = Option(add).map { a =>
      // normalize optional columns to the stored schema
      val withDefaults = Seq(
        "number" -> lit(0L), "ordinal" -> lit(1),
        "parentField" -> lit(null).cast("string"), "parentOrdinal" -> lit(0)
      ).foldLeft(a) { case (df, (c, d)) =>
        if (df.columns.contains(c)) df else df.withColumn(c, d)
      }
      withDefaults.select(col("docId").cast("bigint"), col("field"),
        col("begin").cast("int"), col("end").cast("int"),
        col("number").cast("bigint"), col("ordinal").cast("int"),
        col("parentField").cast("string"), col("parentOrdinal").cast("int"))
    }
    val merged = added.fold(kept)(kept.unionByName(_))
    // the new table is derived FROM the old files — stage to a side
    // directory, then swap, so the read never races its own overwrite
    val tmp = s"$dir/fields.rewrite"
    val oldFp =
      if (Files.exists(marker(dir, "fields"))) Files.readString(marker(dir, "fields")).trim
      else ""
    merged.write.mode("overwrite").parquet(tmp)
    // rename-aside swap: the old table survives any crash until the new
    // one is in place (a delete-then-move would lose the table if the
    // JVM dies between the two steps)
    val aside = Paths.get(s"$dir/fields.old")
    if (Files.exists(aside)) {
      Files.walk(aside)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
    if (Files.exists(fieldsPath)) Files.move(fieldsPath, aside)
    Files.move(Paths.get(tmp), fieldsPath)
    if (Files.exists(aside)) {
      Files.walk(aside)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
    commit(dir, "fields", s"$oldFp+rewrite")
  }
}

final case class StoredIndex(
    segments: DataFrame,
    dictionary: DataFrame,
    doclens: DataFrame,
    stats: CorpusStats,
    numBuckets: Int = 0,
    fieldExtents: DataFrame = null
)

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamNearDedup

/** Stateful LSH bucket-claim near-dedup: identical documents share every
  * band bucket, so they are flagged with probability 1 and resolve to
  * the minimum-id keeper; documents with no shared bucket keep
  * themselves.
  */
class StreamNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("exact duplicates flagged with min-id keeper; uniques keep themselves") {
    val dup = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, dup),
      (2L, "a completely different text about distributed query engines at scale"),
      (5L, dup),
      (9L, dup),
      (7L, "yet another unrelated document discussing inverted index compression")
    ).toDF("doc_id", "text")
    val got = StreamNearDedup.neardupStream(docs, "doc_id", "text",
      numHashes = 4, bands = 2)
      .select("docId", "keeper", "isDup")
      .as[(Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((1L, 0)))
    assert(got(5L) == ((1L, 1)))
    assert(got(9L) == ((1L, 1)))
    assert(got(2L)._2 == 0 && got(7L)._2 == 0)
    assert(got.size == 5)
  }

  test("out-of-order smaller docId takes over keepership; later docs still flagged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[StreamNearDedup.BandRec](spark)
    val q = StreamNearDedup.bucketClaims(in.toDS())
      .writeStream.format("memory").queryName("claims_ooo")
      .outputMode("append").start()
    try {
      // docId 5 claims the bucket first; 3 arrives LATER (out of id
      // order) and must lower the stored keeper — without the state
      // update, 4 would then emit min(stale 5, 4) = itself and escape
      in.addData(StreamNearDedup.BandRec(5L, "b#x")); q.processAllAvailable()
      in.addData(StreamNearDedup.BandRec(3L, "b#x")); q.processAllAvailable()
      in.addData(StreamNearDedup.BandRec(4L, "b#x")); q.processAllAvailable()
      val claims = spark.table("claims_ooo")
        .as[(Long, Long)].collect().toMap
      assert(claims == Map(5L -> 5L, 3L -> 3L, 4L -> 3L))
    } finally q.stop()
  }

  test("docs below the shingle width never band — no shared empty bucket") {
    // an all-null minhash signature used to concat_ws into one shared ''
    // bucket, flagging every short doc as a near-dup of the smallest one
    val docs = Seq(
      (1L, "hello world"), // 2 tokens < shingleK=3 → no signature
      (2L, "foo bar"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"),
      (8L, "the quick brown fox jumps over the lazy dog again and again")
    ).toDF("doc_id", "text")
    val got = StreamNearDedup.neardupStream(docs, "doc_id", "text",
      numHashes = 4, bands = 2)
      .select("docId", "keeper", "isDup")
      .as[(Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // short docs carry no content evidence: absent from the verdict
    assert(got == Map(3L -> ((3L, 0)), 8L -> ((3L, 1))))
    // the batch LSH pair path shares the filter: no pairs among them
    val pairs = graft.pipeline.TextPipeline.minhashLshPairs(
      Seq((1L, "hello world"), (2L, "foo bar")).toDF("doc_id", "text"),
      "doc_id", "text", numHashes = 4, bands = 2, shingleK = 3)
    assert(pairs.isEmpty)
  }
}

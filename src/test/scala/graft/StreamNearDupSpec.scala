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
}

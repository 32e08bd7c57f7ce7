package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication over a document stream: the first
  * document carrying a given content hash wins; every later duplicate is
  * either dropped or emitted flagged. Custom keyed state via
  * flatMapGroupsWithState (KeyValueGroupedDataset) — the stateful-stream
  * shape a training-data ingest pipeline needs in front of the
  * incremental indexer (IncrementalIndexer.sink).
  *
  * State per content hash = the keeper docId (16-byte key + 8-byte
  * value): at 100 TB the state store shards by hash across executors and
  * stays tiny relative to the data; with event-time watermarking the
  * caller can bound state via `ttl` (processing-time timeout here, since
  * duplicate arrivals are unbounded in general).
  *
  * The same transform works on a static frame (tested against
  * TextPipeline.exactDedup in StreamingSpec) — first-occurrence ordering
  * on a static frame follows docId order for determinism.
  */
object StreamDedup {

  final case class DedupRecord(docId: Long, hash: String, content: String)
  final case class DedupOut(docId: Long, keeper: Long, isDup: Boolean, content: String)

  /** Streaming path: one state entry (keeper docId) per content hash.
    * Emits every input row with (keeper, isDup); filter `!isDup` for the
    * keep-first stream.
    */
  def dedupStream(docs: DataFrame, idCol: String = "docId",
                  contentCol: String = "content",
                  ttl: Option[java.time.Duration] = None): Dataset[DedupOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val recs = docs.select(
      col(idCol).cast("long").as("docId"),
      md5(col(contentCol)).as("hash"),
      col(contentCol).as("content")).as[DedupRecord]
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    recs.groupByKey(_.hash)
      .flatMapGroupsWithState[Long, DedupOut](OutputMode.Append, timeout) {
        (hash: String, rows: Iterator[DedupRecord], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // within a micro-batch, smallest docId wins first — matches
            // the batch exactDedup keeper = min(id) for same-batch dups
            val batch = rows.toArray.sortBy(_.docId)
            val out = batch.iterator.map { r =>
              if (!state.exists) {
                state.update(r.docId)
                ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
                DedupOut(r.docId, r.docId, isDup = false, r.content)
              } else DedupOut(r.docId, state.get, isDup = true, r.content)
            }.toArray
            out.iterator
          }
      }
  }
}

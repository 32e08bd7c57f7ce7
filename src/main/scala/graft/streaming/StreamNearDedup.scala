package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.pipeline.TextPipeline

/** Streaming NEAR-duplicate detection: a document is a near-dup when
  * ANY of its MinHash-LSH band buckets was already claimed by an
  * earlier document. State = one keeper docId per observed band bucket
  * (the streaming analogue of the batch LSH banding;
  * [[StreamDedup]] is the exact-hash counterpart). Bucket claims run as
  * keyed `flatMapGroupsWithState`; the per-document verdict is the min
  * over that document's band claims.
  *
  * On a static frame the verdict equals the batch window semantics —
  * keeper(d) = min over bands b of min(docId) over d's (b, bucket) —
  * which the driver oracle (q_stream_neardup) recomputes in SQL. In a
  * live stream the trailing per-doc aggregation runs in update mode or
  * inside foreachBatch (micro-batch-local docs), exactly like the
  * incremental indexer's sink.
  */
object StreamNearDedup {

  final case class BandRec(docId: Long, bucket: String)
  final case class BucketClaim(docId: Long, bucketMin: Long)

  /** Keyed bucket-claim state: the first document carrying a band
    * bucket claims it; every arrival emits the bucket's keeper.
    * Within a micro-batch the smallest docId wins first (sorted), so a
    * single static batch reproduces min-over-bucket exactly.
    */
  def bucketClaims(banded: Dataset[BandRec],
                   ttl: Option[java.time.Duration] = None): Dataset[BucketClaim] = {
    val spark = banded.sparkSession
    import spark.implicits._
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded.groupByKey(_.bucket)
      .flatMapGroupsWithState[Long, BucketClaim](OutputMode.Append, timeout) {
        (_: String, rows: Iterator[BandRec], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toArray.sortBy(_.docId)
            batch.iterator.map { r =>
              if (!state.exists) {
                state.update(r.docId)
                ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
                BucketClaim(r.docId, r.docId)
              } else {
                // an out-of-order SMALLER docId takes over keepership —
                // without the state update, docIds between it and the
                // stale larger claimant would emit min(stale, id) = id
                // and escape detection entirely
                val m = math.min(state.get, r.docId)
                if (m < state.get) state.update(m)
                BucketClaim(r.docId, m)
              }
            }
          }
      }
  }

  /** Static/batch entry: (docId, keeper, isDup) over the full banding.
    * keeper = smallest docId sharing ANY band bucket (itself when none).
    * Docs below the shingle width have no signature, band nowhere, and
    * are ABSENT from the output (they carry no content evidence — run
    * [[graft.pipeline.TextPipeline.exactDedup]] alongside for them).
    */
  def neardupStream(docs: DataFrame, idCol: String, contentCol: String,
                    numHashes: Int = 4, bands: Int = 2,
                    shingleK: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = TextPipeline.minhash(docs, idCol, contentCol, numHashes, shingleK)
    val banded = TextPipeline
      .minhashBands(sigs, idCol, numHashes, bands)
      // band id folds into the bucket key so state shards by (band, sig)
      .select(col("id").cast("long").as("docId"),
        concat_ws("#", col("band"), col("bucket")).as("bucket"))
      .as[BandRec]
    bucketClaims(banded)
      .groupBy("docId")
      .agg(min(col("bucketMin")).as("keeper"))
      .select(col("docId"), col("keeper"),
        (col("keeper") < col("docId")).cast("int").as("isDup"))
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.analysis.Analyzer
import graft.index.CorpusStats

/** TREC-KBA-style streaming filter: standing entity queries scored by
  * BM25 against a time-ordered document stream, keeping docs above a
  * cutoff (reference: kba/FilterThread.cc, kba/StreamThread.cc,
  * kba/BM25Scorer.cc:6-64).
  *
  * Score (reference: BM25Scorer.cc computeNormalizedDocScore):
  *   Σ_t∈query idf(t) · tf / (tf + k1(1−b) + (dl/avgdl)·k1·b)
  * with k1=1.75, b=0.75 (reference: BM25Scorer.cc:6), okapi idf from a
  * FIXED background statistics snapshot (totalDocs, avgDocSize, per-term
  * df — the KBA TermStat/CorpusStat maps), OOV query terms skipped
  * (reference: BM25Scorer.cc out_of_range catch).
  *
  * The transform is stateless row-wise, so the same function serves a
  * static DataFrame and a readStream micro-batch (Structured Streaming).
  */
object StreamFilter {

  final case class StandingQuery(qid: String, text: String)

  /** (docId, qid, score) for every doc×query pair with score ≥ cutoff. */
  def score(
      docs: DataFrame,
      queries: Seq[StandingQuery],
      stats: CorpusStats,          // background snapshot
      termDf: Map[String, Long],   // background df per term
      analyzer: Analyzer,
      cutoff: Double = 0.0,
      k1: Double = 1.75,
      b: Double = 0.75,
      idCol: String = "docId",
      contentCol: String = "content"
  ): DataFrame = {
    val n = stats.totalDocs.toDouble
    val avgdl = stats.avgDocLength
    // per-query processed terms with idf; OOV (df absent) terms dropped
    val prepared: Array[(String, Array[(String, Double)])] = queries.map { q =>
      val terms = q.text.split("\\s+").toSeq
        .flatMap(t => Option(analyzer.processTerm(t)))
        .flatMap { t =>
          termDf.get(t).map { df =>
            t -> math.log((n - df + 0.5) / (df + 0.5))
          }
        }
      q.qid -> terms.toArray
    }.toArray
    val k1OneMinusB = k1 * (1 - b)
    val k1b = k1 * b
    val az = analyzer

    val scoreUdf = udf { (content: String) =>
      val slots = az.analyze(content)
      val dl = slots.length
      val tf = new scala.collection.mutable.HashMap[String, Int]()
      var i = 0
      while (i < dl) {
        val t = slots(i)
        if (t != null) tf.update(t, tf.getOrElse(t, 0) + 1)
        i += 1
      }
      val denomFactor = k1OneMinusB + (dl / avgdl) * k1b
      prepared.map { case (qid, terms) =>
        var s = 0.0
        var j = 0
        while (j < terms.length) {
          val (t, idf) = terms(j)
          val f = tf.getOrElse(t, 0)
          if (f > 0) s += idf * (f.toDouble / (f + denomFactor))
          j += 1
        }
        (qid, s)
      }.toSeq
    }

    docs
      .withColumn("qs", explode(scoreUdf(col(contentCol))))
      .select(col(idCol), col("qs._1").as("qid"), col("qs._2").as("score"))
      .where(col("score") >= cutoff)
  }
}

package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RM1/RM3 pseudo-relevance feedback
  * (reference: src/RelevanceModel.cpp, src/RMExpander.cpp:26-75,
  * src/QueryExpander.cpp:102-140).
  *
  * Pipeline (unigram grams, maxGrams=1 as in RMExpander):
  *  1. top fbDocs results of the original query;
  *  2. log→posterior: w_d = exp(s_d − max) / Σ exp(s_i − max)
  *     (reference: RelevanceModel.cpp `_logtoposterior`);
  *  3. gram weight p(t) = Σ_d w_d · tf(t,d)/doclen(d) — the unsmoothed
  *     `occurrences / contextLength` branch (reference:
  *     RelevanceModel.cpp:224-232, fbMu=0 default);
  *  4. stopped slots (termID 0) and non-alphanumeric stems skipped
  *     (reference: RelevanceModel.cpp:119-131, isValidWord :84-97);
  *  5. top fbTerms by weight (desc; term asc tiebreak added for
  *     determinism — the reference's std::sort leaves ties unspecified);
  *  6. expanded query #weight(w #combine(orig) (1−w) #weight(p1 "t1" …))
  *     (reference: QueryExpander.cpp:111-137).
  *
  * Scale: the only driver-side data are the fbDocs (docId, score) rows
  * and the fbTerms (term, weight) rows; gram scoring runs distributed
  * over the postings of just the feedback docs.
  */
object RelevanceModel {

  final case class Params(fbDocs: Int = 10, fbTerms: Int = 10,
                          fbOrigWeight: Double = 0.5)

  /** log scores → normalized posteriors, max-shifted for stability
    * (reference: RelevanceModel.cpp `_logtoposterior`)
    */
  def posterior(results: Seq[(Long, Double)]): Seq[(Long, Double)] = {
    if (results.isEmpty) return Nil
    // shift by the true max (identical to head._2 for the usual
    // score-descending input, safe for any caller of rm1FromResults —
    // shifting by a non-max makes exp() overflow on large log scores)
    val k = results.map(_._2).max
    val exps = results.map { case (d, s) => (d, math.exp(s - k)) }
    val sum = exps.map(_._2).sum
    exps.map { case (d, e) => (d, e / sum) }
  }

  /** RM1 term distribution from the top fbDocs of `query`.
    * Returns (term, weight) sorted weight desc, term asc.
    */
  def rm1(engine: Engine, query: String, p: Params = Params()): DataFrame = {
    val spark = engine.spark
    val top = engine.runQuery(query, p.fbDocs)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    rm1FromResults(engine, top, p)
  }

  def rm1FromResults(engine: Engine, top: Seq[(Long, Double)], p: Params): DataFrame = {
    val spark = engine.spark
    import spark.implicits._
    if (top.isEmpty)
      return Seq.empty[(String, Double)].toDF("term", "weight")
    val w = posterior(top).toMap
    val bcW = spark.sparkContext.broadcast(w)
    val wUdf = udf { (docId: Long) => bcW.value(docId) }
    engine.index.postings
      .where(col("docId").isin(w.keys.toSeq: _*))
      .where(col("term").rlike("^[a-zA-Z0-9]+$")) // isValidWord
      .select(col("term"),
        (wUdf(col("docId")) * col("tf").cast(DoubleType) / col("doclen")).as("ws"))
      .groupBy("term").agg(sum(col("ws")).as("weight"))
      .where(col("weight") > 0.0)
      .orderBy(col("weight").desc, col("term").asc)
      .limit(p.fbTerms)
  }

  /** the RM3 expanded query string (reference: QueryExpander.cpp:111-137) */
  def expandedQuery(original: String, probs: Seq[(String, Double)], p: Params): String = {
    if (probs.isEmpty) return original
    val inner = probs.map { case (t, pw) => s"$pw \"$t\"" }.mkString(" ")
    s"#weight( ${p.fbOrigWeight} #combine( $original ) ${1.0 - p.fbOrigWeight} #weight( $inner ) )"
  }

  /** run original → expand → run expanded
    * (reference: QueryExpander::runExpandedQuery)
    */
  def runRm3(engine: Engine, query: String, k: Int, p: Params = Params()): DataFrame = {
    val probs = rm1(engine, query, p).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    engine.runQuery(expandedQuery(query, probs, p), k)
  }

  /** Per-term clarity contributions: for each of the top fbTerms RM1
    * grams, p(w|Q) = gram weight, p(w) = ctf(w)/|C| (the RM uses stemmed
    * terms, so collection stats come from the stem's dictionary row),
    * contribution = p(w|Q)·log₂(p(w|Q)/p(w))
    * (reference: clarity/clarity.cpp:66-85,104-112).
    *
    * Driver cost: the fbTerms (term, weight) rows + ONE dictionary stats
    * probe for those terms — nothing corpus-sized reaches the driver.
    */
  def clarityTerms(engine: Engine, query: String, p: Params = Params()): Seq[(String, Double, Double)] = {
    val grams = rm1(engine, query, p).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    if (grams.isEmpty) return Nil
    val tstats = engine.termStatsFor(grams.map(_._1))
    val tt = engine.termCount().toDouble
    grams.map { case (t, pwq) =>
      val pw = tstats.get(t).map(_.ctf.toDouble).getOrElse(0.0) / tt
      (t, pwq, pwq * math.log(pwq / pw) / math.log(2.0))
    }
  }

  /** Query clarity score (Cronen-Townsend et al., "Predicting Query
    * Performance", SIGIR'02): KL divergence in bits of the truncated RM1
    * relevance model vs the collection LM, normalized by the retained
    * probability mass — query-clarity = Σ_w p(w|Q)·log(p(w|Q)/p(w)) /
    * Σ_w p(w|Q) / log 2 (reference: clarity/clarity.cpp:64-85 `clarity`).
    */
  def clarity(engine: Engine, query: String, p: Params = Params()): Double = {
    val rows = clarityTerms(engine, query, p)
    val sum = rows.map(_._2).sum
    val lnPr = rows.map(_._3).sum // already in bits
    lnPr / (if (sum != 0.0) sum else 1.0)
  }
}

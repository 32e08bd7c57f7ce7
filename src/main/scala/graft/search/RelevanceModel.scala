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
    engine.index.postingsView()
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

  // ------------------------------------------------------------------
  // n-gram relevance models (the rmodel application surface)
  // ------------------------------------------------------------------

  /** rmodel/clarity-shaped RM configuration (reference:
    * rmodel/rmodel.cpp:109-121, clarity/clarity.cpp:139-151):
    * `documents` feedback docs, grams of 1..`maxGrams` words, optional
    * smoothing rule — when set, gram scores are
    * exp(scoreOccurrence(occ, doclen)) under that rule with the gram's
    * COLLECTION frequency as background (reference:
    * src/RelevanceModel.cpp:182-232); when empty, the plain
    * occurrences/contextLength branch (the rmodel app always passes "").
    */
  final case class GramParams(documents: Int = 10, maxGrams: Int = 1,
                              smoothing: Option[ScoringRule] = None)

  /** the reference's isValidWord: every char alphanumeric
    * (src/RelevanceModel.cpp:84-97, C locale → ASCII)
    */
  private def isValidWord(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')))
        return false
      i += 1
    }
    s.nonEmpty
  }

  /** Consecutive-position n-gram counts over the docs' forward vectors:
    * one row per (docId, gram) with gram = space-joined stems, n ∈
    * [1, maxGrams]. A gram is valid iff all constituent stems are
    * alphanumeric AND the positions are consecutive — a stopped (null)
    * slot or invalid stem breaks every longer gram through it, exactly
    * the reference's OOV break (src/RelevanceModel.cpp:100-157: a gram
    * containing positions[k]==0 or !isValidWord is skipped, and larger
    * n-grams starting at the same point break out).
    *
    * `onlyGrams`, when set, counts just those grams (broadcast probe set —
    * the background-statistics pass over the full corpus stays one scan
    * with bounded output instead of shuffling every corpus gram).
    */
  private[graft] def gramCounts(engine: Engine, ids: DataFrame, maxGrams: Int,
                                onlyGrams: Option[Set[String]] = None): DataFrame = {
    val spark = engine.spark
    import spark.implicits._
    val probe = onlyGrams.map(spark.sparkContext.broadcast(_))
    engine.documentVectors(ids)
      .select(col("docId"), col("pos").cast(IntegerType), col("term"))
      .as[(Long, Int, String)]
      .groupByKey(_._1)
      .flatMapGroups { (doc: Long, it: Iterator[(Long, Int, String)]) =>
        val toks = it.map(r => (r._2, r._3)).toArray.sortInPlaceBy(_._1)
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        val keep = probe.map(_.value)
        var i = 0
        while (i < toks.length) {
          if (isValidWord(toks(i)._2)) {
            val sb = new java.lang.StringBuilder(toks(i)._2)
            var n = 1
            var ok = true
            while (n <= maxGrams && ok) {
              if (n > 1) {
                val j = i + n - 1
                // strictly increasing positions: the last-slot check
                // implies every intermediate slot is present too
                ok = j < toks.length && toks(j)._1 == toks(i)._1 + (n - 1) &&
                  isValidWord(toks(j)._2)
                if (ok) sb.append(' ').append(toks(j)._2)
              }
              if (ok) {
                val g = sb.toString
                if (keep.forall(_.contains(g)))
                  counts.update(g, counts.getOrElse(g, 0L) + 1L)
              }
              n += 1
            }
          }
          i += 1
        }
        counts.iterator.map { case (g, c) => (doc, g, c) }
      }.toDF("docId", "gram", "count")
  }

  /** n-gram relevance model from the top `documents` results of `query`
    * (the rmodel application core — reference: rmodel/rmodel.cpp,
    * src/RelevanceModel.cpp generate/_countGrams/_scoreGrams).
    * Returns (gram, n, weight) sorted weight desc, gram asc.
    */
  def gramModel(engine: Engine, query: String, p: GramParams): DataFrame = {
    val top = engine.runQuery(query, p.documents)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    gramModelFromResults(engine, top, p)
  }

  def gramModelFromResults(engine: Engine, top: Seq[(Long, Double)],
                           p: GramParams): DataFrame = {
    val spark = engine.spark
    import spark.implicits._
    if (top.isEmpty)
      return Seq.empty[(String, Int, Double)].toDF("gram", "n", "weight")
    val post = posterior(top)
    val ids = post.map(_._1).toDF("docId")
    val counts = gramCounts(engine, ids, p.maxGrams)
      .withColumn("n", (size(split(col("gram"), " "))).cast(IntegerType))
    val postDf = post.toDF("docId", "w")
    p.smoothing match {
      case None =>
        // occurrences / contextLength, matching docs only (a zero
        // occurrence contributes zero) — reference RelevanceModel.cpp:228
        counts
          .join(broadcast(postDf), Seq("docId"))
          .join(engine.index.doclens, Seq("docId"))
          .select(col("gram"), col("n"),
            (col("w") * col("count").cast(DoubleType) / col("length")).as("ws"))
          .groupBy("gram", "n").agg(sum(col("ws")).as("weight"))
          .where(col("weight") > 0.0)
          .orderBy(col("weight").desc, col("gram").asc)
      case Some(rule) =>
        // smoothed: EVERY feedback doc contributes
        // exp(scoreOccurrence(occ, doclen)) — zero-occurrence docs add
        // background mass (reference: RelevanceModel.cpp:209-232; the
        // factory call passes documentOccurrences=0, documentCount=0,
        // :201 — LM rules ignore them, mirrored verbatim)
        val tt = engine.termCount().toDouble
        val candidates = counts.select("gram", "n").distinct()
        // background: unigrams from the dictionary (stemCount), longer
        // grams from ONE corpus pass counting just the candidate grams
        // (the reference runs an #1() query per gram, :195-203 — same
        // counts, one scan instead of G network evaluations)
        val uniBg = engine.index.dictionary
          .select(col("term").as("gram"), col("ctf").cast(DoubleType).as("bg"))
        val bg = if (p.maxGrams <= 1) uniBg else {
          val cand = candidates.where(col("n") > 1)
            .select("gram").as[String].collect().toSet
          val multiBg = gramCounts(engine,
            engine.index.doclens.select("docId"), p.maxGrams, Some(cand))
            .groupBy("gram").agg(sum("count").cast(DoubleType).as("bg"))
          uniBg.unionByName(multiBg)
        }
        // the feedback docs with posteriors and lengths (bounded rows)
        val docs = broadcast(postDf.join(engine.index.doclens, Seq("docId")))
        val scoreUdf = udf { (occ: Double, len: Int, bgCtf: Double) =>
          math.exp(Scorers.forTerm(rule, bgCtf, tt, 0, 0L)
            .scoreOccurrence(occ, len))
        }
        candidates
          .join(bg, Seq("gram"), "left").na.fill(0.0, Seq("bg"))
          .crossJoin(docs)
          .join(counts.select("docId", "gram", "count"), Seq("docId", "gram"), "left")
          .na.fill(0L, Seq("count"))
          .select(col("gram"), col("n"),
            (col("w") * scoreUdf(col("count").cast(DoubleType), col("length"),
              col("bg"))).as("ws"))
          .groupBy("gram", "n").agg(sum(col("ws")).as("weight"))
          .orderBy(col("weight").desc, col("gram").asc)
    }
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

package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Alternative pseudo-relevance-feedback expanders
  * (reference: src/PonteExpander.cpp, src/TFIDFExpander.cpp).
  * Both consume the top fbDocs of a first-round run and emit an
  * expanded query string; gram scoring runs distributed over the
  * feedback docs' postings, exactly like [[RelevanceModel]].
  */
object Expanders {

  import RelevanceModel.Params

  /** Ponte expansion (reference: src/PonteExpander.cpp:80-143):
    * for each term with tf ≥ 2 in a feedback doc,
    *   collection += log( (tf/dl) / (cf/colLen) )          [sort key]
    *   relevance  += exp(docScore) · dirichletProb(tf, dl)  [query weight]
    * with dirichletProb = (tf + μ·cf/colLen)/(dl + μ), μ = fbMu (0
    * default → tf/dl). Terms are sorted by the collection metric and the
    * top fbTerms keep their relevance weights in the RM-shaped
    * #weight(w #combine(orig) (1−w) #weight(…)) query.
    */
  def ponteTerms(engine: Engine, top: Seq[(Long, Double)], p: Params,
                 mu: Double = 0.0): DataFrame = {
    val spark = engine.spark
    import spark.implicits._
    if (top.isEmpty) return Seq.empty[(String, Double, Double)].toDF("term", "coll", "weight")
    val fb = top.take(p.fbDocs)
    val scoreMap = fb.toMap
    val bcScores = spark.sparkContext.broadcast(scoreMap)
    val colLen = engine.index.stats.totalTerms.toDouble
    val sUdf = udf { (d: Long) => math.exp(bcScores.value(d)) }
    engine.index.postingsView()
      .where(col("docId").isin(fb.map(_._1): _*) && col("tf") >= 2)
      .where(col("term").rlike("^[a-zA-Z0-9]+$"))
      .join(engine.index.dictionary.select(col("term"), col("ctf")), "term")
      .select(col("term"),
        log((col("tf").cast(DoubleType) / col("doclen")) /
            (col("ctf").cast(DoubleType) / colLen)).as("lo"),
        (sUdf(col("docId")) *
          ((col("tf").cast(DoubleType) + lit(mu) * col("ctf") / colLen) /
           (col("doclen").cast(DoubleType) + mu))).as("rel"))
      .groupBy("term")
      .agg(sum(col("lo")).as("coll"), sum(col("rel")).as("weight"))
      .orderBy(col("coll").desc, col("term").asc)
      .limit(p.fbTerms)
  }

  def ponteExpand(engine: Engine, query: String, k: Int,
                  p: Params = Params(), mu: Double = 0.0): String = {
    val top = engine.runQuery(query, math.max(k, p.fbDocs)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val probs = ponteTerms(engine, top, p, mu).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSeq
    RelevanceModel.expandedQuery(query, probs, p)
  }

  /** tf·idf expansion (reference: src/TFIDFExpander.cpp:100-241):
    * expansion weight(t) = fbOrigWeight/fbDocs · Σ_fbdocs BM25TF·idf with
    * BM25TF = k1·tf/(tf + k1(1−b+b·dl/avgdl)), idf = log((N+1)/(df+0.5));
    * original query terms carry idf·1000·qtf/(qtf+1000); overlapping
    * terms ADD; output is a flat #weight( w1 "t1" … ).
    */
  def tfidfTerms(engine: Engine, top: Seq[(Long, Double)], p: Params,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = engine.spark
    import spark.implicits._
    if (top.isEmpty) return Seq.empty[(String, Double)].toDF("term", "weight")
    val fb = top.take(p.fbDocs).map(_._1)
    val n = engine.index.stats.totalDocs.toDouble
    val avgdl = engine.index.stats.avgDocLength
    engine.index.postingsView()
      .where(col("docId").isin(fb: _*))
      .where(col("term").rlike("^[a-zA-Z0-9]+$"))
      .join(engine.index.dictionary.select(col("term"), col("df")), "term")
      .select(col("term"),
        ((lit(k1) * col("tf") /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b / avgdl) * col("doclen")))) *
         log(lit(n + 1) / (col("df") + 0.5))).as("sc"))
      .groupBy("term")
      .agg((sum(col("sc")) / fb.size * p.fbOrigWeight).as("weight"))
      .orderBy(col("weight").desc, col("term").asc)
      .limit(p.fbTerms)
  }

  def tfidfExpand(engine: Engine, query: String, k: Int,
                  p: Params = Params(), k1: Double = 1.2, b: Double = 0.75): String = {
    val top = engine.runQuery(query, math.max(k, p.fbDocs)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    tfidfExpandFromResults(engine, query, top, p, k1, b)
  }

  /** [[tfidfExpand]] over a GIVEN feedback set instead of a fresh
    * retrieval — the relFBDocs path (the reference feeds named docs to
    * the same expander as score-0 results, IndriRunQuery.cpp:385-395).
    */
  def tfidfExpandFromResults(engine: Engine, query: String,
                             top: Seq[(Long, Double)], p: Params = Params(),
                             k1: Double = 1.2, b: Double = 0.75): String = {
    val exp = tfidfTerms(engine, top, p, k1, b).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    // original query term weights: idf·1000·qtf/(qtf+1000)
    // (reference: TFIDFExpander.cpp:146-155, lemur queryK1 = 1000)
    val n = engine.index.stats.totalDocs.toDouble
    val qtfs = query.split("\\s+").toSeq
      .flatMap(t => Option(engine.analyzer.processTerm(t)))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toDouble }
    val dfs = engine.termStatsFor(qtfs.keys.toSeq)
    val orig = qtfs.flatMap { case (t, qtf) =>
      dfs.get(t).filter(_.df > 0).map { ts =>
        val idf = math.log((n + 1) / (ts.df + 0.5))
        t -> (idf * 1000.0 * qtf) / (qtf + 1000.0)
      }
    }
    // merge: overlapping terms add (reference: TFIDFExpander.cpp:196-204)
    val merged = (orig.toSeq ++ exp.toSeq).groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(_._2).sum }
      .toSeq.sortBy { case (t, w) => (-w, t) }
    merged.map { case (t, w) => s"$w \"$t\"" }
      .mkString("#weight( ", " ", " )")
  }
}

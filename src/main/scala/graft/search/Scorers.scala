package graft.search

/** Term score functions — exact ports of the reference formulas with the
  * SAME factored arithmetic so doubles match bit-for-bit
  * (reference: include/indri/TFIDFTermScoreFunction.hpp:44-60,92-128;
  * src/TermScoreFunctionFactory.cpp:42-106;
  * include/indri/DirichletTermScoreFunction.hpp:37-47;
  * include/indri/JelinekMercerTermScoreFunction.hpp:40-76).
  */
trait TermScoreFunction extends Serializable {
  /** score of `occurrences` in a context of length `contextSize`
    * (= document length for whole-doc scoring).
    */
  def scoreOccurrence(occurrences: Double, contextSize: Int): Double
  /** the reference's 4-argument form, invoked by the LIST belief path
    * (windows, field/context restrictions — everything that is not a
    * plain frequency-list term): `occurrences` counted within the
    * scored context of length `contextSize`, plus the containing
    * document's raw occurrence count and length for the
    * document-level smoothing components
    * (reference: src/ListBeliefNode.cpp:119-127 always calls this form;
    * the frequency-list path for plain terms calls the 2-arg form,
    * src/TermFrequencyBeliefNode.cpp). The default delegates to the
    * 2-arg form exactly like TFIDFTermScoreFunction
    * (reference: include/indri/TFIDFTermScoreFunction.hpp:132-134).
    */
  def scoreOccurrence(occurrences: Double, contextSize: Int,
                      documentOccurrences: Double, documentLength: Int): Double =
    scoreOccurrence(occurrences, contextSize)
  /** upper bound used by max-score/block-max pruning
    * (reference: src/TermFrequencyBeliefNode.cpp:105-135).
    */
  def maximumScore(minimumDocumentLength: Int, maximumOccurrences: Int): Double =
    scoreOccurrence(maximumOccurrences.toDouble, minimumDocumentLength)
}

/** Okapi BM25 / lemur tfidf
  * (reference: include/indri/TFIDFTermScoreFunction.hpp:92-128).
  *
  * okapi idf = log((N − df + 0.5)/(df + 0.5)); tfidf idf = log((N + 1)/(df + 0.5))
  * (reference: src/TermScoreFunctionFactory.cpp:81,94). avgdl global.
  */
final class TfIdfScoreFunction(
    idf: Double,
    averageDocumentLength: Double,
    termWeight: Double,
    k1: Double,
    b: Double,
    okapi: Boolean
) extends TermScoreFunction {
  // precomputed constants, same factoring as _precomputeConstants
  // (reference: include/indri/TFIDFTermScoreFunction.hpp:53-60)
  private val idfTimesK1PlusOne = idf * (k1 + 1)
  private val k1TimesOneMinusB = k1 * (1 - b)
  private val bOverAvgDocLength = b / averageDocumentLength
  private val k1TimesBOverAvgDocLength = k1 * bOverAvgDocLength
  private val termWeightTimesIDFTimesK1 = termWeight * idf * k1
  private val termWeightTimesidfTimesK1PlusOne = termWeight * idfTimesK1PlusOne

  def scoreOccurrence(occurrences: Double, documentLength: Int): Double = {
    if (okapi) {
      val numerator = termWeightTimesidfTimesK1PlusOne * occurrences
      val denominator = occurrences + k1TimesOneMinusB + k1TimesBOverAvgDocLength * documentLength
      numerator / denominator
    } else {
      val numerator = termWeightTimesIDFTimesK1 * occurrences
      val denominator = occurrences + k1TimesOneMinusB + k1TimesBOverAvgDocLength * documentLength
      numerator / denominator
    }
  }
}

/** Dirichlet (reference: include/indri/DirichletTermScoreFunction.hpp:37-47).
  * Default μ = 2500 (reference: src/TermScoreFunctionFactory.cpp:57).
  */
final class DirichletScoreFunction(
    mu: Double,
    collectionFrequency: Double,
    docmu: Double = -1.0
) extends TermScoreFunction {
  private val muTimesCollectionFrequency = mu * collectionFrequency
  def scoreOccurrence(occurrences: Double, contextSize: Int): Double = {
    val seen = (occurrences + muTimesCollectionFrequency) / (contextSize.toDouble + mu)
    math.log(seen)
  }
  /** two-level Dirichlet when `documentMu` ≥ 0: the extent is smoothed
    * against the document LM, which is itself Dirichlet-smoothed against
    * the collection (reference: include/indri/DirichletTermScoreFunction
    * .hpp:49-65; docmu default −1 = collection-level smoothing only).
    */
  override def scoreOccurrence(occurrences: Double, contextSize: Int,
                               documentOccurrences: Double, documentLength: Int): Double =
    if (docmu < 0) scoreOccurrence(occurrences, contextSize)
    else {
      val seen = (occurrences + docmu * (muTimesCollectionFrequency + documentOccurrences) /
        (documentLength.toDouble + mu)) / (contextSize.toDouble + docmu)
      math.log(seen)
    }
}

/** Jelinek-Mercer (reference: include/indri/JelinekMercerTermScoreFunction.hpp:40-76).
  * Defaults collectionLambda = 0.4, documentLambda = 0.0
  * (reference: src/TermScoreFunctionFactory.cpp:62-68).
  */
final class JelinekMercerScoreFunction(
    collectionFrequency: Double,
    collectionLambda: Double,
    documentLambda: Double = 0.0
) extends TermScoreFunction {
  private val foregroundLambda = 1 - collectionLambda
  private val contextLambda = 1 - collectionLambda - documentLambda
  private val collectionComponent = collectionLambda * collectionFrequency
  def scoreOccurrence(occurrences: Double, contextSize: Int): Double = {
    val contextFrequency = if (contextSize != 0) occurrences / contextSize.toDouble else 0.0
    math.log(foregroundLambda * contextFrequency + collectionComponent)
  }
  /** list-belief form with the document-level mixture component
    * (reference: include/indri/JelinekMercerTermScoreFunction.hpp:67-71;
    * with documentLambda = 0 this equals the 2-arg form).
    */
  override def scoreOccurrence(occurrences: Double, contextSize: Int,
                               documentOccurrences: Double, documentLength: Int): Double = {
    val contextFrequency = if (contextSize != 0) occurrences / contextSize.toDouble else 0.0
    val documentFrequency =
      if (documentLength != 0) documentOccurrences / documentLength.toDouble else 0.0
    math.log(contextLambda * contextFrequency + documentLambda * documentFrequency +
      collectionComponent)
  }
}

/** Two-stage smoothing: Dirichlet inner, JM outer
  * (reference: include/indri/TwoStageTermScoreFunction.hpp; defaults
  * μ = 2500, λ = 0.4, src/TermScoreFunctionFactory.cpp:72-77).
  */
final class TwoStageScoreFunction(
    mu: Double,
    lambda: Double,
    collectionFrequency: Double
) extends TermScoreFunction {
  private val muTimesCollectionFrequency = mu * collectionFrequency
  def scoreOccurrence(occurrences: Double, contextSize: Int): Double = {
    val dirichlet = (occurrences + muTimesCollectionFrequency) / (contextSize.toDouble + mu)
    math.log((1 - lambda) * dirichlet + lambda * collectionFrequency)
  }
  /** list-belief form: the Dirichlet prior over the scored context comes
    * from the DOCUMENT's empirical frequency, not the collection
    * (reference: include/indri/TwoStageTermScoreFunction.hpp:60-65 —
    * documentFrequency = docOcc/docLen with no zero guard; at document
    * level docOcc == occurrences and docLen == contextSize).
    */
  override def scoreOccurrence(occurrences: Double, contextSize: Int,
                               documentOccurrences: Double, documentLength: Int): Double = {
    val documentFrequency = documentOccurrences / documentLength.toDouble
    val dirichlet = (occurrences + mu * documentFrequency) / (contextSize.toDouble + mu)
    math.log((1 - lambda) * dirichlet + lambda * collectionFrequency)
  }
}

/** Scoring-rule spec, the analogue of the reference's
  * `method:okapi,k1:1.2,...` rule strings
  * (reference: src/TermScoreFunctionFactory.cpp:28-40).
  */
final case class ScoringRule(
    method: String = "okapi",
    k1: Double = 1.2,
    b: Double = 0.75,
    k3: Double = 7.0,
    mu: Double = 2500.0,
    lambda: Double = 0.4,
    documentLambda: Double = 0.0,
    documentMu: Double = -1.0
)

object ScoringRule {
  /** parse "method:okapi,k1:1.2" rule strings */
  def parse(spec: String): ScoringRule = {
    // tolerant like the reference factory: a colon-less component turns
    // into a garbage key no getter ever reads (termscorefunctionfactory_
    // parse never raises — the 'method:jm,lambda,0.5' comma-tail quirk),
    // so skip it rather than crash on the destructuring split
    val kv = spec.split(",").iterator.map(_.trim)
      .filter(t => t.nonEmpty && t.contains(':')).map { p =>
        val Array(k, v) = p.split(":", 2)
        k.trim -> v.trim
      }.toMap
    val base = ScoringRule(method = kv.getOrElse("method", "dirichlet"))
    base.copy(
      k1 = kv.get("k1").map(_.toDouble).getOrElse(base.k1),
      b = kv.get("b").map(_.toDouble).getOrElse(base.b),
      k3 = kv.get("k3").map(_.toDouble).getOrElse(base.k3),
      mu = kv.get("mu").map(_.toDouble).getOrElse(base.mu),
      lambda = kv.get("lambda").orElse(kv.get("collectionLambda")).map(_.toDouble).getOrElse(base.lambda),
      documentLambda = kv.get("documentLambda").map(_.toDouble).getOrElse(base.documentLambda),
      documentMu = kv.get("documentMu").map(_.toDouble).getOrElse(base.documentMu)
    )
  }
}

object Scorers {

  /** Okapi query-term weight (k3+1)·qtf/(k3+qtf)
    * (reference: include/indri/TFIDFTermScoreFunction.hpp:140-143).
    */
  def okapiQueryTermWeight(k3: Double, qtf: Double): Double =
    ((k3 + 1) * qtf) / (k3 + qtf)

  /** Build a score function for one term from global statistics, exactly
    * like the factory (reference: src/TermScoreFunctionFactory.cpp:42-106).
    *
    * @param occurrences ctf of the term (global)
    * @param contextSize total term count (global)
    * @param documentOccurrences df of the term (global)
    * @param documentCount N (global)
    * @param qtf query term frequency (for okapi/tfidf weight)
    */
  def forTerm(rule: ScoringRule, occurrences: Double, contextSize0: Double,
              documentOccurrences: Double, documentCount: Long,
              qtf: Int = 1, qtw: Option[Double] = None): TermScoreFunction = {
    val contextSize = if (contextSize0 == 0) 1.0 else contextSize0
    val collectionFrequency =
      if (occurrences != 0) occurrences / contextSize else 1.0 / (contextSize * 2.0)
    rule.method match {
      case "okapi" =>
        val idf = math.log((documentCount - documentOccurrences + 0.5) / (documentOccurrences + 0.5))
        val avgDocLength = contextSize / documentCount.toDouble
        // _termWeight = queryTermWeight(1000, 0, qTF) / qTF, then each of
        // the qTF duplicate query nodes adds the same score — we multiply
        // back by qtf at combine time via the duplicate-expansion in the
        // engine (reference: TFIDFTermScoreFunction.hpp:70-73)
        val tw = qtw.getOrElse(okapiQueryTermWeight(rule.k3, qtf.toDouble) / qtf)
        new TfIdfScoreFunction(idf, avgDocLength, tw, rule.k1, rule.b, okapi = true)
      case "tfidf" =>
        val idf = math.log((documentCount + 1) / (documentOccurrences + 0.5))
        val avgDocLength = contextSize / documentCount.toDouble
        val tw = qtw.getOrElse {
          // queryTermWeight(1000, 0, qTF)/qTF for the non-okapi branch
          // (reference: TFIDFTermScoreFunction.hpp:144-148)
          ((idf * 1000.0 * qtf.toDouble) / (qtf.toDouble + 1000.0)) / qtf
        }
        new TfIdfScoreFunction(idf, avgDocLength, tw, rule.k1, rule.b, okapi = false)
      case "dirichlet" | "d" | "dir" =>
        new DirichletScoreFunction(rule.mu, collectionFrequency, rule.documentMu)
      case "linear" | "jm" | "jelinek-mercer" =>
        new JelinekMercerScoreFunction(collectionFrequency, rule.lambda, rule.documentLambda)
      case "two" | "two-stage" | "twostage" =>
        new TwoStageScoreFunction(rule.mu, rule.lambda, collectionFrequency)
      case _ =>
        new DirichletScoreFunction(2500.0, collectionFrequency)
    }
  }
}

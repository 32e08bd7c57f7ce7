package graft.search

/** Query reformulation: plain keyword queries → Metzler-Croft
  * sequential/full dependence-model structured queries, plus the stop
  * structure / lite-stop query cleaning that precedes them
  * (reference: src/ReformulateQuery.cpp, include/indri/ReformulateQuery.hpp:60-70,
  * driven by QueryEnvironment::reformulateQuery,
  * src/QueryEnvironment.cpp:1410-1418, and the reformulate app,
  * reformulate/ReformulateQuery.cpp:44).
  *
  * Every operator the generators emit (#weight, #combine, #wsum, #1,
  * #uwN, qualified terms) already exists in [[Engine]] — this is a verb,
  * not a new operator. One surface divergence: field-restricted terms
  * are emitted as `t.f` (the grammar form this parser implements) rather
  * than the reference's equivalent `t.(f)` spelling.
  */
object Reformulate {

  /** field + weight for the weighted-field SDM/FDM variants; the weight
    * stays a string exactly as in the reference (it is pasted into the
    * query text, reference: ReformulateQuery.hpp weighted_field)
    */
  final case class WeightedField(field: String, weight: String)

  /** knobs mirroring the reference's Parameters defaults
    * (reference: src/ReformulateQuery.cpp:147-150,322-328)
    */
  final case class Params(
      weightT: String = "0.85",
      weightO: String = "0.1",
      weightU: String = "0.05",
      stopStructures: Boolean = true,
      liteStop: Boolean = true,
      fields: Seq[WeightedField] = Nil,
      // CMU-FDM mixture knobs (reference: src/ReformulateQuery.cpp:177-186)
      mixtureWeight: String = "1.0",
      dependencyWeight: String = "1.0",
      fieldWeights: Map[String, String] = Map.empty)

  sealed trait Mode
  case object GenCombine extends Mode
  case object GenSDM extends Mode
  case object GenFDM extends Mode
  case object GenCMUFDM extends Mode

  // ------------------------------------------------------------------
  // query cleaning
  // ------------------------------------------------------------------

  /** liteStop word list (reference: src/QueryStopper.cpp — 39
    * initialized entries; the remaining array slots are empty strings,
    * which only ever match the empty tokens split() drops anyway)
    */
  private val LiteStopWords: Set[String] = Set(
    "a", "about", "am", "an", "and", "are", "as", "at", "be",
    "been", "being", "by", "did", "do", "does", "doing", "done", "for",
    "from", "had", "have", "has", "he", "in", "if", "is", "it", "its",
    "of", "on", "or", "that", "th", "the", "to", "was", "were", "will",
    "with")

  /** verbose question prefixes, checked IN ORDER, first match stripped
    * once — the list mirrors src/StopStructureRemover.cpp:14-268
    * VERBATIM, including its quirks: a few longer variants (e.g.
    * "…opinions about ") are listed AFTER their own prefix and are
    * therefore unreachable, exactly as in the reference
    */
  private val StopStructures: Seq[String] = Seq(
    "you ever had ", "why do i ", "why do we ", "why is there ",
    "why will not ", "why will ", "why does ", "why can ", "why are ",
    "why did ", "why should ", "why is ", "why do people think ",
    "why do ", "why ", "with what is ", "where can i find stuff about ",
    "where can i ", "where can we ", "where can ", "where are ",
    "when was ", "when is ", "when did ", "when are ", "when ",
    "what are some experiences people ",
    "what are some people s experiences ",
    "what are some people s opinions ",
    "what are some people s opinions about ",
    "what are people s opinions on ", "what are people s opinions ",
    "what are people s opinions about ", "what are people s saying about ",
    "what are people saying about ", "what are the people saying about ",
    "what are people saying ", "what will happen ",
    "what would happen if ", "what causes ", "what can be done about ",
    "what can be done ", "what happens ", "what makes ",
    "what do people say about ", "what do people say ",
    "what do people think about ", "what do people think ", "what do ",
    "what is the ", "what is ", "what are the effects ", "what are the ",
    "what are ", "was the ", "true or false a ", "theres a ", "the ",
    "tell me which is ", "tell me stuff about ",
    "still hoping to find a ", "some info about ", "should we be ",
    "should ", "recommend ", "please name 5 ", "please name ",
    "please explain in detail about ", "please compare ",
    "need to find a ", "name of the five ", "names of ", "name the ",
    "name a ", "my wife wants to know ", "my wife has ",
    "my mother has ", "my mom has ", "my husband wants to get a ",
    "my girlfriend is fed up of my ", "my boyfriend has ",
    "my best friend came down with ", "looking for info on an ",
    "looking for a ", "list ", "know any good ", "ive heard that ",
    "is the ", "information on how to ", "information about the ",
    "information about ", "in your opinion what would be the ",
    "in which ", "in what ", "in the ",
    "in simple terms could some please tell me what ",
    "im looking for an ", "im looking for a ", "im looking for ",
    "im also interested to ", "im 21 and am having ", "im ",
    "if you have ", "if the ", "if some is ", "if it is true that ",
    "if i am having a ", "i would like to know the ",
    "i would like information about ", "i was just told i have a ",
    "i want to understand the ", "i want to try ",
    "i want to know what your ", "i want to know the meaning of ",
    "i want to know something about ",
    "i want to know if there is any ", "i want to know everything about ",
    "i want to know a little about ", "i want to be ",
    "i want details of ", "i want ", "i read that ",
    "i need to know the ", "i need to find information on ",
    "i need to find an ", "i need to devise a ", "i need to ",
    "i need the correct spelling of ",
    "i need some technical information about how a ",
    "i need information on ", "i need as many ", "i need a list of ",
    "i need a ", "i heard that ", "i have taken ",
    "i have just been told my aunt has a ", "i cant seem to ",
    "i am trying to find an ", "how can we have ", "how can we ",
    "how much of ", "how did ", "how much ", "how would ",
    "how does one ", "how does ", "how do people think ", "how do i ",
    "how are the ", "how are ", "how is ", "how ",
    "hi im trying to find some ", "help me with my ",
    "help im freaked out i might have ", "give me information on a ",
    "give me information on ", "give me a ", "give me ",
    "give a brief explanation ", "give 5 examples of ", "give ",
    "for a year ive been getting some ", "finish the sentence ",
    "find comments about ", "find the ", "find me ", "find a ",
    "discuss the ", "describe ", "define ", "could you please tell me ",
    "could you briefly explain about ", "could someone explain the ",
    "could a ", "could ", "compare the ", "compare ",
    "can you think of a ", "can you tell me about the ",
    "can you point me the ", "can you please give me an example of a ",
    "can you please give ", "can you please ", "can you name 1 ",
    "can you list ", "can you be ", "can we ", "can u watch ",
    "can u find for me the website about ", "can the ",
    "can someone tell me how can i ", "can someone please explain about ",
    "can someone please describe what ", "can someone help me with my ",
    "can i use ", "can i know ", "can i have ", "can i get ", "can i ",
    "can anyone tell me what is ", "can anyone tell me what ",
    "can anyone tell me more about ", "can anyone suggest a good ",
    "can anyone say what is ", "can anyone help with ",
    "can anyone give me info on ", "can any one help me out with a ",
    "can any body suggest me ", "can a ", "can ", "at what ",
    "are there ", "anywhere to get a ", "anyone want to ",
    "anyone out there have ", "anyone know where i can ",
    "anyone know what to use for ", "anyone know of a ", "anyone know ",
    "anyone here know what the ", "anyone heard any news of ",
    "anyone have any ", "anyone have a ", "anyone have ",
    "anyone had a ", "anyone familiar with the ",
    "anyone ever heard of the ", "anyone ever ", "anybody know of ",
    "any tips for ", "any opinions on ", "any advice on how to heal a ",
    "do ", "does ", "what ", "did ", "who is ", "who ", "is ", "has ",
    "were ", "will ", "should ", "which ", "have ")

  /** strip the first matching verbose-question prefix (one removal) */
  def removeStopStructures(query: String): String = {
    StopStructures.find(query.startsWith).map(p => query.drop(p.length))
      .getOrElse(query)
  }

  /** drop lite stopwords (space-delimited tokens) */
  def liteStop(query: String): String =
    query.split(' ').filter(t => t.nonEmpty && !LiteStopWords(t)).mkString(" ")

  /** punctuation → space (reference: ReformulateQuery::makeIndriFriendly
    * — note the reference's sentinel is the character 'e', so 'e' itself
    * is never stripped; everything before it in the list is)
    */
  def makeIndriFriendly(query: String): String = {
    val forbidden = "`~!@#$%^&*()-_=+[]{}\\|;:'\",.<>/?"
    query.map(c => if (forbidden.indexOf(c.toInt) >= 0) ' ' else c)
  }

  private def split(q: String): Seq[String] =
    q.split(' ').toSeq.filter(_.nonEmpty)

  // ------------------------------------------------------------------
  // generators
  // ------------------------------------------------------------------

  /** a term (or window expression) restricted+weighted over fields:
    * #wsum( w1 x.f1 w2 x.f2 ... ) — the reference wraps window
    * expressions the same way with `.(f)` (our parser applies the
    * restriction through [[FieldRestrictNode]] identically)
    */
  /** All generator strings below are BYTE-IDENTICAL to the reference's
    * string building — including its whitespace quirks (trailing spaces
    * before closing parens, embedded newlines in the weighted-field
    * forms, the double space in the single-term CMU dependency) and the
    * `.(field)` CONTEXT-restriction qualifier the weighted-field
    * variants emit (which the query parser now evaluates with the
    * reference's context-scoring semantics).
    */

  /** SDM: #weight(wT #combine(terms) wO #combine(adjacent #1 pairs)
    * wU #combine(adjacent #uw8 pairs)); each pair piece carries the
    * reference's trailing space
    * (reference: ReformulateQuery::generateSDMQuery, src/ReformulateQuery.cpp:144-165)
    */
  def sdm(terms: Seq[String], p: Params = Params()): String = {
    require(terms.nonEmpty, "empty query")
    if (terms.size == 1) return s"#combine(${terms.head})"
    val t = terms.mkString(" ")
    val ow = terms.sliding(2).map(pr => s"#1(${pr(0)} ${pr(1)}) ").mkString
    val uw = terms.sliding(2).map(pr => s"#uw8(${pr(0)} ${pr(1)}) ").mkString
    s"#weight( ${p.weightT} #combine($t) ${p.weightO} #combine($ow) ${p.weightU} #combine($uw))"
  }

  /** weighted-field SDM — per-unit `#wsum( w x.(f) … )` with the
    * reference's ` )\n ` / ` )\n` tails
    * (reference: src/ReformulateQuery.cpp:103-142)
    */
  def sdmFields(terms: Seq[String], fields: Seq[WeightedField],
                p: Params = Params()): String = {
    if (fields.isEmpty) return sdm(terms, p)
    require(terms.nonEmpty, "empty query")
    if (terms.size == 1) return s"#combine(${terms.head})"
    def wsum(x: String): String =
      fields.map(f => s"${f.weight} $x.(${f.field}) ").mkString("#wsum( ", "", "")
    val qT = terms.map(t => wsum(t) + " )\n ").mkString
    val qO = terms.sliding(2)
      .map(pr => wsum(s"#1(${pr(0)} ${pr(1)})") + " )\n").mkString
    val qU = terms.sliding(2)
      .map(pr => wsum(s"#uw8(${pr(0)} ${pr(1)})") + " )\n").mkString
    s"#weight( ${p.weightT} #combine($qT) ${p.weightO} #combine($qO) ${p.weightU} #combine($qU))"
  }

  /** contiguous spans [start..end], len ≥ 2, in the reference's loop
    * order (reference: src/ReformulateQuery.cpp:241-243,284-287)
    */
  private def fdmSpans(terms: Seq[String]): Seq[Seq[String]] = for {
    start <- terms.indices.dropRight(1)
    end <- (start + 1) until terms.size
  } yield terms.slice(start, end + 1)

  /** FDM: every contiguous span contributes #1(span) and #uw{4·len}
    * (span); the reference builds each span with a trailing space and a
    * newline after each window
    * (reference: ReformulateQuery::generateFDMQuery, src/ReformulateQuery.cpp:273-305)
    */
  def fdm(terms: Seq[String], p: Params = Params()): String = {
    require(terms.nonEmpty, "empty query")
    if (terms.size == 1) return s"#combine(${terms.head})"
    val t = terms.map(_ + " ").mkString
    val spans = fdmSpans(terms)
    val ow = spans.map(s => "#1(" + s.map(_ + " ").mkString + ")\n").mkString
    val uw = spans.map(s => s"#uw${4 * s.size}(" + s.map(_ + " ").mkString + ")\n").mkString
    s"#weight( ${p.weightT} #combine($t) ${p.weightO} #combine($ow) ${p.weightU} #combine($uw))"
  }

  /** weighted-field FDM (reference: src/ReformulateQuery.cpp:225-266) */
  def fdmFields(terms: Seq[String], fields: Seq[WeightedField],
                p: Params = Params()): String = {
    if (fields.isEmpty) return fdm(terms, p)
    require(terms.nonEmpty, "empty query")
    if (terms.size == 1) return s"#combine(${terms.head})"
    def wsum(x: String): String =
      fields.map(f => s"${f.weight} $x.(${f.field}) ").mkString("#wsum( ", "", "")
    val qT = terms.map(t => wsum(t) + " )\n ").mkString
    val spans = fdmSpans(terms)
    val qO = spans
      .map(s => wsum("#1(" + s.map(_ + " ").mkString + ")") + " )\n").mkString
    val qU = spans
      .map(s => wsum(s"#uw${4 * s.size}(" + s.map(_ + " ").mkString + ")") + " )\n")
      .mkString
    s"#weight( ${p.weightT} #combine($qT) ${p.weightO} #combine($qO) ${p.weightU} #combine($qU))"
  }

  /** CMU web-style FDM: per-term six-field #wsum mixture + FDM
    * dependency model, mixed by #weight; the mixture uses `#wsum (`
    * and ` #combine ( ` with the reference's exact spacing, and the
    * single-term dependency branch keeps its double space
    * (reference: ReformulateQuery::generateCMUFDMQuery, src/ReformulateQuery.cpp:171-221)
    */
  def cmuFdm(terms: Seq[String],
             mixtureWeight: String = "1.0", dependencyWeight: String = "1.0",
             fieldWeights: Map[String, String] = Map.empty,
             p: Params = Params()): String = {
    require(terms.nonEmpty, "empty query")
    def w(f: String) = fieldWeights.getOrElse(f, "1.0")
    val mixture = " #combine ( " + terms.map { tok =>
      "#wsum (" +
        Seq("url", "title", "body", "meta", "alt").map(f => s"${w(f)} $tok.($f) ").mkString +
        s"${w("inlink")} $tok.(inlink)" + ") "
    }.mkString + " ) "
    val dep =
      if (terms.size < 2) {
        val q = terms.head
        s" #weight  ( ${p.weightT} $q ${p.weightO} #1($q) ${p.weightU} #uw4($q) ) "
      } else fdm(terms, p)
    s"#weight( $mixtureWeight$mixture$dependencyWeight $dep )"
  }

  /** #combine over the terms (the non-SDM default,
    * reference: ReformulateQuery::generateCombineQuery)
    */
  def combine(terms: Seq[String]): String =
    s"#combine( ${terms.mkString(" ")} )"

  /** full transform: downcase → stop structures → lite stop → generate
    * (reference: ReformulateQuery::transform, src/ReformulateQuery.cpp:320-362;
    * an all-stopped query returns the reference's "EMPTYQUERY" marker)
    */
  def transform(queryText: String, mode: Mode = GenCombine,
                p: Params = Params()): String = {
    var q = queryText.toLowerCase
    if (p.stopStructures) q = removeStopStructures(q)
    if (p.liteStop) q = liteStop(q)
    if (q.isEmpty) return "EMPTYQUERY"
    val terms = split(q)
    mode match {
      case GenSDM => sdmFields(terms, p.fields, p)
      case GenFDM => fdmFields(terms, p.fields, p)
      case GenCMUFDM =>
        cmuFdm(terms, p.mixtureWeight, p.dependencyWeight, p.fieldWeights, p)
      case GenCombine => combine(terms)
    }
  }
}

package graft.search

/** AST for the Indri query-language subset
  * (reference: grammar src/indrilang.g:41-69,188-…;
  * AST include/indri/QuerySpec.hpp).
  */
sealed trait QueryNode

// ---- raw extent (match) operators ----
final case class TermNode(term: String) extends QueryNode
/** #odN(...) / #N(...) / "quoted phrase" (od1)
  * (reference: indrilang.g:397-416, src/OrderedWindowNode.cpp:111-166) */
final case class OdNode(window: Int, children: Seq[QueryNode]) extends QueryNode
/** #uwN(...) (reference: indrilang.g:418-434, src/UnorderedWindowNode.cpp:69-186) */
final case class UwNode(window: Int, children: Seq[QueryNode]) extends QueryNode
/** #band(...) (reference: indrilang.g:435-445, src/BooleanAndNode.cpp) */
final case class BandNode(children: Seq[QueryNode]) extends QueryNode
/** <a b> / {a b} / #syn(...) (reference: indrilang.g:744-771, src/ExtentOrNode.cpp) */
final case class SynNode(children: Seq[QueryNode]) extends QueryNode
/** #wsyn(w1 t1 ...) (reference: indrilang.g:384-395, src/WeightedExtentOrNode.cpp) */
final case class WsynNode(children: Seq[(Double, QueryNode)]) extends QueryNode
/** term* (reference: indrilang.g:639-649; cap 100 expansions,
  * include/indri/InferenceNetworkBuilder.hpp:64) */
final case class WildcardNode(prefix: String) extends QueryNode
/** t.f field restriction — extents of `child` contained in an extent of
  * `field` (reference: indrilang.g:690-743, src/ExtentInsideNode.cpp) */
final case class FieldRestrictNode(child: QueryNode, field: String) extends QueryNode
/** #any:f — every extent of field f (reference: indrilang.g:490-527,
  * FieldIteratorNode builder src/InferenceNetworkBuilder.cpp:135-150) */
final case class AnyFieldNode(field: String) extends QueryNode
/** path operators over the field-extent tree (reference: indrilang.g:
  * 713-743 — `a/b` child, `a//b` descendant, `a\b` parent; nodes
  * src/ExtentChildNode.cpp, ExtentDescendantNode, ExtentParentNode with
  * index-recorded {ordinal, parent} links). Engine syntax:
  * #child(a b) / #descendant(a b) / #parent(a b). op ∈ child|descendant|parent.
  * child: extents of a directly nested in a b extent; descendant: nested
  * at any depth; parent: extents of a that directly contain a b extent. */
final case class FieldPathNode(op: String, inner: String, outer: String) extends QueryNode
/** numeric/date predicates over field payloads
  * (reference: indrilang.g:1022-1074; src/FieldLessNode.cpp:41 x < c,
  * FieldGreaterNode x > c, FieldBetweenNode.cpp:42 low <= x <= high,
  * FieldEqualsNode x == c). op ∈ less|greater|between|equals. */
final case class FieldNumNode(op: String, field: String, lo: Long, hi: Long) extends QueryNode

// ---- belief (scoring) operators ----
final case class CombineNode(children: Seq[QueryNode]) extends QueryNode
final case class WeightNode(children: Seq[(Double, QueryNode)]) extends QueryNode
final case class WsumNode(children: Seq[(Double, QueryNode)]) extends QueryNode
final case class SumNode(children: Seq[QueryNode]) extends QueryNode
final case class OrQNode(children: Seq[QueryNode]) extends QueryNode
final case class NotQNode(child: QueryNode) extends QueryNode
final case class MaxQNode(children: Seq[QueryNode]) extends QueryNode
final case class FilReqNode(filter: QueryNode, scored: QueryNode) extends QueryNode
final case class FilRejNode(filter: QueryNode, scored: QueryNode) extends QueryNode
/** #prior(name) — stored per-doc log-prior (reference: builder
  * src/InferenceNetworkBuilder.cpp:788-795, src/PriorNode.cpp; built by
  * makeprior/makeprior.cpp) */
final case class PriorQNode(name: String) extends QueryNode
/** length prior: score += exponent·log(doclen) (reference:
  * src/LengthPriorNode.cpp, builder :1057-1073; engine-extension syntax
  * #lengthprior(exponent child) for what the reference wires via the
  * `lengthprior` parameter) */
final case class LengthPriorQNode(exponent: Double, child: QueryNode) extends QueryNode
/** #combine[f](…) / #combine[passageW:I](…) — score each extent of f
  * (or each fixed sliding passage) as its own context; results are
  * ranked EXTENTS (reference: indrilang.g:650-689; builder
  * src/InferenceNetworkBuilder.cpp:152-185; ExtentRestrictionNode,
  * FixedPassageNode). `passage` is (width, increment) when set. */
final case class ExtentRestrictNode(field: String, passage: Option[(Int, Int)],
                                    child: QueryNode) extends QueryNode

/** Recursive-descent parser for the implemented indrilang subset:
  * bare terms, quoted phrases, #combine #weight #wsum #sum #or #not #max
  * #band #odN #N #uwN #syn #wsyn <syn> {syn} #filreq #filrej #scoreif
  * #scoreifnot, wildcard `term*`.
  *
  * A bare multi-term query parses as #combine(t1 ... tk), matching
  * IndriRunQuery behavior.
  */
object QueryParser {

  def parse(query: String): QueryNode = {
    val toks = lex(query)
    val p = new Parser(toks)
    val nodes = p.parseSequence(stopAtClose = false)
    nodes match {
      case Seq(one) => one
      case many => CombineNode(many)
    }
  }

  /** The raw term leaves of a query, when every posting-reading leaf is
    * enumerable without the dictionary — None when a wildcard needs a
    * dictionary probe first. Lets stored-index inspectors decode only
    * the blocks an expression can touch.
    */
  def termLeaves(query: String): Option[Seq[String]] = {
    def walk(n: QueryNode): Option[Seq[String]] = n match {
      case TermNode(t) => Some(Seq(t))
      case WildcardNode(_) => None
      case AnyFieldNode(_) | FieldPathNode(_, _, _) | FieldNumNode(_, _, _, _) |
           PriorQNode(_) => Some(Nil) // extent/prior tables, not postings
      case OdNode(_, cs) => all(cs)
      case UwNode(_, cs) => all(cs)
      case BandNode(cs) => all(cs)
      case SynNode(cs) => all(cs)
      case WsynNode(cs) => all(cs.map(_._2))
      case CombineNode(cs) => all(cs)
      case WeightNode(cs) => all(cs.map(_._2))
      case WsumNode(cs) => all(cs.map(_._2))
      case SumNode(cs) => all(cs)
      case OrQNode(cs) => all(cs)
      case MaxQNode(cs) => all(cs)
      case NotQNode(c) => walk(c)
      case FieldRestrictNode(c, _) => walk(c)
      case FilReqNode(f, s) => all(Seq(f, s))
      case FilRejNode(f, s) => all(Seq(f, s))
      case LengthPriorQNode(_, c) => walk(c)
      case ExtentRestrictNode(_, _, c) => walk(c)
    }
    def all(cs: Seq[QueryNode]): Option[Seq[String]] =
      cs.foldLeft(Option(Seq.empty[String])) { (acc, c) =>
        for (a <- acc; b <- walk(c)) yield a ++ b
      }
    walk(parse(query)).map(_.distinct)
  }

  // ---- lexer ----
  private sealed trait Tok
  private case class Op(name: String, num: Option[Int]) extends Tok // #combine, #od3, #5
  private case class Word(w: String) extends Tok
  private case class Num(v: Double) extends Tok
  private case class Phrase(words: Seq[String]) extends Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object LAngle extends Tok
  private case object RAngle extends Tok
  private case object LBrace extends Tok
  private case object RBrace extends Tok

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else c match {
        case '(' => out += LParen; i += 1
        case ')' => out += RParen; i += 1
        case '<' => out += LAngle; i += 1
        case '>' => out += RAngle; i += 1
        case '{' => out += LBrace; i += 1
        case '}' => out += RBrace; i += 1
        case '"' =>
          val end = s.indexOf('"', i + 1)
          val inner = if (end < 0) s.substring(i + 1) else s.substring(i + 1, end)
          out += Phrase(inner.trim.split("\\s+").toSeq.filter(_.nonEmpty))
          i = if (end < 0) n else end + 1
        case '#' =>
          var j = i + 1
          while (j < n && (s.charAt(j).isLetter)) j += 1
          var name = s.substring(i + 1, j).toLowerCase
          var num: Option[Int] = None
          if (name.isEmpty || name == "od" || name == "uw") {
            var k2 = j
            while (k2 < n && s.charAt(k2).isDigit) k2 += 1
            if (k2 > j) { num = Some(s.substring(j, k2).toInt); j = k2 }
          }
          // `#any:field` (reference: indrilang.g:490-527)
          if (name == "any" && j < n && s.charAt(j) == ':') {
            var k2 = j + 1
            while (k2 < n && (s.charAt(k2).isLetterOrDigit)) k2 += 1
            name = "any:" + s.substring(j + 1, k2).toLowerCase
            j = k2
          }
          // extent restriction `#combine[f]` / `#combine[passageW:I]`
          // (reference: indrilang.g:650-689)
          if (j < n && s.charAt(j) == '[') {
            val close = s.indexOf(']', j + 1)
            if (close > j) {
              name = name + "[" + s.substring(j + 1, close).toLowerCase + "]"
              j = close + 1
            }
          }
          out += Op(if (name.isEmpty) "od" else name, num)
          i = j
        case _ =>
          var j = i
          while (j < n && !s.charAt(j).isWhitespace &&
                 !"()<>{}\"#".contains(s.charAt(j))) j += 1
          val w = s.substring(i, j)
          if (w.nonEmpty) {
            if (w.matches("-?\\d+(\\.\\d+)?")) out += Num(w.toDouble)
            else out += Word(w)
          }
          i = j
      }
    }
    out.result()
  }

  // ---- parser ----
  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def advance(): Tok = { val t = toks(pos); pos += 1; t }
    private def expect(t: Tok): Unit = {
      if (peek.contains(t)) pos += 1
      else throw new IllegalArgumentException(s"expected $t at $pos in $toks")
    }

    def parseSequence(stopAtClose: Boolean): Seq[QueryNode] = {
      val out = Seq.newBuilder[QueryNode]
      var done = false
      while (!done && pos < toks.length) {
        peek match {
          case Some(RParen) | Some(RAngle) | Some(RBrace) if stopAtClose => done = true
          case Some(_) => out += parseNode()
          case None => done = true
        }
      }
      out.result()
    }

    /** weighted child list: w1 q1 w2 q2 ... */
    private def parseWeighted(): Seq[(Double, QueryNode)] = {
      val out = Seq.newBuilder[(Double, QueryNode)]
      var done = false
      while (!done) {
        peek match {
          case Some(Num(w)) =>
            advance()
            out += ((w, parseNode()))
          case Some(RParen) | None => done = true
          case Some(other) =>
            throw new IllegalArgumentException(s"expected weight before child, got $other")
        }
      }
      out.result()
    }

    def parseNode(): QueryNode = {
      advance() match {
        case Word(w) =>
          if (w.endsWith("*") && w.length > 1) WildcardNode(w.dropRight(1))
          else {
            // qualifiedTerm t.f (reference: indrilang.g:690-743); the
            // field name must be alphanumeric — other dots stay in the
            // term (the analyzer strips them, e.g. acronyms "u.s.a.")
            val dot = w.lastIndexOf('.')
            if (dot > 0 && dot < w.length - 1 &&
                w.substring(dot + 1).forall(_.isLetterOrDigit) &&
                w.substring(dot + 1).exists(_.isLetter))
              FieldRestrictNode(TermNode(w.substring(0, dot)), w.substring(dot + 1).toLowerCase)
            else TermNode(w)
          }
        case Num(v) =>
          // a bare number in term position is a term (e.g. query "42")
          TermNode(if (v == v.toLong) v.toLong.toString else v.toString)
        case Phrase(ws) =>
          if (ws.length == 1) TermNode(ws.head) else OdNode(1, ws.map(TermNode(_)))
        case LAngle =>
          val kids = parseSequence(stopAtClose = true); expect(RAngle); SynNode(kids)
        case LBrace =>
          val kids = parseSequence(stopAtClose = true); expect(RBrace); SynNode(kids)
        case Op(name, _) if name.startsWith("any:") =>
          AnyFieldNode(name.stripPrefix("any:"))
        case Op(name, _) if name.contains("[") && name.endsWith("]") =>
          val base = name.substring(0, name.indexOf('['))
          val spec = name.substring(name.indexOf('[') + 1, name.length - 1)
          require(base == "combine", s"extent restriction only on #combine, got #$base")
          expect(LParen)
          val kids = parseSequence(stopAtClose = true)
          expect(RParen)
          val child = if (kids.length == 1) kids.head else CombineNode(kids)
          if (spec.startsWith("passage")) {
            // passageW:I (reference: FixedPassageNode)
            val Array(w, inc) = spec.stripPrefix("passage").split(":", 2)
            ExtentRestrictNode("", Some((w.toInt, inc.toInt)), child)
          } else ExtentRestrictNode(spec, None, child)
        case Op(name, num) =>
          expect(LParen)
          def fieldArg(): String = advance() match {
            case Word(f) => f.toLowerCase
            case other => throw new IllegalArgumentException(s"expected field name, got $other")
          }
          def numArg(): Long = advance() match {
            case Num(v) => v.toLong
            case Word(d) => // ISO date literal for the #date* forms
              java.time.LocalDate.parse(d.take(10)).toEpochDay
            case other => throw new IllegalArgumentException(s"expected number/date, got $other")
          }
          val node = name match {
            case "combine" => CombineNode(parseSequence(stopAtClose = true))
            case "weight" | "wand" => WeightNode(parseWeighted())
            case "wsum" => WsumNode(parseWeighted())
            case "sum" => SumNode(parseSequence(stopAtClose = true))
            case "or" => OrQNode(parseSequence(stopAtClose = true))
            case "not" => NotQNode(parseSequence(stopAtClose = true).head)
            case "max" => MaxQNode(parseSequence(stopAtClose = true))
            case "band" => BandNode(parseSequence(stopAtClose = true))
            case "od" => OdNode(num.getOrElse(1), parseSequence(stopAtClose = true))
            case "uw" => UwNode(num.getOrElse(8), parseSequence(stopAtClose = true))
            case "syn" => SynNode(parseSequence(stopAtClose = true))
            case "wsyn" => WsynNode(parseWeighted())
            case "filreq" | "scoreif" =>
              val kids = parseSequence(stopAtClose = true)
              require(kids.length == 2, s"#$name needs 2 args")
              FilReqNode(kids(0), kids(1))
            case "filrej" | "scoreifnot" =>
              val kids = parseSequence(stopAtClose = true)
              require(kids.length == 2, s"#$name needs 2 args")
              FilRejNode(kids(0), kids(1))
            case "any" => AnyFieldNode(fieldArg())
            case "child" => FieldPathNode("child", fieldArg(), fieldArg())
            case "descendant" => FieldPathNode("descendant", fieldArg(), fieldArg())
            case "parent" => FieldPathNode("parent", fieldArg(), fieldArg())
            case "prior" => PriorQNode(fieldArg())
            case "lengthprior" =>
              val exp = advance() match {
                case Num(v) => v
                case other => throw new IllegalArgumentException(s"expected exponent, got $other")
              }
              LengthPriorQNode(exp, parseNode())
            case "less" | "datebefore" =>
              val f = fieldArg(); FieldNumNode("less", f, Long.MinValue, numArg())
            case "greater" | "dateafter" =>
              val f = fieldArg(); FieldNumNode("greater", f, numArg(), Long.MaxValue)
            case "between" | "datebetween" =>
              val f = fieldArg(); FieldNumNode("between", f, numArg(), numArg())
            case "equals" | "dateequals" =>
              val f = fieldArg(); val v = numArg(); FieldNumNode("equals", f, v, v)
            case other =>
              throw new IllegalArgumentException(s"unsupported operator #$other")
          }
          expect(RParen)
          node
        case other =>
          throw new IllegalArgumentException(s"unexpected token $other")
      }
    }
  }

  /** Collect the raw term leaves in query order (duplicates preserved) —
    * the analogue of RawScorerNodeExtractor
    * (reference: src/QueryEnvironment.cpp:943-950).
    */
  def termLeaves(node: QueryNode): Seq[String] = node match {
    case TermNode(t) => Seq(t)
    case OdNode(_, cs) => cs.flatMap(termLeaves)
    case UwNode(_, cs) => cs.flatMap(termLeaves)
    case BandNode(cs) => cs.flatMap(termLeaves)
    case SynNode(cs) => cs.flatMap(termLeaves)
    case WsynNode(cs) => cs.flatMap(c => termLeaves(c._2))
    case WildcardNode(p) => Seq(p)
    case FieldRestrictNode(c, _) => termLeaves(c)
    case AnyFieldNode(_) => Nil
    case FieldNumNode(_, _, _, _) => Nil
    case FieldPathNode(_, _, _) => Nil
    case CombineNode(cs) => cs.flatMap(termLeaves)
    case WeightNode(cs) => cs.flatMap(c => termLeaves(c._2))
    case WsumNode(cs) => cs.flatMap(c => termLeaves(c._2))
    case SumNode(cs) => cs.flatMap(termLeaves)
    case OrQNode(cs) => cs.flatMap(termLeaves)
    case NotQNode(c) => termLeaves(c)
    case MaxQNode(cs) => cs.flatMap(termLeaves)
    case FilReqNode(f, s) => termLeaves(f) ++ termLeaves(s)
    case FilRejNode(f, s) => termLeaves(f) ++ termLeaves(s)
    case PriorQNode(_) => Nil
    case LengthPriorQNode(_, c) => termLeaves(c)
    case ExtentRestrictNode(_, _, c) => termLeaves(c)
  }
}

package graft.search

/** NEXI (Narrowed Extended XPath I) query parser — the CAS/CO subset of
  * the reference's NEXI grammar (reference: src/nexilang.g:151-440,
  * src/NexiParser.cpp; the INEX query language):
  *
  *  - CO (content-only): `t1 t2 …` → document ranking over the terms
  *    (reference: nexilang.g:215-224 termList branch);
  *  - CAS path: `//f[about(., t1 t2 …)]` → every extent of field f is
  *    scored as its own context and ranked (ExtentRestriction,
  *    nexilang.g:159-177);
  *  - nested path: `//a//b[about(., …)]` → extents of b nested inside an
  *    a extent (NestedExtentInside, nexilang.g:251-270);
  *  - boolean clause: `//f[filter and|or filter]` — the grammar's single
  *    optional logical combination (nexilang.g:312-334 `clause := filter
  *    (logical filter)?`): `and` → CombineNode over the per-filter
  *    beliefs inside the extent context, `or` → OrNode;
  *  - numeric predicate filter: `.//g < n` (also <=, =, >, >=) →
  *    FieldLess/Greater/Equals raw extents scored as an occurrence
  *    belief within the extent context (nexilang.g:395-440
  *    arithmeticClause → NestedRawScorerNode + MaxNode, shrinkage off);
  *  - relative about: `//a[about(.//s, …)]` → MaxNode over the
  *    ExtentRestriction-scored s extents inside each a extent
  *    (nexilang.g:370-390 aboutClause path branch);
  *  - two-level CAS: `//a[clause1]//b[clause2]` → ExtentEnforcement(
  *    ContextInclusion(clause1, preserve=ExtentRestriction(clause2, b)),
  *    a): every b extent nested in an a extent scores
  *    clause1-over-the-a-extent + clause2-over-the-b-extent
  *    (nexilang.g:180-206, src/ContextInclusionAndNode.cpp:223-261,
  *    src/ExtentEnforcementNode.cpp:48-80).
  *
  * Term prefixes: `+t` = t (mandatory markers are scoring hints the
  * reference also ignores); `-t` dropped (nexilang.g UNDASH terms carry
  * negative weight in the reference; the subset drops them and
  * documents it). Quoted phrases are split into their terms.
  *
  *  - parenthesized clause nesting: `//f[(c1 or c2) and c3]` → a binary
  *    and/or ClauseTree folded per node (and → CombineNode ½+½ mean of
  *    logs, or → OrNode; nexilang.g:312-363 filterParens). Leaves mix
  *    freely — about, relative about, and numeric predicates — exactly
  *    as the grammar's filter rule allows (round 4);
  *  - paths deeper than 2 fields: `//a//b//c[about(., …)]` → extents of
  *    the last field whose ancestor chain passes the path fields in
  *    order (chained NestedExtentInside, nexilang.g:251-270).
  *
  * Round 4: the grammar is COMPLETE — clauses at every position
  * (single-level and both brackets of the two-level form) accept any
  * mix of about / relative-about / numeric / parenthesized filters,
  * exactly the reference's `clause := filter (logical filter)?` with
  * `filter := about | arithmetic | '(' clause ')'`. Arithmetic values
  * are INT64 in the reference too (nexilang.g:523-529 number := NUMBER
  * — FLOAT only lexes as an index term in rawText).
  */
object NexiParser {

  /** Term leaf of an about() term list (reference: nexilang.g:439-454
    * term := unrestrictedTerm | PLUS unrestrictedTerm | MINUS
    * unrestrictedTerm; nexilang.g:456-480 unrestrictedTerm := rawText |
    * DBL_QUOTE odNode DBL_QUOTE): a quoted phrase is an ODNode (exact
    * adjacency) and a `-` term wraps in a NotNode — `+` is the identity
    * (the reference builds the same node for both branches).
    */
  sealed trait NexiTerm
  final case class PlainTerm(t: String) extends NexiTerm
  final case class PhraseTerm(ts: Seq[String]) extends NexiTerm
  final case class NotTerm(inner: NexiTerm) extends NexiTerm

  sealed trait NexiClause
  /** `about(., terms)` or `about(.//rel, terms)` */
  final case class AboutClause(rel: Option[String], leaves: Seq[NexiTerm]) extends NexiClause {
    /** plain positive terms (the legacy string surface; structured
      * leaves are invisible here — paths that only support plain terms
      * gate on [[NexiQuery.hasStructuredLeaves]])
      */
    def terms: Seq[String] = leaves.collect { case PlainTerm(t) => t }
  }
  /** `.//field op value` — op ∈ less|greater|equals with the reference's
    * inclusive rewrites already applied (<= n → less n+1, >= n → greater n−1)
    */
  final case class NumericClause(field: String, op: String, value: Long) extends NexiClause

  /** Parenthesized clause nesting (nexilang.g:312-363 — clause :=
    * filter (logical filter)?; filter := '(' clause ')' | about |
    * arith): the general form is a binary and/or tree over filters.
    * An unparenthesized `f1 and f2 and f3` chain folds LEFT-associative
    * — identical to the `(f1 and f2) and f3` the grammar would force.
    */
  sealed trait ClauseTree
  final case class ClauseLeaf(clause: NexiClause) extends ClauseTree
  final case class ClauseBool(op: String, left: ClauseTree, right: ClauseTree) extends ClauseTree

  /** path = field chain (outermost first; empty = CO query); clauses =
    * the filters (1 or 2, per the grammar); op = the logical connector
    * when two are present; inner = the second `//path[clause]` level
    */
  final case class NexiQuery(path: Seq[String], nexiClauses: Seq[NexiClause],
                             op: Option[String],
                             inner: Option[NexiQuery] = None,
                             tree: Option[ClauseTree] = None) {
    def terms: Seq[String] =
      nexiClauses.collect { case a: AboutClause => a.terms }.flatten ++
        inner.toSeq.flatMap(_.terms)
    /** plain term lists of the about clauses (legacy surface for tests) */
    def clauses: Seq[Seq[String]] =
      nexiClauses.collect { case a: AboutClause => a.terms }
    /** full leaf lists (phrases / negations included) */
    def leafGroups: Seq[Seq[NexiTerm]] =
      nexiClauses.collect { case AboutClause(_, ls) => ls }
    /** any phrase or negated leaf present (incl. the inner level)? */
    def hasStructuredLeaves: Boolean =
      (nexiClauses.collect { case AboutClause(_, ls) => ls }.flatten ++
        inner.toSeq.flatMap(_.nexiClauses.collect { case AboutClause(_, ls) => ls }.flatten))
        .exists(!_.isInstanceOf[PlainTerm])
    def relOf(i: Int): Option[String] = nexiClauses.lift(i) match {
      case Some(AboutClause(rel, _)) => rel
      case _ => None
    }
  }

  private val TwoLevel =
    """^(//[^\[\]]+)\[([^\]]*)\]\s*(//[^\[\]]+)\[([^\]]*)\]$""".r
  private val AboutRe =
    """(?i)^about\s*\(\s*\.(//[A-Za-z0-9_]+)?\s*,([^()]*)\)$""".r
  private val NumericRe =
    """^\.//([A-Za-z0-9_]+)\s*(<=|>=|<|>|=)\s*(\d+)$""".r

  def parse(query: String): NexiQuery = {
    val q = query.trim
    if (!q.startsWith("//")) {
      // CO query: plain term list
      return NexiQuery(Nil, Seq(AboutClause(None, termList(q))), None)
    }
    q match {
      case TwoLevel(p1, c1, p2, c2) =>
        return parseOne(p1, c1).copy(inner = Some(parseOne(p2, c2)))
      case _ =>
    }
    val open = q.indexOf('[')
    require(open > 0 && q.endsWith("]"), s"NEXI CAS query needs //path[about(…)]: $query")
    parseOne(q.substring(0, open), q.substring(open + 1, q.length - 1))
  }

  private def numeric(field: String, op: String, v: Long): NumericClause = op match {
    // the reference grammar's inclusive rewrites (nexilang.g:409-418):
    // <= n → FieldLessNode(n+1); >= n → FieldGreaterNode(n−1)
    case "<" => NumericClause(field, "less", v)
    case "<=" => NumericClause(field, "less", v + 1)
    case "=" => NumericClause(field, "equals", v)
    case ">" => NumericClause(field, "greater", v)
    case ">=" => NumericClause(field, "greater", v - 1)
  }

  private def parseFilter(s: String): NexiClause = s.trim match {
    // field names lowercase like every other field reference: the
    // Tokenizer lowercases tag names at index time and the extent match
    // is verbatim — a mixed-case CAS path would silently return nothing
    case AboutRe(rel, ts) =>
      AboutClause(Option(rel).map(_.stripPrefix("//")
        .toLowerCase(java.util.Locale.ROOT)), termList(ts))
    case NumericRe(f, op, v) =>
      numeric(f.toLowerCase(java.util.Locale.ROOT), op, v.toLong)
    case other => throw new IllegalArgumentException(
      s"unsupported NEXI filter (subset: about(., terms) | about(.//f, terms) | .//f op n): $other")
  }

  private def parseOne(pathStr: String, clause0: String): NexiQuery = {
    // filterParens (nexilang.g:360-363) is parseClauseTree's first step
    // (peelParens) — no need to peel here too
    val clause = clause0.trim
    val path = pathStr.split("//").toSeq.map(_.trim).filter(_.nonEmpty)
      .map(_.toLowerCase(java.util.Locale.ROOT)) // tags index lowercased
    require(path.nonEmpty && path.forall(_.matches("[a-z0-9_]+")),
      s"unsupported NEXI path: $pathStr")
    parseClauseTree(clause) match {
      case ClauseLeaf(f) =>
        NexiQuery(path, Seq(f), None)
      case ClauseBool(c, ClauseLeaf(f1), ClauseLeaf(f2)) =>
        // the grammar's single optional connector — the flat form;
        // relative abouts are allowed as either filter (round 4:
        // nexilang.g:312-334 puts no restriction on the filter kinds)
        NexiQuery(path, Seq(f1, f2), Some(c))
      case t =>
        // parenthesized nesting: leaves in in-order, folded by the tree
        // (round 4: the grammar's filter rule puts no restriction on the
        // leaf kinds — about/relative-about/arithmetic mix freely at any
        // depth, nexilang.g:312-363)
        NexiQuery(path, treeLeaves(t), None, tree = Some(t))
    }
  }

  def treeLeaves(t: ClauseTree): Seq[NexiClause] = t match {
    case ClauseLeaf(c) => Seq(c)
    case ClauseBool(_, l, r) => treeLeaves(l) ++ treeLeaves(r)
  }

  /** split `s` at top-level (paren-depth-0) `and`/`or` word boundaries —
    * about()'s own parens and nested clause parens raise the depth, so
    * connectors inside them never split
    */
  private def splitTopLevel(s: String): (Seq[String], Seq[String]) = {
    val parts = Seq.newBuilder[String]
    val ops = Seq.newBuilder[String]
    val lower = s.toLowerCase
    var depth = 0; var start = 0; var i = 0
    var n = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // word characters INCLUDE '_' (field names are [A-Za-z0-9_]+, so
      // 'q_and_a' must not split at its embedded 'and'), and a PRECEDING
      // '/' or '.' means the match is a path step ('.//and > 5' — a
      // field literally named and/or), never a connector
      def wordChar(ch: Char) = ch.isLetterOrDigit || ch == '_'
      if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (depth == 0 &&
               (i == 0 || (!wordChar(s.charAt(i - 1)) &&
                           s.charAt(i - 1) != '/' && s.charAt(i - 1) != '.')) &&
               (lower.startsWith("and", i) || lower.startsWith("or", i))) {
        val len = if (lower.startsWith("and", i)) 3 else 2
        if (i + len >= s.length || !wordChar(s.charAt(i + len))) {
          parts += s.substring(start, i).trim
          ops += lower.substring(i, i + len)
          n += 1
          i += len; start = i
        } else i += 1
      } else i += 1
    }
    parts += s.substring(start).trim
    (parts.result(), ops.result())
  }

  /** balanced-outer-paren peel (filterParens, nexilang.g:360-363) */
  private def peelParens(s0: String): String = {
    var s = s0.trim
    while (s.startsWith("(") && s.endsWith(")") && {
      var depth = 0; var minInner = Int.MaxValue
      s.substring(1, s.length - 1).foreach {
        case '(' => depth += 1
        case ')' => depth -= 1; minInner = math.min(minInner, depth)
        case _ =>
      }
      depth == 0 && (minInner == Int.MaxValue || minInner >= 0)
    }) s = s.substring(1, s.length - 1).trim
    s
  }

  private def parseClauseTree(s0: String): ClauseTree = {
    val s = peelParens(s0)
    val (parts, ops) = splitTopLevel(s)
    if (parts.length == 1) {
      // a single part of a peeled, trimmed string IS the string itself
      ClauseLeaf(parseFilter(parts.head))
    } else {
      require(parts.forall(_.nonEmpty),
        s"dangling and/or in NEXI clause: $s0")
      // left-assoc fold pairing each op with the next part
      parts.tail.map(parseClauseTree)
        .zip(ops)
        .foldLeft(parseClauseTree(parts.head)) {
          case (acc, (rhs, op)) => ClauseBool(op, acc, rhs)
        }
    }
  }

  /** structured term list: `+t` = t, `-t`/`-"a b"` → NotTerm,
    * `"a b"` → PhraseTerm (single-word quotes collapse to PlainTerm)
    */
  private val LeafRe = """([+-]?)(?:"([^"]*)"|(\S+))""".r

  private def termList(s: String): Seq[NexiTerm] =
    LeafRe.findAllMatchIn(s.trim).flatMap { m =>
      val sign = m.group(1)
      val inner: Option[NexiTerm] = Option(m.group(2)) match {
        case Some(q) => // quoted phrase
          val ws = q.trim.split("\\s+").toSeq.filter(_.nonEmpty)
          if (ws.isEmpty) None
          else if (ws.size == 1) Some(PlainTerm(ws.head))
          else Some(PhraseTerm(ws))
        case None =>
          Some(m.group(3)).filter(_.nonEmpty).map(PlainTerm)
      }
      if (sign == "-") inner.map(NotTerm) else inner
    }.toSeq
}

package graft.search

/** NEXI (Narrowed Extended XPath I) query parser — the CAS/CO subset of
  * the reference's NEXI grammar (reference: src/nexilang.g:151-270,
  * src/NexiParser.cpp; the INEX query language):
  *
  *  - CO (content-only): `t1 t2 …` → document ranking over the terms
  *    (reference: nexilang.g:215-224 termList branch);
  *  - CAS path: `//f[about(., t1 t2 …)]` → every extent of field f is
  *    scored as its own context and ranked (ExtentRestriction,
  *    nexilang.g:159-177);
  *  - nested path: `//a//b[about(., …)]` → extents of b nested inside an
  *    a extent (NestedExtentInside, nexilang.g:251-270);
  *  - boolean clause: `//f[about(., …) and|or about(., …)]` — the
  *    grammar's single optional logical combination (nexilang.g:312-334
  *    `clause := filter (logical filter)?`): `and` → CombineNode over
  *    the two about-scored beliefs inside the extent context, `or` →
  *    OrNode;
  *  - relative about: `//a[about(.//s, …)]` → MaxNode over the
  *    ExtentRestriction-scored s extents inside each a extent
  *    (nexilang.g:370-390 aboutClause path branch — the about's
  *    path+field become the restriction, wrapped in MaxNode);
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
  * Out of subset (throws): numeric predicates, parenthesized clause
  * nesting, relative about combined with boolean clauses.
  */
object NexiParser {

  /** path = field chain (outermost first; empty = CO query);
    * clauses = one term list per about(); op = the logical connector
    * when two clauses are present ("and" | "or"); inner = the second
    * `//path[clause]` level of the two-level CAS form
    */
  final case class NexiQuery(path: Seq[String], clauses: Seq[Seq[String]],
                             op: Option[String],
                             inner: Option[NexiQuery] = None,
                             clauseRel: Seq[Option[String]] = Nil) {
    def terms: Seq[String] = clauses.flatten ++ inner.toSeq.flatMap(_.terms)
    /** relative-path field of clause i (None = plain `about(., …)`) */
    def relOf(i: Int): Option[String] = clauseRel.lift(i).flatten
  }

  private val TwoLevel =
    """^(//[^\[\]]+)\[([^\]]*)\]\s*(//[^\[\]]+)\[([^\]]*)\]$""".r

  def parse(query: String): NexiQuery = {
    val q = query.trim
    if (!q.startsWith("//")) {
      // CO query: plain term list
      return NexiQuery(Nil, Seq(termList(q)), None)
    }
    q match {
      case TwoLevel(p1, c1, p2, c2) =>
        return parseOne(p1, c1, query).copy(inner = Some(parseOne(p2, c2, query)))
      case _ =>
    }
    val open = q.indexOf('[')
    require(open > 0 && q.endsWith("]"), s"NEXI CAS query needs //path[about(…)]: $query")
    val pathStr = q.substring(0, open)
    val clause = q.substring(open + 1, q.length - 1).trim
    parseOne(pathStr, clause, query)
  }

  private def parseOne(pathStr: String, clause0: String, query: String): NexiQuery = {
    val clause = clause0.trim
    val path = pathStr.split("//").toSeq.map(_.trim).filter(_.nonEmpty)
    require(path.nonEmpty && path.forall(_.matches("[A-Za-z0-9_]+")),
      s"unsupported NEXI path: $pathStr")
    val about = "(?i)about\\s*\\(\\s*\\.(//[A-Za-z0-9_]+)?\\s*,([^()]*)\\)".r
    val abouts = about.findAllMatchIn(clause).toSeq
    require(abouts.nonEmpty, s"unsupported NEXI clause (subset: about(., terms)): $clause")
    // everything outside the about() spans must be empty (one clause) or
    // exactly one and/or connector (two clauses — the grammar's maximum)
    val outside = {
      val sb = new StringBuilder
      var last = 0
      abouts.foreach { m => sb.append(clause.substring(last, m.start)); last = m.end }
      sb.append(clause.substring(last))
      sb.toString.trim.toLowerCase
    }
    def relOf(m: scala.util.matching.Regex.Match): Option[String] =
      Option(m.group(1)).map(_.stripPrefix("//"))
    (abouts.size, outside) match {
      case (1, "") =>
        NexiQuery(path, Seq(termList(abouts.head.group(2))), None,
          clauseRel = Seq(relOf(abouts.head)))
      case (2, "and") | (2, "or") =>
        require(abouts.forall(m => relOf(m).isEmpty),
          s"relative about paths combine only as a sole clause in this subset: $clause")
        NexiQuery(path, abouts.map(m => termList(m.group(2))), Some(outside))
      case _ => throw new IllegalArgumentException(
        s"unsupported NEXI clause (subset: about(., terms) with one optional and/or): $clause")
    }
  }

  private def termList(s: String): Seq[String] =
    s.replace("\"", " ").trim.split("\\s+").toSeq.filter(_.nonEmpty)
      .filterNot(_.startsWith("-"))           // negated terms dropped
      .map(t => if (t.startsWith("+")) t.substring(1) else t)
      .filter(_.nonEmpty)
}

package graft.search

/** NEXI (Narrowed Extended XPath I) query parser — the CAS/CO subset of
  * the reference's NEXI grammar (reference: src/nexilang.g:151-240,
  * src/NexiParser.cpp; the INEX query language):
  *
  *  - CO (content-only): `t1 t2 …` → document ranking over the terms
  *    (reference: nexilang.g:215-224 termList branch);
  *  - CAS path: `//f[about(., t1 t2 …)]` → every extent of field f is
  *    scored as its own context and ranked (ExtentRestriction,
  *    nexilang.g:159-177);
  *  - nested path: `//a//b[about(., …)]` → extents of b nested inside an
  *    a extent (NestedExtentInside, nexilang.g:251-270).
  *
  * Term prefixes: `+t` = t (mandatory markers are scoring hints the
  * reference also ignores); `-t` dropped (nexilang.g UNDASH terms carry
  * negative weight in the reference; the subset drops them and
  * documents it). Quoted phrases are split into their terms.
  *
  * Out of subset (throws): multi-clause boolean combinations
  * (`and`/`or` between abouts), relative about paths (`about(.//s, …)`),
  * numeric predicates, the two-level `//a[about]//b[about]` CAS form.
  */
object NexiParser {

  /** path = field chain (outermost first; empty = CO query) */
  final case class NexiQuery(path: Seq[String], terms: Seq[String])

  def parse(query: String): NexiQuery = {
    val q = query.trim
    if (!q.startsWith("//")) {
      // CO query: plain term list
      return NexiQuery(Nil, termList(q))
    }
    val open = q.indexOf('[')
    require(open > 0 && q.endsWith("]"), s"NEXI CAS query needs //path[about(…)]: $query")
    val pathStr = q.substring(0, open)
    val clause = q.substring(open + 1, q.length - 1).trim
    val path = pathStr.split("//").toSeq.map(_.trim).filter(_.nonEmpty)
    require(path.nonEmpty && path.forall(_.matches("[A-Za-z0-9_]+")),
      s"unsupported NEXI path: $pathStr")
    require(!clause.toLowerCase.matches(".*\\b(and|or)\\b.*"),
      s"multi-clause NEXI boolean combinations are outside the supported subset: $clause")
    val about = "(?i)about\\s*\\(\\s*\\.\\s*,(.*)\\)\\s*".r
    clause match {
      case about(ts) => NexiQuery(path, termList(ts))
      case _ => throw new IllegalArgumentException(
        s"unsupported NEXI clause (subset: about(., terms)): $clause")
    }
  }

  private def termList(s: String): Seq[String] =
    s.replace("\"", " ").trim.split("\\s+").toSeq.filter(_.nonEmpty)
      .filterNot(_.startsWith("-"))           // negated terms dropped
      .map(t => if (t.startsWith("+")) t.substring(1) else t)
      .filter(_.nonEmpty)
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search.NexiParser
import graft.search.NexiParser._

/** Round-trip property test for the NEXI clause grammar: random clause
  * trees over random leaf kinds (plain about with +/−/phrase terms,
  * relative about, numeric predicates) are rendered to query strings —
  * with randomized connector casing and spacing — and must parse back
  * to exactly the structure they were generated from (reference
  * grammar: src/nexilang.g:312-440 clause/filter/aboutClause/
  * arithmeticClause). Deterministic seeded generation, house style.
  */
class NexiParserPropertySpec extends AnyFunSuite {

  private final case class GenLeaf(rendered: String, clause: NexiClause)

  private def word(rng: scala.util.Random): String = {
    val n = 3 + rng.nextInt(5)
    val w = (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    // "and"/"or" are connector tokens in the grammar's lexer — a field
    // named "and" is ambiguous in the reference too; regenerate
    if (w == "and" || w == "or") word(rng) else w
  }

  private def genTerm(rng: scala.util.Random): (String, NexiTerm) =
    rng.nextInt(5) match {
      case 0 => val w = word(rng); (w, PlainTerm(w))
      case 1 => val w = word(rng); (s"+$w", PlainTerm(w))
      case 2 => val w = word(rng); (s"-$w", NotTerm(PlainTerm(w)))
      case 3 =>
        val ws = Seq.fill(2 + rng.nextInt(2))(word(rng))
        (s""""${ws.mkString(" ")}"""", PhraseTerm(ws))
      case _ =>
        val ws = Seq.fill(2)(word(rng))
        (s"""-"${ws.mkString(" ")}"""", NotTerm(PhraseTerm(ws)))
    }

  private def genLeaf(rng: scala.util.Random): GenLeaf = rng.nextInt(4) match {
    case 0 | 1 => // plain about, 1-3 structured terms
      val ts = Seq.fill(1 + rng.nextInt(3))(genTerm(rng))
      GenLeaf(s"about(., ${ts.map(_._1).mkString(" ")})",
        AboutClause(None, ts.map(_._2)))
    case 2 => // relative about
      val f = word(rng)
      val ts = Seq.fill(1 + rng.nextInt(2))(genTerm(rng))
      GenLeaf(s"about(.//$f, ${ts.map(_._1).mkString(" ")})",
        AboutClause(Some(f), ts.map(_._2)))
    case _ => // numeric predicate (strict ops — no inclusive rewrite)
      val f = word(rng); val v = 1L + rng.nextInt(999)
      rng.nextInt(3) match {
        case 0 => GenLeaf(s".//$f < $v", NumericClause(f, "less", v))
        case 1 => GenLeaf(s".//$f = $v", NumericClause(f, "equals", v))
        case _ => GenLeaf(s".//$f > $v", NumericClause(f, "greater", v))
      }
  }

  /** random binary tree of depth ≤ depth; children of a Bool node are
    * ALWAYS parenthesized when non-leaf (the canonical unambiguous
    * rendering the grammar's filterParens rule produces)
    */
  private def genTree(rng: scala.util.Random, depth: Int): (String, ClauseTree) =
    if (depth == 0 || rng.nextInt(3) == 0) {
      val l = genLeaf(rng)
      (l.rendered, ClauseLeaf(l.clause))
    } else {
      val (ls, lt) = genTree(rng, depth - 1)
      val (rs, rt) = genTree(rng, depth - 1)
      val op = if (rng.nextBoolean()) "and" else "or"
      val opR = op.map(c => if (rng.nextBoolean()) c.toUpper else c).mkString
      def wrap(s: String, t: ClauseTree) = t match {
        case _: ClauseLeaf => s
        case _ => s"($s)"
      }
      val pad = if (rng.nextBoolean()) " " else "  "
      (s"${wrap(ls, lt)}$pad$opR$pad${wrap(rs, rt)}", ClauseBool(op, lt, rt))
    }

  test("random clause trees render → parse → identical structure (500 cases)") {
    val rng = new scala.util.Random(20260817L)
    (0 until 500).foreach { i =>
      val (clause, expected) = genTree(rng, 3)
      val q = s"//sec[$clause]"
      val parsed = NexiParser.parse(q)
      assert(parsed.path == Seq("sec"), s"case $i: $q")
      expected match {
        case ClauseLeaf(c) =>
          assert(parsed.nexiClauses == Seq(c) && parsed.tree.isEmpty
            && parsed.op.isEmpty, s"case $i: $q → $parsed")
        case ClauseBool(op, l: ClauseLeaf, r: ClauseLeaf) =>
          // the grammar's flat two-filter form: no tree, just the pair
          assert(parsed.nexiClauses == Seq(l.clause, r.clause)
            && parsed.op.contains(op) && parsed.tree.isEmpty,
            s"case $i: $q → $parsed")
        case t =>
          assert(parsed.tree.contains(t), s"case $i: $q → ${parsed.tree}")
          assert(parsed.nexiClauses == NexiParser.treeLeaves(t),
            s"case $i: leaf order")
      }
    }
  }

  test("two-level queries parse each bracket independently (100 cases)") {
    val rng = new scala.util.Random(42L)
    (0 until 100).foreach { i =>
      val (c1, t1) = genTree(rng, 2)
      val (c2, t2) = genTree(rng, 2)
      val q = s"//sec[$c1]//par[$c2]"
      val parsed = NexiParser.parse(q)
      assert(parsed.path == Seq("sec") && parsed.inner.isDefined, s"case $i: $q")
      def check(level: NexiQuery, t: ClauseTree): Unit = t match {
        case ClauseLeaf(c) => assert(level.nexiClauses == Seq(c))
        case ClauseBool(op, l: ClauseLeaf, r: ClauseLeaf) =>
          assert(level.nexiClauses == Seq(l.clause, r.clause) && level.op.contains(op))
        case t0 => assert(level.tree.contains(t0))
      }
      check(parsed, t1)
      check(parsed.inner.get, t2)
    }
  }
}

package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{BlockCodec, InvertedIndex}

/** Document-at-a-time top-k with WAND pruning and block-max refinement
  * over the compressed segment table — the custom physical core that
  * Catalyst has no operator for
  * (reference max-score machinery: src/WeightedAndNode.cpp:32-215,
  * skip-batch seeks src/DiskDocListIterator.cpp:196-271, threshold
  * tightening include/indri/ScoredExtentAccumulator.hpp:40-100;
  * block-max columns per Ding & Suel BMW).
  *
  * Distribution model: segment blocks are bucketed by docId range at
  * build time, so `repartition(bucket)` co-locates ALL query terms'
  * postings for a doc range in one task — each task runs an independent
  * DAAT over its range and emits a local top-k; the global top-k is the
  * k best of (numBuckets × k) candidates. This is exactly Indri's
  * multi-server evaluate-then-merge shape
  * (reference: src/QueryEnvironment.cpp:242-316) with buckets as servers.
  *
  * Scope:
  *  - baseline okapi/tfidf bags with non-negative weights (flagship),
  *  - flat LM bags (dirichlet / jm / two-stage) via `planLm` — round 3:
  *    a missing term contributes its background score bg_t(dl) =
  *    s_t(0, dl) instead of 0, so the WAND algebra runs on
  *    score = B(dl) + Σ effW·δ_t(tf, dl) with δ = s − bg ≥ 0 monotone
  *    in tf and non-increasing in dl; the pivot bound is baseMax +
  *    Σ δ-upper-bounds where baseMax = B(minDl over the query terms'
  *    posting lists) bounds every candidate's background sum,
  *  - round 4: STRUCTURED #combine/#weight trees whose leaves are terms
  *    or #odN/#uwN windows of plain terms (the SDM/FDM shape) via
  *    [[StructuredPlan]] — ordered/unordered windows run INSIDE the
  *    kernel on per-posting position lists decoded from the segment
  *    blocks, exactly like the reference evaluates proximity operators
  *    document-at-a-time (reference: src/OrderedWindowNode.cpp:111-166,
  *    src/UnorderedWindowNode.cpp:69-186) with term-bound max-score
  *    (window block bound ≤ Σ constituent term block maxTf,
  *    reference: src/TermFrequencyBeliefNode.cpp:105-135).
  *
  * Exact scores always fold children in query order with the real
  * bg(dl) — bit-identical to the DataFrame path (WandPropertySpec).
  */
object Daat {

  /** One query-term cursor's static data. */
  final case class TermPlan(
      term: String,
      scoreFn: TermScoreFunction,
      effWeight: Double,   // Σ of child weights referencing this term
      upperBound: Double,  // baseline: sup effW·score; LM: sup effW·δ
      lm: Boolean = false
  )

  /** children in original query order: (cursorIdx, weight) — folding in
    * this order keeps doubles bit-identical to the DataFrame path.
    * `baseMax` = 0 for baseline; for LM the max background sum.
    */
  final case class DaatPlan(terms: Array[TermPlan], children: Array[(Int, Double)],
                            lm: Boolean = false, baseMax: Double = 0.0)

  // ---------------------------------------------------------------
  // structured (window-aware) plans — round 4
  // ---------------------------------------------------------------

  /** #odN / #uwN window of plain terms (in query order). A member that
    * stopped/never occurs keeps its slot (cursor exhausts immediately →
    * the window never matches, scored as background — NullScorer-through-
    * window semantics identical to the DataFrame path).
    */
  final case class WindowSpec(terms: Array[String], ordered: Boolean, width: Int) {
    override def equals(o: Any): Boolean = o match {
      case w: WindowSpec =>
        ordered == w.ordered && width == w.width && terms.sameElements(w.terms)
      case _ => false
    }
    override def hashCode: Int =
      (terms.toSeq, ordered, width).hashCode
  }

  /** One scored leaf of a structured query: a unigram term (window ==
    * null) or a window expression. effWeight = Σ over fold-tree paths of
    * the weight products reaching this leaf (for WAND bounds only; exact
    * scoring uses the fold tree).
    */
  final case class LeafPlan(
      term: String,                 // unigram term; windows: diagnostic label
      window: WindowSpec,           // null for unigrams
      scoreFn: TermScoreFunction,
      effWeight: Double,
      upperBound: Double)

  /** The belief-combination tree: mirrors nested
    * #combine/#weight OpSum folds bit-exactly (weights in query order,
    * inner sums completed before the outer fold — Engine.combineBeliefs).
    */
  sealed trait FoldTree extends Serializable
  final case class FLeaf(leaf: Int) extends FoldTree
  final case class FNode(children: Array[(Double, FoldTree)]) extends FoldTree

  /** Structured kernel plan. `baseMax` (LM only) = the fold tree
    * evaluated with every leaf at bg(minDlQuery) — the exact supremum of
    * any candidate's background sum (bg non-increasing in dl, weights
    * ≥ 0, and every candidate matches ≥1 leaf so dl ≥ minDlQuery).
    */
  final case class StructuredPlan(leaves: Array[LeafPlan], tree: FoldTree,
                                  lm: Boolean, baseMax: Double)

  /** Build the plan from global stats (the stats round — one dictionary
    * lookup, no posting scan).
    */
  def plan(engineTerms: Seq[(String, Double, TermScoreFunction)]): DaatPlan = {
    val distinct = engineTerms.map(_._1).distinct.toArray
    val idxOf = distinct.zipWithIndex.toMap
    val effW = new Array[Double](distinct.length)
    val fns = new Array[TermScoreFunction](distinct.length)
    engineTerms.foreach { case (t, w, fn) =>
      effW(idxOf(t)) += w
      fns(idxOf(t)) = fn
    }
    val plans = distinct.indices.map { i =>
      // sup_{tf→∞} okapi/tfidf score = tw·idf·(k1+1) (score is A·tf/(tf+c),
      // monotone in tf); cheap safe bound: effW·max(score(HUGE_TF, 1), 0)
      val asymptote = fns(i).scoreOccurrence(1e18, 1)
      TermPlan(distinct(i), fns(i), effW(i), math.max(effW(i) * asymptote, 0.0))
    }.toArray
    val children = engineTerms.map { case (t, w, _) => (idxOf(t), w) }.toArray
    DaatPlan(plans, children)
  }

  /** LM plan: per term also takes (ctf, minDl) — the global δ upper
    * bound is δ(tfCap=ctf, minDl_t): δ is monotone in tf and
    * non-increasing in dl for dirichlet (δ = ln(1 + tf/(μ·cf)),
    * dl-free), JM (δ = ln(1 + (1−λ)tf/(dl·λ·cf))) and two-stage.
    * `minDlQuery` = min over the PRESENT query terms' minDocLen — every
    * candidate document contains one of them, so its dl is ≥ that and
    * its background sum ≤ baseMax = Σ_children w·s_t(0, minDlQuery).
    */
  def planLm(engineTerms: Seq[(String, Double, TermScoreFunction, Long, Int)],
             minDlQuery: Int): DaatPlan = {
    val distinct = engineTerms.map(_._1).distinct.toArray
    val idxOf = distinct.zipWithIndex.toMap
    val effW = new Array[Double](distinct.length)
    val fns = new Array[TermScoreFunction](distinct.length)
    val ctfs = new Array[Long](distinct.length)
    val minDls = new Array[Int](distinct.length)
    engineTerms.foreach { case (t, w, fn, ctf, minDl) =>
      effW(idxOf(t)) += w
      fns(idxOf(t)) = fn
      ctfs(idxOf(t)) = ctf
      minDls(idxOf(t)) = math.max(minDl, 1)
    }
    val plans = distinct.indices.map { i =>
      val ub = effW(i) * math.max(
        fns(i).scoreOccurrence(ctfs(i).toDouble, minDls(i))
          - fns(i).scoreOccurrence(0.0, minDls(i)), 0.0)
      TermPlan(distinct(i), fns(i), effW(i), ub, lm = true)
    }.toArray
    val children = engineTerms.map { case (t, w, _, _, _) => (idxOf(t), w) }.toArray
    val baseMax = children.foldLeft(0.0) { case (acc, (ci, w)) =>
      acc + w * fns(ci).scoreOccurrence(0.0, math.max(minDlQuery, 1))
    }
    DaatPlan(plans, children, lm = true, baseMax = baseMax)
  }

  /** Run distributed block-max WAND. Returns (docId, score) top-k.
    *
    * @param exhaustive disable pruning (used by the safety property test:
    *                   pruned == exhaustive, FIXTURES.md §5)
    */
  def topK(index: InvertedIndex, p: DaatPlan, k: Int,
           exhaustive: Boolean = false,
           seedTheta: Double = Double.NegativeInfinity,
           deleted: Set[Long] = Set.empty): DataFrame = {
    val spark = index.segments.sparkSession
    import spark.implicits._
    // k ≤ 0 must mirror the DataFrame path's limit(k) → empty result;
    // unguarded it reaches a zero-capacity TopKHeap whose peek() NPEs
    if (k <= 0) return Seq.empty[(Long, Double)].toDF("docId", "score")
    val terms = p.terms.map(_.term).toSeq
    val bcPlan = spark.sparkContext.broadcast(p)
    val bcDeleted = spark.sparkContext.broadcast(deleted)

    val segs = querySegments(index, terms, withPositions = false)

    val locals = segs.mapPartitions { rows =>
      val plan = bcPlan.value
      val byTerm = collectBlocks(rows, hasPositions = false)
      val cursors = plan.terms.indices.map { i =>
        new Cursor(byTerm.getOrElse(plan.terms(i).term, TermBlocks.empty),
          plan.terms(i))
      }.toArray
      wand(cursors, plan, k, exhaustive, seedTheta, bcDeleted.value).iterator
    }.toDF("docId", "score")

    // global merge of per-bucket top-k candidates
    locals.orderBy(col("score").desc, col("docId").asc).limit(k)
  }

  /** Structured (window-aware) distributed WAND — the SDM/FDM physical
    * path. Segment rows ship WITH positionsDelta; per bucket, one
    * [[Cursor]] per unigram leaf and one [[WindowCursor]] (over member
    * term cursors sharing the bucket's decoded blocks) per window leaf.
    */
  def topKStructured(index: InvertedIndex, p: StructuredPlan, k: Int,
                     exhaustive: Boolean = false,
                     deleted: Set[Long] = Set.empty): DataFrame = {
    val spark = index.segments.sparkSession
    import spark.implicits._
    if (k <= 0) return Seq.empty[(Long, Double)].toDF("docId", "score")
    val termSet = p.leaves.flatMap(l =>
      if (l.window == null) Seq(l.term) else l.window.terms.toSeq).distinct.toSeq
    val bcPlan = spark.sparkContext.broadcast(p)
    val bcDeleted = spark.sparkContext.broadcast(deleted)

    val segs = querySegments(index, termSet, withPositions = true)

    val locals = segs.mapPartitions { rows =>
      val plan = bcPlan.value
      val byTerm = collectBlocks(rows, hasPositions = true)
      val cursors: Array[DaatCursor] = plan.leaves.map(leafCursor(_, byTerm, plan.lm))
      val heap = wandLoop(cursors, plan.baseMax, k, exhaustive,
        Double.NegativeInfinity, bcDeleted.value,
        d => scoreStructured(cursors, plan, d))
      heap.iterator
    }.toDF("docId", "score")

    locals.orderBy(col("score").desc, col("docId").asc).limit(k)
  }

  /** Kernel-side ContextCount for window expressions: ONE pass over the
    * member terms' segment blocks per bucket; per window the member
    * cursors leapfrog their conjunction and [[WindowMatcher]] counts
    * matches per doc — (occ, df) per window, summed across buckets
    * (docId ranges are disjoint). Bit-count-identical to the DataFrame
    * windowRaw aggregation (same positions, same matcher).
    * (reference: src/ContextCountAccumulator.cpp gathered in one
    * server round, src/QueryEnvironment.cpp:957-966)
    */
  def windowStats(index: InvertedIndex, windows: Array[WindowSpec],
                  deleted: Set[Long] = Set.empty): Array[(Double, Long)] = {
    if (windows.isEmpty) return Array.empty
    val spark = index.segments.sparkSession
    import spark.implicits._
    val termSet = windows.flatMap(_.terms).distinct.toSeq
    val bcWindows = spark.sparkContext.broadcast(windows)
    val bcDeleted = spark.sparkContext.broadcast(deleted)

    val segs = querySegments(index, termSet, withPositions = true)

    val partials = segs.mapPartitions { rows =>
      val ws = bcWindows.value
      val del = bcDeleted.value
      val byTerm = collectBlocks(rows, hasPositions = true)
      ws.iterator.zipWithIndex.map { case (w, wi) =>
        val cur = new WindowCursor(
          w.terms.map(t => new Cursor(byTerm.getOrElse(t, TermBlocks.empty),
            statsPlan(t))),
          w.ordered, w.width, null, 0.0, 0.0, lmMode = false)
        var occ = 0L; var df = 0L
        while (!cur.exhausted) {
          if (!del.contains(cur.doc)) {
            val c = cur.tf
            if (c > 0) { occ += c; df += 1 }
          }
          cur.next()
        }
        (wi, occ, df)
      }
    }.toDF("wi", "occ", "df")
      .groupBy("wi").agg(sum("occ").as("occ"), sum("df").as("df"))
      .collect()

    val out = Array.fill(windows.length)((0.0, 0L))
    partials.foreach { r => out(r.getInt(0)) = (r.getLong(1).toDouble, r.getLong(2)) }
    out
  }

  private def statsPlan(t: String) = TermPlan(t, null, 0.0, 0.0)

  // ---------------------------------------------------------------
  // extent-restricted / passage kernel — round 5
  // ---------------------------------------------------------------

  /** Plan for extent-restricted retrieval (`#combine[f]`, `#weight[f]`,
    * `#combine[passageW:I]`, … over flat plain-term bags — the
    * runExtentQuery shape). Arrays are in child (query) order and the
    * per-extent arithmetic mirrors Engine.scoreExtentContexts' UDF
    * bit-exactly: tf = greedy containment count inside [b, e),
    * contextSize = e − b, children fold w·score in child order into
    * their group, groups fold per `op`
    * (reference: ExtentRestrictionNode/FixedPassageNode,
    * src/InferenceNetworkBuilder.cpp:152-185; ListBeliefNode scores with
    * the extent as context, src/ListBeliefNode.cpp:119-127).
    *
    * @param childTerm processed term per child; null = OOV/stopped
    *                  (scores the background fill-in, never matches)
    */
  final case class ExtentPlan(
      childTerm: Array[String],
      fns: Array[TermScoreFunction],
      wChild: Array[Double],
      groupOf: Array[Int],
      nGroups: Int,
      op: String,
      gw: Array[Double])

  /** Extent-restricted top-k through the DAAT kernel: candidate docs =
    * the union of the query terms' posting lists (the WeightedAnd
    * union), every extent of a candidate is scored in-task from the
    * segment blocks' decoded positions, and only bucket-local top-k
    * extents reach the global merge — no per-position shuffle, no
    * global extent sort.
    *
    *  - passages (`fieldExtents == null`): contexts are pure per-doc
    *    arithmetic on doclen, so the scan keeps the bucketed
    *    zero-Exchange path of [[topK]];
    *  - field extents: the restriction field's (docId, begin, end) rows
    *    co-locate with the query terms' segment blocks via ONE cogroup
    *    on the docId-range bucket (extent rows map to buckets through a
    *    broadcast of the blocks' [firstDoc, lastDoc] ranges — rows
    *    outside every range belong to non-candidate docs and drop
    *    before the shuffle). The RDD cogroup is the same
    *    per-partition imperative kernel shape as mapPartitions, with
    *    an explicit partition count AQE cannot re-plan.
    *
    * Pruning is deliberately exhaustive over candidates: the DataFrame
    * path scores every extent of every candidate too (LM background
    * scores make zero-match extents real results), and extent contexts
    * invalidate the dl-monotone block bounds the WAND algebra needs.
    */
  def topKExtents(index: InvertedIndex, p: ExtentPlan,
                  passage: Option[(Int, Int)],
                  fieldExtents: DataFrame,
                  k: Int, deleted: Set[Long] = Set.empty): DataFrame = {
    val spark = index.segments.sparkSession
    import spark.implicits._
    val terms = p.childTerm.filter(_ != null).distinct.toSeq
    def emptyResult: DataFrame =
      Seq.empty[(Long, Int, Int, Double)].toDF("docId", "begin", "end", "score")
    if (terms.isEmpty || k <= 0) return emptyResult
    val bcPlan = spark.sparkContext.broadcast(p)
    val bcDeleted = spark.sparkContext.broadcast(deleted)

    val locals: DataFrame = passage match {
      case Some((width, inc)) =>
        val segs = querySegments(index, terms, withPositions = true)
        segs.mapPartitions { rows =>
          val byTerm = collectBlocks(rows, hasPositions = true)
          extentLocal(bcPlan.value, byTerm, null, Some((width, inc)), k,
            bcDeleted.value).iterator
        }.toDF("docId", "begin", "end", "score")
      case None =>
        val base = Seq("term", "bucket", "firstDoc", "lastDoc", "numDocs",
          "maxTf", "minDl", "docsDelta", "tfs", "dls", "positionsDelta")
        val segs0 = index.segments
          .where(col("term").isin(terms: _*))
          .select(base.map(col): _*)
        // candidate docId ranges per bucket from block metadata only —
        // ≤ numBuckets rows; buckets are disjoint docId ranges by
        // construction (IndexBuilder bucket = (docId−1)/span; federation
        // rebases keep members' ranges disjoint)
        val ranges = segs0.groupBy("bucket")
          .agg(min("firstDoc").as("lo"), max("lastDoc").as("hi"))
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._2)
        if (ranges.isEmpty) return emptyResult
        val bcRanges = spark.sparkContext.broadcast(ranges)
        val exRdd = fieldExtents
          .select(col("docId").cast("long"), col("begin").cast("int"),
            col("end").cast("int"))
          .rdd.flatMap { r =>
            val d = r.getLong(0)
            val rs = bcRanges.value
            // greatest j with lo(j) <= d
            var lo = 0; var hi = rs.length - 1; var j = -1
            while (lo <= hi) {
              val m = (lo + hi) >>> 1
              if (rs(m)._2 <= d) { j = m; lo = m + 1 } else hi = m - 1
            }
            if (j >= 0 && d <= rs(j)._3) Some((rs(j)._1, (d, r.getInt(1), r.getInt(2))))
            else None // the doc matches no query term — not a candidate
          }
        val segRdd = segs0.rdd.map(r => (r.getInt(1), r))
        val co = segRdd.cogroup(exRdd, math.max(1, ranges.length))
        co.flatMap { case (_, (segRows, exs)) =>
          val byTerm = collectBlocks(segRows.iterator, hasPositions = true)
          val grouped = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[(Int, Int)]]()
          exs.foreach { case (d, b, e) =>
            var buf = grouped.get(d)
            if (buf == null) {
              buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
              grouped.put(d, buf)
            }
            buf += ((b, e))
          }
          val exMap = new java.util.HashMap[Long, (Array[Int], Array[Int])](grouped.size)
          grouped.forEach { (d, buf) =>
            // mirror of the DataFrame path's sort_array(struct(begin,end))
            val sorted = buf.sortBy(identity).toArray
            exMap.put(d, (sorted.map(_._1), sorted.map(_._2)))
          }
          extentLocal(bcPlan.value, byTerm, exMap, None, k, bcDeleted.value)
        }.toDF("docId", "begin", "end", "score")
    }
    locals.orderBy(col("score").desc, col("docId").asc, col("begin").asc,
      col("end").asc).limit(k)
  }

  /** One bucket task's extent scoring: union-merge the term cursors over
    * docIds; per candidate, enumerate the doc's extents (field map or
    * sliding-passage arithmetic over doclen) and offer each scored
    * extent to the local heap. Passage begins replicate the DataFrame
    * path's sequence(0, max(dl−1, 0), inc); ends clamp to dl.
    */
  private def extentLocal(p: ExtentPlan, byTerm: Map[String, TermBlocks],
                          exMap: java.util.HashMap[Long, (Array[Int], Array[Int])],
                          passage: Option[(Int, Int)],
                          k: Int, deleted: Set[Long]): Seq[(Long, Int, Int, Double)] = {
    val distinct = p.childTerm.filter(_ != null).distinct
    val cursors = distinct.map(t =>
      new Cursor(byTerm.getOrElse(t, TermBlocks.empty), statsPlan(t)))
    val childrenOf: Array[Array[Int]] = distinct.map(t =>
      p.childTerm.indices.filter(ci => t == p.childTerm(ci)).toArray)
    val n = p.childTerm.length
    val heap = new ExtentHeap(k)
    val tfPos = new Array[Array[Int]](n)
    val groupScore = new Array[Double](p.nGroups)
    var done = cursors.isEmpty
    while (!done) {
      var d = Long.MaxValue
      var i = 0
      while (i < cursors.length) {
        val c = cursors(i)
        if (!c.exhausted && c.doc < d) d = c.doc
        i += 1
      }
      if (d == Long.MaxValue) done = true
      else {
        if (!deleted.contains(d)) {
          java.util.Arrays.fill(tfPos.asInstanceOf[Array[AnyRef]], null)
          var dl = 1
          i = 0
          while (i < cursors.length) {
            val c = cursors(i)
            if (!c.exhausted && c.doc == d) {
              dl = c.dl
              val ps = c.positions
              val cs = childrenOf(i)
              var j = 0
              while (j < cs.length) { tfPos(cs(j)) = ps; j += 1 }
            }
            i += 1
          }
          passage match {
            case Some((width, inc)) =>
              val last = math.max(dl - 1, 0)
              var b = 0
              var go = true
              while (go) {
                scoreExtent(p, tfPos, groupScore, d, b, math.min(b + width, dl), heap)
                b += inc
                if (b > last) go = false
              }
            case None =>
              val ex = exMap.get(d)
              if (ex != null) {
                val (bs, es) = ex
                var j = 0
                while (j < bs.length) {
                  scoreExtent(p, tfPos, groupScore, d, bs(j), es(j), heap)
                  j += 1
                }
              }
          }
        }
        i = 0
        while (i < cursors.length) {
          val c = cursors(i)
          if (!c.exhausted && c.doc == d) c.next()
          i += 1
        }
      }
    }
    heap.results
  }

  /** Score one extent [b, e) — the bit-exact mirror of the
    * scoreExtentContexts UDF: greedy non-overlap containment count
    * (len = 1 plain terms), 2-arg score at contextSize = e − b, children
    * fold in child order, groups fold per op.
    */
  private def scoreExtent(p: ExtentPlan, tfPos: Array[Array[Int]],
                          groupScore: Array[Double], d: Long, b: Int, e: Int,
                          heap: ExtentHeap): Unit = {
    val ctx = e - b
    java.util.Arrays.fill(groupScore, 0.0)
    var child = 0
    while (child < p.fns.length) {
      val ps = tfPos(child)
      var tf = 0
      if (ps != null) {
        var lastEnd = 0
        var j = 0
        while (j < ps.length) {
          val pp = ps(j)
          if (pp >= b && pp + 1 <= e && pp >= lastEnd) { tf += 1; lastEnd = pp + 1 }
          j += 1
        }
      }
      val sc = p.fns(child).scoreOccurrence(tf.toDouble, ctx)
      groupScore(p.groupOf(child)) += p.wChild(child) * sc
      child += 1
    }
    val nG = p.nGroups
    val acc = p.op match {
      case "or" | "combine" if nG == 1 => groupScore(0)
      case "or" =>
        var notAny = 1.0; var g = 0
        while (g < nG) { notAny *= (1.0 - math.exp(groupScore(g))); g += 1 }
        math.log(1.0 - notAny)
      case "max" =>
        var m = Double.NegativeInfinity; var g = 0
        while (g < nG) { if (groupScore(g) > m) m = groupScore(g); g += 1 }
        m
      case "wsum" =>
        var s = 0.0; var g = 0
        while (g < nG) { s += p.gw(g) * math.exp(groupScore(g)); g += 1 }
        math.log(s)
      case "not" => math.log1p(-math.exp(groupScore(0)))
      case _ =>
        if (nG == 1) groupScore(0)
        else {
          var s = 0.0; var g = 0
          while (g < nG) { s += groupScore(g) / nG; g += 1 }
          s
        }
    }
    heap.offer(d, b, e, acc)
  }

  /** Bounded extent heap, worst-first; final order (score desc, docId
    * asc, begin asc, end asc) matches the DataFrame path's sort.
    */
  final class ExtentHeap(k: Int) {
    private val q = new java.util.PriorityQueue[(Long, Int, Int, Double)](
      math.min(k, 1024) + 1,
      (a: (Long, Int, Int, Double), b: (Long, Int, Int, Double)) => {
        val c = java.lang.Double.compare(a._4, b._4)
        if (c != 0) c
        else {
          val cd = java.lang.Long.compare(b._1, a._1)
          if (cd != 0) cd
          else {
            val cb = Integer.compare(b._2, a._2)
            if (cb != 0) cb else Integer.compare(b._3, a._3)
          }
        }
      })
    def offer(docId: Long, begin: Int, end: Int, score: Double): Unit = {
      if (k <= 0) return // zero-capacity heap: peek() below would NPE
      if (q.size < k) q.add((docId, begin, end, score))
      else {
        val w = q.peek()
        val better = score > w._4 ||
          (score == w._4 && (docId < w._1 ||
            (docId == w._1 && (begin < w._2 ||
              (begin == w._2 && end < w._3)))))
        if (better) { q.poll(); q.add((docId, begin, end, score)) }
      }
    }
    def results: Seq[(Long, Int, Int, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int, Double)]
      val it = q.iterator()
      while (it.hasNext) out += it.next()
      out.sortBy { case (d, b, e, s) => (-s, d, b, e) }.toSeq
    }
  }

  /** Shared per-query segment scan: filter to the query's terms, select
    * the block columns (positions only when the plan needs them — the
    * flat path never ships position bytes), co-locate by bucket.
    * One task per docId-range bucket — NOT spark.sql.shuffle.partitions:
    * a query touches only |terms| posting lists, and padding it to the
    * session-wide partition count schedules mostly-empty tasks.
    * Pre-bucketed segments (bucketed table scan / persisted repartition)
    * skip the exchange entirely: the filter is narrow, so every task
    * already holds complete (term × bucket) groups — a hot term's
    * posting payload never crosses the wire per query.
    */
  private def querySegments(index: InvertedIndex, terms: Seq[String],
                            withPositions: Boolean): DataFrame = {
    val base = Seq("term", "bucket", "firstDoc", "lastDoc", "numDocs", "maxTf",
      "minDl", "docsDelta", "tfs", "dls")
    val cols = if (withPositions) base :+ "positionsDelta" else base
    val segs0 = index.segments
      .where(col("term").isin(terms: _*))
      .select(cols.map(col): _*)
    if (index.segmentsBucketed) segs0
    else if (index.numBuckets > 0) segs0.repartition(index.numBuckets, col("bucket"))
    else segs0.repartition(col("bucket"))
  }

  /** Group one partition's segment rows into per-term [[TermBlocks]]
    * (shared decode cache — member cursors of several windows over the
    * same term decode each block once).
    */
  private def collectBlocks(rows: Iterator[org.apache.spark.sql.Row],
                            hasPositions: Boolean): Map[String, TermBlocks] = {
    val buf = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Block]]
    rows.foreach { r =>
      buf.getOrElseUpdate(r.getString(0),
        scala.collection.mutable.ArrayBuffer.empty[Block]) += Block(
        r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5), r.getInt(6),
        r.getAs[Array[Byte]](7), r.getAs[Array[Byte]](8), r.getAs[Array[Byte]](9),
        if (hasPositions) r.getAs[Array[Byte]](10) else Array.emptyByteArray)
    }
    buf.iterator.map { case (t, bs) =>
      t -> new TermBlocks(bs.sortBy(_.firstDoc).toArray)
    }.toMap
  }

  /** One leaf cursor over the bucket's shared blocks. */
  private def leafCursor(l: LeafPlan, byTerm: Map[String, TermBlocks],
                         lm: Boolean): DaatCursor =
    if (l.window == null)
      new Cursor(byTerm.getOrElse(l.term, TermBlocks.empty),
        TermPlan(l.term, l.scoreFn, l.effWeight, l.upperBound, lm))
    else
      new WindowCursor(
        l.window.terms.map(t => new Cursor(byTerm.getOrElse(t, TermBlocks.empty),
          statsPlan(t))),
        l.window.ordered, l.window.width,
        l.scoreFn, l.effWeight, l.upperBound, lmMode = lm)

  final case class Block(firstDoc: Long, lastDoc: Long, numDocs: Int,
                         maxTf: Int, minDl: Int,
                         docsDelta: Array[Byte], tfs: Array[Byte], dls: Array[Byte],
                         pos: Array[Byte] = Array.emptyByteArray)

  /** A term's blocks in one bucket plus a shared memoized decode cache:
    * several cursors over the same term (unigram leaf + window members)
    * decode each block's payload once per partition.
    */
  final class TermBlocks(val blocks: Array[Block]) {
    private val docsC = new Array[Array[Long]](blocks.length)
    private val tfsC = new Array[Array[Int]](blocks.length)
    private val dlsC = new Array[Array[Int]](blocks.length)
    private val possC = new Array[Array[Array[Int]]](blocks.length)
    def length: Int = blocks.length
    def docs(i: Int): Array[Long] = {
      if (docsC(i) == null) {
        val b = blocks(i)
        docsC(i) = BlockCodec.decodeDeltas(b.docsDelta, b.numDocs)
        tfsC(i) = BlockCodec.decodePlain(b.tfs, b.numDocs).map(_.toInt)
        dlsC(i) = BlockCodec.decodePlain(b.dls, b.numDocs).map(_.toInt)
      }
      docsC(i)
    }
    def tfs(i: Int): Array[Int] = { docs(i); tfsC(i) }
    def dls(i: Int): Array[Int] = { docs(i); dlsC(i) }
    def positions(i: Int): Array[Array[Int]] = {
      if (possC(i) == null) {
        val b = blocks(i)
        require(b.pos.nonEmpty || b.numDocs == 0,
          "positions not stored — rebuild the index with storePositions=true")
        possC(i) = BlockCodec.decodePositions(b.pos, b.numDocs)
      }
      possC(i)
    }
  }
  object TermBlocks {
    val empty = new TermBlocks(Array.empty[Block])
  }

  /** Common cursor surface the WAND loop drives — implemented by the
    * posting-list [[Cursor]] and the proximity [[WindowCursor]].
    */
  trait DaatCursor {
    def scoreFn: TermScoreFunction
    def effWeight: Double
    def upperBound: Double
    def exhausted: Boolean
    def doc: Long
    def tf: Int
    def dl: Int
    def blockBound: Double
    def blockLast: Long
    def next(): Unit
    def advanceTo(target: Long): Unit
    /** leaf score at (tf, dl): term cursors ride the frequency-list
      * 2-arg score form, window cursors the ListBeliefNode 4-arg form
      * with documentOccurrences == occurrences (reference:
      * src/TermFrequencyBeliefNode.cpp vs src/ListBeliefNode.cpp:119-127)
      * — identical for every rule except two-stage/documentMu smoothing,
      * whose document components differ on purpose.
      */
    def scoreAt(tf: Double, dl: Int): Double
  }

  /** Lazy-decoding posting cursor with block skipping: `advanceTo` hops
    * whole blocks via (firstDoc, lastDoc) without decoding — the skip
    * record analogue (reference: src/DiskDocListIterator.cpp:196-210).
    */
  final class Cursor(tb: TermBlocks, val plan: TermPlan) extends DaatCursor {
    def this(blocks: Array[Block], plan: TermPlan) = this(new TermBlocks(blocks), plan)
    private def blocks: Array[Block] = tb.blocks
    private var bi = 0
    private var pos = 0
    private var docs: Array[Long] = null
    private var tfs: Array[Int] = null
    private var dls: Array[Int] = null
    var decodedBlocks = 0 // instrumentation for pruning tests

    def scoreFn: TermScoreFunction = plan.scoreFn
    def effWeight: Double = plan.effWeight
    def upperBound: Double = plan.upperBound
    def scoreAt(tf0: Double, dl0: Int): Double = plan.scoreFn.scoreOccurrence(tf0, dl0)

    private def ensureDecoded(): Unit = {
      if (docs == null && bi < blocks.length) {
        docs = tb.docs(bi)
        tfs = tb.tfs(bi)
        dls = tb.dls(bi)
        decodedBlocks += 1
      }
    }
    def exhausted: Boolean = bi >= blocks.length
    /** current docId WITHOUT decoding at block boundaries: an undecoded
      * block's cursor sits at pos 0, whose docId is the skip-record
      * firstDoc (reference: src/DiskDocListIterator.cpp skip batches
      * carry the first document) — so bound-rejected blocks are hopped
      * without ever decoding their payload
      */
    def doc: Long =
      if (exhausted) Long.MaxValue
      else if (docs == null) blocks(bi).firstDoc
      else docs(pos)
    def tf: Int = { ensureDecoded(); tfs(pos) }
    def dl: Int = { ensureDecoded(); dls(pos) }
    /** position list of the current posting (windows only — decoded
      * per block on first touch, shared across the bucket's cursors)
      */
    def positions: Array[Int] = { ensureDecoded(); tb.positions(bi)(pos) }
    /** current block's max tf / min dl — the block-max metadata, readable
      * without decoding (window cursors combine members' bounds)
      */
    def blockMaxTf: Int = if (exhausted) 0 else blocks(bi).maxTf
    def blockMinDl: Int = if (exhausted) 1 else blocks(bi).minDl
    /** max contribution of the CURRENT block (block-max bound). LM mode
      * bounds the δ above background — the background sum is already
      * covered by the plan-level baseMax; δ peaks at (maxTf, minDl).
      */
    def blockBound: Double =
      if (exhausted) 0.0
      else {
        val b = blocks(bi)
        if (plan.lm)
          math.max(plan.effWeight *
            (plan.scoreFn.scoreOccurrence(b.maxTf.toDouble, b.minDl)
              - plan.scoreFn.scoreOccurrence(0.0, b.minDl)), 0.0)
        else
          math.max(plan.effWeight * plan.scoreFn.scoreOccurrence(b.maxTf.toDouble, b.minDl), 0.0)
      }
    /** last doc of the current block (next-shallow boundary for BMW skips) */
    def blockLast: Long = if (exhausted) Long.MaxValue else blocks(bi).lastDoc

    def next(): Unit = {
      if (exhausted) return
      ensureDecoded()
      pos += 1
      if (pos >= docs.length) { bi += 1; pos = 0; docs = null; tfs = null; dls = null }
    }
    def advanceTo(target: Long): Unit = {
      if (exhausted) return
      // hop undecoded blocks first
      while (bi < blocks.length && blocks(bi).lastDoc < target) {
        bi += 1; pos = 0; docs = null; tfs = null; dls = null
      }
      if (exhausted) return
      // block starts at/after the target: the cursor already sits on
      // firstDoc — no decode until tf/dl are actually read
      if (docs == null && blocks(bi).firstDoc >= target) return
      ensureDecoded()
      while (pos < docs.length && docs(pos) < target) pos += 1
      if (pos >= docs.length) { bi += 1; pos = 0; docs = null; tfs = null; dls = null; advanceTo(target) }
    }
  }

  /** Proximity cursor: the conjunction of its member term cursors,
    * leapfrog-aligned; `tf` = the #odN/#uwN match count over the
    * members' decoded position lists at the aligned doc — the
    * document-at-a-time OrderedWindowNode/UnorderedWindowNode evaluation
    * (reference: src/OrderedWindowNode.cpp:111-166,
    * src/UnorderedWindowNode.cpp:69-186). The conjunction SKIPS docs
    * missing any member — sound, because the window can only match where
    * every member occurs; a doc where members align but no window fits
    * has tf = 0 and scores as background, exactly like the DataFrame
    * path's absent-leaf fill-in.
    */
  final class WindowCursor(members: Array[Cursor], ordered: Boolean, width: Int,
                           val scoreFn: TermScoreFunction,
                           val effWeight: Double,
                           val upperBound: Double,
                           lmMode: Boolean) extends DaatCursor {
    private var curDoc: Long = Long.MaxValue
    private var tfc: Int = -1
    align(0L)

    private def align(target: Long): Unit = {
      tfc = -1
      if (members.isEmpty) { curDoc = Long.MaxValue; return }
      var t = target
      var aligned = false
      while (!aligned) {
        var maxD = Long.MinValue
        var minD = Long.MaxValue
        var i = 0
        while (i < members.length) {
          members(i).advanceTo(t)
          val d = members(i).doc
          if (d > maxD) maxD = d
          if (d < minD) minD = d
          i += 1
        }
        if (maxD == Long.MaxValue) { curDoc = Long.MaxValue; aligned = true }
        else if (minD == maxD) { curDoc = maxD; aligned = true }
        else t = maxD
      }
    }

    def exhausted: Boolean = curDoc == Long.MaxValue
    def doc: Long = curDoc
    def tf: Int = {
      if (tfc < 0) {
        val k = members.length
        val bs = new Array[Array[Int]](k)
        val es = new Array[Array[Int]](k)
        var i = 0
        while (i < k) {
          val ps = members(i).positions
          bs(i) = ps
          val e = new Array[Int](ps.length)
          var j = 0
          while (j < ps.length) { e(j) = ps(j) + 1; j += 1 }
          es(i) = e
          i += 1
        }
        val ex = if (ordered) WindowMatcher.ordered(bs, es, width)
                 else WindowMatcher.unordered(bs, es, width)
        // the belief occurrence count applies the reference's greedy
        // non-overlap scan (matches emit in begin order) — bit-identical
        // to the DataFrame path's dedupCount
        tfc = WindowMatcher.dedupCount(ex._1, ex._2)
      }
      tfc
    }
    def dl: Int = members(0).dl
    def blockLast: Long = {
      var m = Long.MaxValue
      var i = 0
      while (i < members.length) {
        val bl = members(i).blockLast
        if (bl < m) m = bl
        i += 1
      }
      m
    }
    /** Window tf at any doc d in [doc, blockLast] is ≤ Σ member tf(d)
      * ≤ Σ member block maxTf (each match consumes ≥1 member
      * occurrence, and for unordered windows each anchor is a member
      * occurrence — reference term-bound max-score,
      * src/TermFrequencyBeliefNode.cpp:105-135); dl(d) ≥ max member
      * block minDl. Score monotone ↑ tf, ↓ dl for all supported rules.
      */
    def blockBound: Double =
      if (exhausted) 0.0
      else {
        var tfB = 0L
        var dlB = 1
        var i = 0
        while (i < members.length) {
          tfB += members(i).blockMaxTf
          if (members(i).blockMinDl > dlB) dlB = members(i).blockMinDl
          i += 1
        }
        val s = scoreAt(tfB.toDouble, dlB)
        if (lmMode) math.max(effWeight * (s - scoreAt(0.0, dlB)), 0.0)
        else math.max(effWeight * s, 0.0)
      }
    def next(): Unit = if (!exhausted) align(curDoc + 1)
    def advanceTo(target: Long): Unit =
      if (!exhausted && target > curDoc) align(target)
    /** windows are ListBeliefNodes: 4-arg score form, document counts
      * = the window's own (null raw iterator — reference:
      * src/InferenceNetworkBuilder.cpp:756-780, ListBeliefNode.cpp:119-127)
      */
    def scoreAt(tf0: Double, dl0: Int): Double =
      scoreFn.scoreOccurrence(tf0, dl0, tf0, dl0)
  }

  /** Exact structured score of `docId`: leaf scores (real tf when the
    * leaf's cursor sits on the doc, else the background fill-in
    * scoreFn(0, dl)) folded through the tree in query order — the
    * bit-exact mirror of nested combineBeliefs. Returns NaN when no
    * leaf has a REAL match (window conjunction aligned but zero window
    * count everywhere): such a doc is not a candidate on the DataFrame
    * path (absent from every leaf's match list) and must not be offered.
    */
  def scoreStructured(cursors: Array[DaatCursor], p: StructuredPlan,
                      docId: Long): Double = {
    val n = cursors.length
    var docDl = -1
    var any = false
    var i = 0
    while (i < n) {
      val c = cursors(i)
      if (!c.exhausted && c.doc == docId) {
        docDl = c.dl
        if (c.tf > 0) any = true
      }
      i += 1
    }
    if (!any) return Double.NaN
    val leafScore = new Array[Double](n)
    i = 0
    while (i < n) {
      val c = cursors(i)
      leafScore(i) =
        if (!c.exhausted && c.doc == docId)
          c.scoreAt(c.tf.toDouble, docDl)
        else
          c.scoreAt(0.0, docDl)
      i += 1
    }
    def eval(t: FoldTree): Double = t match {
      case FLeaf(li) => leafScore(li)
      case FNode(cs) =>
        var acc = 0.0
        var j = 0
        while (j < cs.length) {
          acc += cs(j)._1 * eval(cs(j)._2)
          j += 1
        }
        acc
    }
    eval(p.tree)
  }

  /** Evaluate the fold tree with every leaf pinned to a fixed value
    * function — used to compute the exact background supremum baseMax.
    */
  def foldWith(tree: FoldTree, leafValue: Int => Double): Double = tree match {
    case FLeaf(li) => leafValue(li)
    case FNode(cs) =>
      var acc = 0.0
      var j = 0
      while (j < cs.length) {
        acc += cs(j)._1 * foldWith(cs(j)._2, leafValue)
        j += 1
      }
      acc
  }

  /** The flat-bag WAND entry (okapi/tfidf/LM bags) — exact scoring folds
    * plan.children in query order; missing children contribute bg(dl)
    * in LM mode (combineBeliefs fill-in).
    */
  def wand(cursors: Array[Cursor], plan: DaatPlan, k: Int,
           exhaustive: Boolean,
           seedTheta: Double = Double.NegativeInfinity,
           deleted: Set[Long] = Set.empty): Seq[(Long, Double)] = {
    val nTerms = cursors.length
    val contrib = new Array[Double](nTerms)
    def scoreCurrent(docId: Long): Double = {
      java.util.Arrays.fill(contrib, 0.0)
      var docDl = -1
      var i = 0
      while (i < nTerms) {
        val c = cursors(i)
        if (!c.exhausted && c.doc == docId) {
          contrib(i) = c.plan.scoreFn.scoreOccurrence(c.tf.toDouble, c.dl)
          docDl = c.dl
        }
        i += 1
      }
      var acc = 0.0
      var j = 0
      while (j < plan.children.length) {
        val (ci, w) = plan.children(j)
        val c = cursors(ci)
        if (!c.exhausted && c.doc == docId) acc += w * contrib(ci)
        else if (plan.lm) acc += w * c.plan.scoreFn.scoreOccurrence(0.0, docDl)
        j += 1
      }
      acc
    }
    wandLoop(cursors.map(c => c: DaatCursor), plan.baseMax, k,
      exhaustive, seedTheta, deleted, scoreCurrent)
  }

  /** The WAND loop with block-max refinement over one partition,
    * generic over cursor kinds and the exact scorer (`scoreDoc` returns
    * NaN for a doc that is not a real candidate — skipped, not offered).
    *
    * @param seedTheta initial pruning threshold from topdocs candidate
    *   seeding (reference: src/WeightedAndNode.cpp:119-186). MUST be a
    *   lower bound of the true global k-th best score: the caller derives
    *   it from k distinct docs' score lower bounds, so any doc pruned by
    *   it is provably outside the top-k. Valid in every bucket task —
    *   it is a global bound.
    */
  def wandLoop(cursors: Array[DaatCursor], baseMax: Double, k: Int,
               exhaustive: Boolean, seedTheta: Double, deleted: Set[Long],
               scoreDoc: Long => Double): Seq[(Long, Double)] = {
    if (k <= 0) return Nil // zero-capacity TopKHeap would NPE on peek()
    val nTerms = cursors.length
    val heap = new TopKHeap(k)
    val order = (0 until nTerms).toArray // cursor indices sorted by current doc

    def sortOrder(): Unit = {
      // insertion sort — nTerms is tiny and mostly sorted
      var i = 1
      while (i < nTerms) {
        val x = order(i); val dx = cursors(x).doc
        var j = i - 1
        while (j >= 0 && cursors(order(j)).doc > dx) { order(j + 1) = order(j); j -= 1 }
        order(j + 1) = x
        i += 1
      }
    }

    def offerAndAdvance(d: Long): Unit = {
      val s = scoreDoc(d)
      if (!java.lang.Double.isNaN(s)) heap.offer(d, s)
      var m = 0
      while (m < nTerms) { if (cursors(m).doc == d) cursors(m).next(); m += 1 }
    }

    var done = false
    while (!done) {
      sortOrder()
      if (cursors(order(0)).doc == Long.MaxValue) { done = true }
      else if (exhaustive) {
        val d = cursors(order(0)).doc
        if (deleted.contains(d)) {
          var m = 0
          while (m < nTerms) { if (cursors(m).doc == d) cursors(m).next(); m += 1 }
        } else offerAndAdvance(d)
      } else {
        val theta = math.max(heap.threshold, seedTheta)
        // find pivot: first prefix whose Σ UB exceeds θ (LM: the
        // background-sum bound joins the running total from the start)
        var acc = baseMax
        var p = -1
        var i = 0
        while (i < nTerms && p < 0) {
          val c = cursors(order(i))
          if (!c.exhausted) {
            acc += c.upperBound
            // >= not >: a doc that can only TIE θ still wins on the
            // docId-asc tiebreak when its id is smaller than the worst
            if (acc >= theta) p = i
          }
          i += 1
        }
        if (p < 0) done = true // no doc can beat θ
        else {
          val pivotDoc = cursors(order(p)).doc
          // extend the pivot across ties: a cursor beyond p sitting ON
          // pivotDoc also contributes to its score, and the block-max
          // rejection below only bounds cursors ≤ p — without the
          // extension a tied contributor makes the skip unsound (docs
          // silently dropped; caught by the tfidf rank-identity gate)
          while (p + 1 < nTerms && !cursors(order(p + 1)).exhausted &&
                 cursors(order(p + 1)).doc == pivotDoc) p += 1
          if (pivotDoc == Long.MaxValue) done = true
          else if (deleted.contains(pivotDoc)) {
            // DeletedDocumentList skip — consulted before scoring, like
            // the reference's bitmap check during evaluation
            var m = 0
            while (m < nTerms) { if (cursors(m).doc == pivotDoc) cursors(m).next(); m += 1 }
          }
          else if (cursors(order(0)).doc == pivotDoc) {
            // all cursors ≤ pivot sit on pivotDoc candidates — refine with
            // block-max bounds before full scoring
            var bacc = baseMax
            var j = 0
            while (j <= p) {
              val c = cursors(order(j))
              if (!c.exhausted) {
                c.advanceTo(pivotDoc) // aligns block for blockBound
                bacc += c.blockBound
              }
              j += 1
            }
            if (bacc >= theta) offerAndAdvance(pivotDoc)
            else {
              // BMW skip: jump past the shallowest current block boundary.
              // The bound `bacc` only covers cursors ≤ p, so the skip must
              // also stop BEFORE the next cursor's doc — docs from there on
              // can draw score from cursors > p.
              var nextD = Long.MaxValue
              var m = 0
              while (m <= p) {
                val c = cursors(order(m))
                if (!c.exhausted && c.blockLast < nextD) nextD = c.blockLast
                m += 1
              }
              if (p + 1 < nTerms) {
                val dNext = cursors(order(p + 1)).doc
                if (dNext != Long.MaxValue && dNext - 1 < nextD) nextD = dNext - 1
              }
              val target = math.max(pivotDoc, nextD) + 1
              var m2 = 0
              while (m2 <= p) { cursors(order(m2)).advanceTo(target); m2 += 1 }
            }
          } else {
            // advance the lagging cursors to the pivot
            var j = 0
            while (j < p) { cursors(order(j)).advanceTo(pivotDoc); j += 1 }
          }
        }
      }
    }
    heap.results
  }

  /** Bounded min-heap with docId-asc preference on ties — the
    * ScoredExtentAccumulator analogue
    * (reference: include/indri/ScoredExtentAccumulator.hpp:40-100).
    */
  final class TopKHeap(k: Int) {
    // ordering: WORST first. worse = lower score, or equal score and
    // LARGER docId (ties prefer smaller docId in the final ranking)
    private val q = new java.util.PriorityQueue[(Long, Double)](k + 1,
      (a: (Long, Double), b: (Long, Double)) => {
        val c = java.lang.Double.compare(a._2, b._2)
        if (c != 0) c else java.lang.Long.compare(b._1, a._1)
      })
    def threshold: Double =
      if (q.size < k) Double.NegativeInfinity else q.peek()._2
    def offer(docId: Long, score: Double): Unit = {
      if (q.size < k) q.add((docId, score))
      else {
        val worst = q.peek()
        if (score > worst._2 || (score == worst._2 && docId < worst._1)) {
          q.poll(); q.add((docId, score))
        }
      }
    }
    def results: Seq[(Long, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      val it = q.iterator()
      while (it.hasNext) out += it.next()
      out.sortBy { case (d, s) => (-s, d) }.toSeq
    }
  }
}

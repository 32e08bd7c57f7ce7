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
  * Scope: baseline okapi/tfidf bags with non-negative weights (the
  * flagship path), AND — round 3 — flat LM bags (dirichlet / jm /
  * two-stage) via `planLm`: a missing term contributes its background
  * score bg_t(dl) = s_t(0, dl) instead of 0, so the WAND algebra runs
  * on score = B(dl) + Σ effW·δ_t(tf, dl) with δ = s − bg ≥ 0 monotone
  * in tf and non-increasing in dl for all three LM methods; the pivot
  * bound is baseMax + Σ δ-upper-bounds where baseMax = B(minDl over
  * the query terms' posting lists) bounds every candidate's background
  * sum. Exact scores still fold children in query order with the real
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
    val terms = p.terms.map(_.term).toSeq
    val bcPlan = spark.sparkContext.broadcast(p)
    val bcDeleted = spark.sparkContext.broadcast(deleted)

    val segs0 = index.segments
      .where(col("term").isin(terms: _*))
      .select("term", "bucket", "firstDoc", "lastDoc", "numDocs", "maxTf",
        "minDl", "docsDelta", "tfs", "dls")
    // one task per docId-range bucket — NOT spark.sql.shuffle.partitions:
    // a query touches only |terms| posting lists, and padding it to the
    // session-wide partition count schedules mostly-empty tasks.
    // Pre-bucketed segments (bucketed table scan / persisted repartition)
    // skip the exchange entirely: the filter is narrow, so every task
    // already holds complete (term × bucket) groups — a hot term's
    // posting payload never crosses the wire per query.
    val segs =
      if (index.segmentsBucketed) segs0
      else if (index.numBuckets > 0) segs0.repartition(index.numBuckets, col("bucket"))
      else segs0.repartition(col("bucket"))

    val locals = segs.mapPartitions { rows =>
      val plan = bcPlan.value
      val nTerms = plan.terms.length
      // collect this partition's blocks per term, sorted by firstDoc
      val blocksByTerm = Array.fill(nTerms)(scala.collection.mutable.ArrayBuffer.empty[Block])
      val termIdx = plan.terms.iterator.map(_.term).zipWithIndex.toMap
      rows.foreach { r =>
        val ti = termIdx(r.getString(0))
        blocksByTerm(ti) += Block(
          r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5), r.getInt(6),
          r.getAs[Array[Byte]](7), r.getAs[Array[Byte]](8), r.getAs[Array[Byte]](9))
      }
      val cursors = plan.terms.indices.map { i =>
        new Cursor(blocksByTerm(i).sortBy(_.firstDoc).toArray, plan.terms(i))
      }.toArray
      wand(cursors, plan, k, exhaustive, seedTheta, bcDeleted.value).iterator
    }.toDF("docId", "score")

    // global merge of per-bucket top-k candidates
    locals.orderBy(col("score").desc, col("docId").asc).limit(k)
  }

  final case class Block(firstDoc: Long, lastDoc: Long, numDocs: Int,
                         maxTf: Int, minDl: Int,
                         docsDelta: Array[Byte], tfs: Array[Byte], dls: Array[Byte])

  /** Lazy-decoding posting cursor with block skipping: `advanceTo` hops
    * whole blocks via (firstDoc, lastDoc) without decoding — the skip
    * record analogue (reference: src/DiskDocListIterator.cpp:196-210).
    */
  final class Cursor(blocks: Array[Block], val plan: TermPlan) {
    private var bi = 0
    private var pos = 0
    private var docs: Array[Long] = null
    private var tfs: Array[Int] = null
    private var dls: Array[Int] = null
    var decodedBlocks = 0 // instrumentation for pruning tests

    private def ensureDecoded(): Unit = {
      if (docs == null && bi < blocks.length) {
        val b = blocks(bi)
        docs = BlockCodec.decodeDeltas(b.docsDelta, b.numDocs)
        tfs = BlockCodec.decodePlain(b.tfs, b.numDocs).map(_.toInt)
        dls = BlockCodec.decodePlain(b.dls, b.numDocs).map(_.toInt)
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

  /** The WAND loop with block-max refinement over one partition.
    *
    * @param seedTheta initial pruning threshold from topdocs candidate
    *   seeding (reference: src/WeightedAndNode.cpp:119-186). MUST be a
    *   lower bound of the true global k-th best score: the caller derives
    *   it from k distinct docs' score lower bounds, so any doc pruned by
    *   it is provably outside the top-k. Valid in every bucket task —
    *   it is a global bound.
    */
  def wand(cursors: Array[Cursor], plan: DaatPlan, k: Int,
           exhaustive: Boolean,
           seedTheta: Double = Double.NegativeInfinity,
           deleted: Set[Long] = Set.empty): Seq[(Long, Double)] = {
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

    // exact score of the doc all cursors in `matching` sit on; folds
    // children in ORIGINAL query order (bit-parity with DataFrame path).
    // LM mode: a missing child contributes its background score bg(dl)
    // with the DOC's length (read off any cursor sitting on the doc) —
    // exactly the combineBeliefs bg fill-in.
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

    var done = false
    while (!done) {
      sortOrder()
      if (cursors(order(0)).doc == Long.MaxValue) { done = true }
      else if (exhaustive) {
        val d = cursors(order(0)).doc
        if (!deleted.contains(d)) heap.offer(d, scoreCurrent(d))
        var i = 0
        while (i < nTerms) { if (cursors(i).doc == d) cursors(i).next(); i += 1 }
      } else {
        val theta = math.max(heap.threshold, seedTheta)
        // find pivot: first prefix whose Σ UB exceeds θ (LM: the
        // background-sum bound joins the running total from the start)
        var acc = plan.baseMax
        var p = -1
        var i = 0
        while (i < nTerms && p < 0) {
          val c = cursors(order(i))
          if (!c.exhausted) {
            acc += c.plan.upperBound
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
            var bacc = plan.baseMax
            var j = 0
            while (j <= p) {
              val c = cursors(order(j))
              if (!c.exhausted) {
                c.advanceTo(pivotDoc) // aligns block for blockBound
                bacc += c.blockBound
              }
              j += 1
            }
            if (bacc >= theta) {
              val s = scoreCurrent(pivotDoc)
              heap.offer(pivotDoc, s)
              var m = 0
              while (m < nTerms) { if (cursors(m).doc == pivotDoc) cursors(m).next(); m += 1 }
            } else {
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

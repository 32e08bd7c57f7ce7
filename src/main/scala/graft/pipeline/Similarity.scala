package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (Array[Float]).
  *
  * All arithmetic is done in DOUBLE with a fixed index-order summation
  * (zip_with then left-fold via `aggregate`) so results are
  * bit-reproducible and identical to an oracle that does the same —
  * never rely on an engine-internal dot-product whose order is
  * unspecified.
  *
  * Scale path: BANDED multi-table random-hyperplane LSH. `bands`
  * independent hash tables of `rowsPerBand` sign bits each; a pair is a
  * candidate when it collides in ANY band (recall knob = bands), and the
  * per-band bucket count 2^rowsPerBand bounds bucket population
  * (cost knob = rowsPerBand ≈ log2(N / targetBucketSize)). A single
  * table's within-bucket self-join goes quadratic as N grows past
  * 2^bits · bucketSize; banding keeps every join linear-ish while
  * recovering recall through independent tables — the same shape as
  * MinHash LSH banding (TextPipeline.minhashLshPairs).
  *
  * Soundness anchor for oracles: two IDENTICAL vectors produce the same
  * sign for every hyperplane, hence share every band bucket — planted
  * exact duplicates are found with probability 1, not just with high
  * probability.
  */
object Similarity {

  /** Σ a_i·b_i in index order, double precision. */
  def dotCol(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def normCol(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine as a native codegen'd Catalyst expression (no Seq[Float]
    * boxing, stays inside whole-stage codegen) — same index-order double
    * accumulation as the previous single-pass UDF, so values are
    * bit-identical to the dotCol/normCol column form and the oracles.
    */
  def cosineCol(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosine(a, b)

  /** Brute-force cosine top-k: every query row against every candidate.
    * The candidate side streams (one scan per partition of queries via a
    * broadcast of the (small) query set); ranking is a per-query window.
    * This is the exact baseline; `lshTopK` is the scale path.
    *
    * Output: (qid, nid, sim) with sim rounded to 6dp; rank by
    * (sim desc, nid asc) — rounding first makes cross-engine ordering
    * deterministic.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("nid"), col(vecCol).as("cv"))
    val pairs = c.crossJoin(broadcast(q)).where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(cosineCol(col("qv"), col("cv")), 6).as("sim"))
    topKBySim(pairs, k)
  }

  /** Shared ranking tail: top-k per qid over (qid, nid, sim) rows by
    * (sim desc, nid asc) — ONE definition so the rounding/tie-break
    * contract (oracle-critical: both engines must round and order
    * identically) lives in one place.
    */
  private def topKBySim(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    pairs.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select("qid", "nid", "sim", "rk")
  }

  /** Scalar int8 quantization with a per-vector symmetric absmax scale —
    * the memory-bound scale path for a 100-TB embedding store (4× smaller
    * than float32, int dot products). Cosine is SCALE-INVARIANT per
    * vector, so quantized cosine needs no dequantization and no stored
    * scale for similarity search. Rounding is floor(x·127/absmax + 0.5)
    * in double arithmetic — engine-portable (no HALF_UP vs
    * away-from-zero ambiguity between Spark and SQL engines); zero
    * vectors quantize to all-zero.
    *
    * Output: (idCol, qvec array<int>, scale double) — scale = absmax/127
    * reconstructs approximate floats when needed.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val absmax = array_max(transform(col(vecCol), x => abs(x.cast(DoubleType))))
    df.select(col(idCol), col(vecCol), absmax.as("__am"))
      .select(col(idCol),
        when(col("__am") === 0.0,
          transform(col(vecCol), _ => lit(0)))
          .otherwise(transform(col(vecCol),
            x => floor(x.cast(DoubleType) * 127.0 / col("__am") + 0.5).cast(IntegerType)))
          .as("qvec"),
        (col("__am") / 127.0).as("scale"))
  }

  /** Brute-force cosine top-k over int8-quantized vectors — the same
    * join/rank shape as [[bruteForceTopK]], with exact integer dot
    * products (values ≤ 127 keep every sum well inside double's exact
    * range, so cross-engine doubles match bit-for-bit before rounding).
    * Input frames carry (idCol, qvec) from [[quantizeInt8]].
    */
  def int8BruteForceTopK(queries: DataFrame, candidates: DataFrame,
                         idCol: String, k: Int): DataFrame = {
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x * y).cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
    // norms are pair-invariant: project them ONCE per side before the
    // cross join (the inlined form walked each vector 3× per PAIR).
    // sqrt(qq)·sqrt(cc) is the same doubles in the same order, so sim
    // stays bit-identical to the previous shape and the SQL oracle.
    val q = queries.select(col(idCol).as("qid"), col("qvec").as("qv"),
      sqrt(dot(col("qvec"), col("qvec"))).as("qn"))
    val c = candidates.select(col(idCol).as("nid"), col("qvec").as("cv"),
      sqrt(dot(col("qvec"), col("qvec"))).as("cn"))
    // zero-quantized vectors (absmax 0) have no direction: cosine 0.0,
    // never 0/0 = NaN (which Spark would rank above every real score)
    val sim = when(col("qn") === 0.0 || col("cn") === 0.0, lit(0.0))
      .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val pairs = c.crossJoin(broadcast(q)).where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), round(sim, 6).as("sim"))
    topKBySim(pairs, k)
  }

  /** deterministic hyperplanes: planes(band * rowsPerBand + r)(dim) */
  private def planes(dim: Int, bands: Int, rowsPerBand: Int,
                     seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(bands * rowsPerBand)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** (id, band, bucket) — one row per band per vector. The whole
    * signature (bands × rowsPerBand dot products) is computed in ONE UDF
    * pass over the vector (the planes live in a broadcast-sized closure);
    * a per-plane column expression would walk the array b·r times.
    */
  def hyperplaneBands(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                      bands: Int, rowsPerBand: Int, seed: Long = 42L): DataFrame = {
    val ps = planes(dim, bands, rowsPerBand, seed)
    val nb = bands; val rp = rowsPerBand
    val bucketsUdf = udf { (v: Seq[Float]) =>
      val out = new Array[Long](nb)
      var b = 0
      while (b < nb) {
        var sig = 0L
        var r = 0
        while (r < rp) {
          val p = ps(b * rp + r)
          var dot = 0.0
          var i = 0
          val n = math.min(v.length, p.length)
          while (i < n) { dot += v(i).toDouble * p(i); i += 1 }
          if (dot >= 0) sig |= (1L << r)
          r += 1
        }
        out(b) = sig
        b += 1
      }
      out.toSeq
    }
    df.select(col(idCol).as("id"), posexplode(bucketsUdf(col(vecCol))).as(Seq("band", "bucket")))
  }

  /** Distinct directed candidate pairs (qid, nid), qid ≠ nid: collide in
    * any band. The join is on (band, bucket) — never all-pairs; the
    * union-over-bands dedup is one distinct on two long ids.
    */
  def lshCandidates(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                    bands: Int, rowsPerBand: Int, seed: Long = 42L): DataFrame = {
    // persist: the banded projection feeds both sides of the self-join;
    // eagerly materialize the (tiny: two longs/row) candidate list so the
    // cache can be released immediately instead of leaking one cached
    // frame per lshTopK/embeddingNearDups call in long-lived sessions.
    val banded = hyperplaneBands(df, idCol, vecCol, dim, bands, rowsPerBand, seed)
      .persist()
    val a = banded.select(col("band"), col("bucket"), col("id").as("qid"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("nid"))
    val cands = a.join(b, Seq("band", "bucket"))
      .where(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
      .localCheckpoint()
    banded.unpersist()
    cands
  }

  /** exact-cosine ranking of a candidate pair set: top-k per query by
    * (sim desc, nid asc) — the shared tail of the LSH one-shot and
    * index-backed searches
    */
  private def rankTopK(cands: DataFrame, base: DataFrame, k: Int): DataFrame =
    rankTopKFor(cands, base, base, k)

  /** two-sided variant: query vectors from `qBase`, candidate vectors
    * from `cBase` (both (id, v))
    */
  private def rankTopKFor(cands: DataFrame, qBase: DataFrame,
                          cBase: DataFrame, k: Int): DataFrame = {
    val pairs = cands
      .join(qBase.select(col("id").as("qid"), col("v").as("qv")), "qid")
      .join(cBase.select(col("id").as("nid"), col("v").as("cv")), "nid")
      .select(col("qid"), col("nid"),
        round(cosineCol(col("qv"), col("cv")), 6).as("sim"))
    topKBySim(pairs, k)
  }

  /** A built LSH index: the persisted banded projection (band, bucket,
    * id) plus the persisted vectors — at scale both would be tables
    * bucketed by (band, bucket) / id; here they persist serialized so
    * repeated searches pay the bucket join only. Carries its hashing
    * knobs so EXTERNAL query sets hash with the identical hyperplanes
    * ([[lshSearchFor]]). `unpersist()` releases both frames.
    */
  final case class LshIndex(banded: DataFrame, base: DataFrame, dim: Int,
                            bands: Int, rowsPerBand: Int, seed: Long) {
    def unpersist(): Unit = { banded.unpersist(); base.unpersist(); () }
  }

  def buildLsh(df: DataFrame, idCol: String, vecCol: String, dim: Int,
               bands: Int = 8, rowsPerBand: Int = 6, seed: Long = 42L): LshIndex = {
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v")).persist(ser)
    val banded = hyperplaneBands(df, idCol, vecCol, dim, bands, rowsPerBand, seed)
      .persist(ser)
    LshIndex(banded, base, dim, bands, rowsPerBand, seed)
  }

  /** Search over a built LSH index: bucket-join candidates, exact-cosine
    * top-k (bit-identical to [[lshTopK]] on the same corpus/knobs).
    */
  def lshSearch(index: LshIndex, k: Int): DataFrame = {
    val a = index.banded.select(col("band"), col("bucket"), col("id").as("qid"))
    val b = index.banded.select(col("band"), col("bucket"), col("id").as("nid"))
    val cands = a.join(b, Seq("band", "bucket"))
      .where(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
    rankTopK(cands, index.base, k)
  }

  /** Search a built LSH index with an EXTERNAL query set (the serving
    * shape — query vectors need not be in the corpus): queries hash
    * through the index's own hyperplanes, bucket-join against the
    * persisted banded table, exact-cosine top-k against the indexed
    * vectors. A query identical to an indexed vector finds it with
    * probability 1 (same sign in every band). Query ids share the
    * corpus id space for the self-match guard (qid ≠ nid).
    */
  def lshSearchFor(index: LshIndex, queries: DataFrame,
                   idCol: String, vecCol: String, k: Int): DataFrame = {
    val qBase = queries.select(col(idCol).as("id"), col(vecCol).as("v"))
    val qb = hyperplaneBands(queries, idCol, vecCol, index.dim,
        index.bands, index.rowsPerBand, index.seed)
      .select(col("band"), col("bucket"), col("id").as("qid"))
    val cands = qb
      .join(index.banded.select(col("band"), col("bucket"), col("id").as("nid")),
        Seq("band", "bucket"))
      .where(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
    rankTopKFor(cands, qBase, index.base, k)
  }

  /** LSH-bucketed approximate top-k: exact cosine ranking over the banded
    * candidate set. Recall < 1 by construction for non-identical
    * neighbors (measured against bruteForceTopK in SimilaritySpec /
    * BENCH.md); identical vectors are found with probability 1.
    * One-shot (self-releasing caches); callers issuing repeated searches
    * should hold a [[buildLsh]] index instead.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
              bands: Int = 8, rowsPerBand: Int = 6, seed: Long = 42L): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val cands = lshCandidates(df, idCol, vecCol, dim, bands, rowsPerBand, seed)
    rankTopK(cands, base, k)
  }

  /** IVF coarse quantizer: spherical k-means (Lloyd's, fixed iteration
    * count, deterministic init from the first `ncells` vectors of the
    * hash-ordered training sample) — the standard inverted-file ANN
    * trainer. Centroids are driver-side (ncells × dim doubles, tiny);
    * assignment is one distributed pass. Everything is deterministic
    * for a deterministic corpus, so planted duplicates are provably
    * routed to their source's cell.
    */
  def ivfCentroids(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                   ncells: Int, iters: Int = 5,
                   trainPerCell: Int = 256): Array[Array[Double]] = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    def normalize(c: Array[Double]): Array[Double] = {
      var n = 0.0; var i = 0
      while (i < c.length) { n += c(i) * c(i); i += 1 }
      val s = math.sqrt(n)
      if (s == 0) c else c.map(_ / s)
    }
    // Bounded training sample — the standard IVF recipe (~trainPerCell
    // vectors per cell): training cost is FLAT in corpus size, while the
    // assignment pass (ivfTopK) stays full-corpus. Deterministic
    // pseudo-random draw: TakeOrdered on xxhash64(id) — one scan, no
    // full shuffle. The sample is ≤ ncells·trainPerCell vectors (a few
    // MB at the defaults), so it is collected ONCE and the Lloyd
    // iterations run driver-side at O(sample·dim·ncells) each — the
    // previous shape paid 2 Spark jobs PER iteration (assignment +
    // mean-collect) over the same driver-sized sample.
    val cap = math.min(ncells.toLong * trainPerCell, Int.MaxValue.toLong).toInt
    val train: Array[Array[Double]] =
      base.orderBy(xxhash64(col("id")), col("id")).limit(cap)
        .collect().map(_.getSeq[Float](1).toArray.map(_.toDouble))
    // init: the first ncells SAMPLE vectors — hash order is a
    // deterministic pseudo-random draw (the k-means init one wants),
    // and reusing the sample makes training exactly ONE corpus pass
    var cents: Array[Array[Double]] = train.take(ncells).map(v => normalize(v.clone()))
    val n = cents.length // < ncells only when the corpus is smaller
    var it = 0
    while (it < iters) {
      // assignment: nearest centroid by cosine (centroids unit-norm),
      // tie-break smaller cell id — same arithmetic as ivfAssignCells
      val sums = Array.fill(n)(new Array[Double](dim))
      val counts = Array.fill(n)(new Array[Long](dim))
      train.foreach { v =>
        var best = -1; var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < n) {
          val cent = cents(c)
          var dot = 0.0; var nv = 0.0
          var i = 0
          val m = math.min(v.length, cent.length)
          while (i < m) { val x = v(i); dot += x * cent(i); nv += x * x; i += 1 }
          val sim = if (nv == 0) -2.0 else dot / math.sqrt(nv)
          if (sim > bestSim) { bestSim = sim; best = c }
          c += 1
        }
        var i = 0
        val m = math.min(v.length, dim)
        while (i < m) { sums(best)(i) += v(i); counts(best)(i) += 1; i += 1 }
      }
      cents = Array.tabulate(n) { c =>
        if (counts(c).exists(_ > 0))
          normalize(Array.tabulate(dim)(d =>
            if (counts(c)(d) > 0) sums(c)(d) / counts(c)(d) else 0.0))
        else cents(c) // empty cells keep their centroid
      }
      it += 1
    }
    cents
  }

  /** (id, v, cell, …probe cells): per row, the `nProbe` nearest centroids
    * by cosine (tie-break: smaller cell id). `cell` = nearest.
    */
  private def ivfAssignCells(base: DataFrame, cents: Array[Array[Double]],
                             nProbe: Int): DataFrame = {
    val bc = base.sparkSession.sparkContext.broadcast(cents)
    val np = nProbe
    val probeUdf = udf { (v: Seq[Float]) =>
      val cs = bc.value
      val sims = new Array[Double](cs.length)
      var c = 0
      while (c < cs.length) {
        val cent = cs(c)
        var dot = 0.0; var nv = 0.0
        var i = 0
        val n = math.min(v.length, cent.length)
        while (i < n) { val x = v(i).toDouble; dot += x * cent(i); nv += x * x; i += 1 }
        sims(c) = if (nv == 0) -2.0 else dot / math.sqrt(nv) // centroids unit-norm
        c += 1
      }
      (0 until cs.length).sortBy(c0 => (-sims(c0), c0)).take(np)
    }
    base.withColumn("probes", probeUdf(col("v")))
      .withColumn("cell", element_at(col("probes"), 1))
  }

  /** A built IVF index: driver-side centroids + the persisted
    * per-vector assignment (id, v, cell, probes). The assignment IS the
    * inverted-file structure — at scale it would be written as a table
    * bucketed by cell, exactly like term postings; here it persists
    * serialized so repeated searches pay probe cost only (the
    * build-once / query-many split every other index in this engine
    * uses). `unpersist()` releases it.
    */
  final case class IvfIndex(cents: Array[Array[Double]], assigned: DataFrame) {
    def unpersist(): Unit = { assigned.unpersist(); () }
  }

  /** Train the coarse quantizer and assign every corpus vector its cell
    * plus its `nProbe` nearest probe cells in ONE distributed pass.
    */
  def buildIvf(df: DataFrame, idCol: String, vecCol: String, dim: Int,
               ncells: Int = 16, nProbe: Int = 2, iters: Int = 5,
               trainPerCell: Int = 256): IvfIndex = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val cents = ivfCentroids(df, idCol, vecCol, dim, ncells, iters, trainPerCell)
    val assigned = ivfAssignCells(base, cents, nProbe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    IvfIndex(cents, assigned)
  }

  /** Probe search over a built index: every indexed vector queries its
    * `nProbe` cells and ranks the union by exact cosine. Query-side
    * cost is ~nProbe/ncells of the corpus per query.
    */
  def ivfSearch(index: IvfIndex, k: Int): DataFrame = {
    val corpus = index.assigned
      .select(col("cell"), col("id").as("nid"), col("v").as("cv"))
    val queries = index.assigned
      .select(col("id").as("qid"), col("v").as("qv"), explode(col("probes")).as("cell"))
    val pairs = queries.join(corpus, Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(cosineCol(col("qv"), col("cv")), 6).as("sim"))
    topKBySim(pairs, k)
  }

  /** Search a built IVF index with an EXTERNAL query set (the serving
    * shape): each query vector is routed to its `nProbe` nearest
    * centroids on the fly (tiny broadcast, no corpus pass) and ranks
    * its probed inverted lists by exact cosine. A query identical to an
    * indexed vector probes that vector's cell deterministically (equal
    * cosine to every centroid, same tie-break). Query ids share the
    * corpus id space for the self-match guard (qid ≠ nid).
    */
  def ivfSearchFor(index: IvfIndex, queries: DataFrame,
                   idCol: String, vecCol: String, k: Int,
                   nProbe: Int = 2): DataFrame = {
    val qBase = queries.select(col(idCol).as("id"), col(vecCol).as("v"))
    val corpus = index.assigned
      .select(col("cell"), col("id").as("nid"), col("v").as("cv"))
    val probed = ivfAssignCells(qBase, index.cents, nProbe)
      .select(col("id").as("qid"), col("v").as("qv"), explode(col("probes")).as("cell"))
    val pairs = probed.join(corpus, Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(cosineCol(col("qv"), col("cv")), 6).as("sim"))
    topKBySim(pairs, k)
  }

  /** IVF approximate top-k: corpus partitioned into per-centroid lists;
    * each query probes its `nProbe` nearest cells and ranks the union by
    * exact cosine. One-shot convenience over buildIvf + ivfSearch (the
    * single corpus-assignment pass serves both the corpus and the query
    * side — the previous shape assigned twice); callers issuing repeated
    * searches should hold the IvfIndex instead. Self-releasing like
    * [[lshCandidates]]: the result materializes eagerly so the index's
    * persisted assignment can be dropped before returning — otherwise
    * every one-shot call pinned a serialized corpus copy for the session
    * lifetime (the handle was discarded, so nothing could unpersist it).
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int,
              ncells: Int = 16, nProbe: Int = 2, iters: Int = 5): DataFrame = {
    val index = buildIvf(df, idCol, vecCol, dim, ncells, nProbe, iters)
    val out = ivfSearch(index, k).localCheckpoint()
    index.unpersist()
    out
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): semantic dedup keyed on
    * the IVF coarse quantizer — vectors are compared ONLY within their
    * k-means cell, pairs at/above the cosine threshold form duplicate
    * groups (connected components via the O(log n) large-star/small-star
    * pass), and each group keeps its minimum id. Returns
    * (id, keeper, is_dup) for every indexed vector.
    *
    * The within-cell restriction is the scale story: candidate volume is
    * Σ_cell |cell|² instead of N², cells shard like term postings, and
    * the same persisted [[IvfIndex]] serves ANN search and dedup.
    * Identical vectors are provably co-celled (equal cosine to every
    * centroid, deterministic tie-break), so planted exact duplicates are
    * found with probability 1 — the oracle anchor.
    */
  def semanticDedup(index: IvfIndex, threshold: Double): DataFrame = {
    val cells = index.assigned.select(col("cell"), col("id"), col("v"))
    val pairs = cells
      .join(cells.select(col("cell"), col("id").as("b"), col("v").as("vb")),
        Seq("cell"))
      .where(col("id") < col("b"))
      .select(col("id").as("a"), col("b"),
        round(cosineCol(col("v"), col("vb")), 6).as("sim"))
      .where(col("sim") >= threshold)
    TextPipeline.connectedComponentsStar(
        index.assigned.select(col("id")), "id", pairs)
      .withColumn("is_dup", (col("id") =!= col("comp")).cast(IntegerType))
      .select(col("id"), col("comp").as("keeper"), col("is_dup"))
  }

  /** Embedding-cosine near-duplicate detection: undirected pairs (a < b)
    * above threshold. Candidates from banded LSH, exact cosine check.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                        threshold: Double, bands: Int = 8, rowsPerBand: Int = 6,
                        seed: Long = 42L): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val cands = lshCandidates(df, idCol, vecCol, dim, bands, rowsPerBand, seed)
      .where(col("qid") < col("nid"))
      .select(col("qid").as("a"), col("nid").as("b"))
    cands
      .join(base.select(col("id").as("a"), col("v").as("va")), "a")
      .join(base.select(col("id").as("b"), col("v").as("vb")), "b")
      .select(col("a"), col("b"), round(cosineCol(col("va"), col("vb")), 6).as("sim"))
      .where(col("sim") >= threshold)
  }
}

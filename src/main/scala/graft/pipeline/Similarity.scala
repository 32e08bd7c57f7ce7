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

  /** Single-pass cosine UDF. Each accumulator (dot, |a|², |b|²) folds in
    * index order with its own addition chain, so values are bit-identical
    * to the dotCol/normCol column form — but one tight loop instead of
    * three boxed higher-order folds (~5× on the brute-force path).
    */
  private val cosineUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineCol(a: Column, b: Column): Column = cosineUdf(a, b)

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
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    pairs.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select("qid", "nid", "sim", "rk")
  }

  /** Random-hyperplane LSH bucketing (SimHash for vectors): sign-bit
    * signature of `nBits` fixed pseudo-random hyperplanes (deterministic
    * from `seed`). Vectors sharing a bucket are candidate neighbors —
    * the IVF/LSH scale path: top-k search only within buckets.
    */
  def hyperplaneBuckets(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, nBits: Int = 8, seed: Long = 42L): DataFrame = {
    val rng = new scala.util.Random(seed)
    val planes: Array[Array[Double]] =
      Array.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))
    val bitCols = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      val dot = aggregate(
        zip_with(col(vecCol), planeLit, (x, y) => x.cast(DoubleType) * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    df.select(col(idCol), col(vecCol),
      bitCols.reduce(_ + _).as("bucket"))
  }

  /** LSH-bucketed approximate top-k: exact cosine ranking within each
    * bucket. Recall < 1 by construction; the bench compares it to
    * bruteForceTopK for recall/speed.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
              k: Int, nBits: Int = 8, seed: Long = 42L): DataFrame = {
    val b = hyperplaneBuckets(df, idCol, vecCol, dim, nBits, seed).persist()
    val a = b.select(col("bucket"), col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = b.select(col("bucket"), col(idCol).as("nid"), col(vecCol).as("cv"))
    val pairs = a.join(c, Seq("bucket")).where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(cosineCol(col("qv"), col("cv")), 6).as("sim"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid").asc)
    pairs.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select("qid", "nid", "sim", "rk")
  }

  /** Embedding-cosine near-duplicate detection: pairs above threshold.
    * Candidates come from LSH buckets (scale path), exact cosine check.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                        threshold: Double, nBits: Int = 6, seed: Long = 42L): DataFrame = {
    val b = hyperplaneBuckets(df, idCol, vecCol, dim, nBits, seed).persist()
    val a = b.select(col("bucket"), col(idCol).as("a"), col(vecCol).as("va"))
    val c = b.select(col("bucket"), col(idCol).as("b"), col(vecCol).as("vb"))
    a.join(c, Seq("bucket")).where(col("a") < col("b"))
      .select(col("a"), col("b"), round(cosineCol(col("va"), col("vb")), 6).as("sim"))
      .where(col("sim") >= threshold)
      .distinct()
  }
}

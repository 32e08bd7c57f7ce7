package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Measurement probe (not a test): IVF recall@5 vs nProbe against the
  * exact brute-force baseline on the sf0.01 embeddings — the numbers in
  * BENCH.md's ANN quality section. Run with
  * `sbt "Test/runMain graft.IvfRecallProbe [sfDir]"`.
  *
  * Gaussian fixtures are the WORST case for any space-partitioning ANN
  * (no cluster structure), so these are floor numbers; identical-vector
  * queries recall 1.0 at any setting (SimilaritySpec).
  */
object IvfRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkTestBase.spark
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val brute = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = Similarity.buildIvf(emb, "vec_id", "embedding", dim = 64,
      ncells = 16, nProbe = 8)
    try {
      Seq(1, 2, 4, 8).foreach { np =>
        val got = Similarity.ivfSearchFor(idx, emb, "vec_id", "embedding",
            k = 5, nProbe = np)
          .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (brute intersect got).size.toDouble / brute.size
        println(f"IVF_RECALL n=$n%d ncells=16 nProbe=$np%d recall@5=$recall%.3f corpusFrac=${np / 16.0}%.3f")
      }
    } finally idx.unpersist()
  }
}

package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PageRank over a link table — the harvestlinks/pagerank auxiliary
  * (reference: src/PageRank.cpp:103-117 accumulate srcPR/outDegree then
  * dampen `pr = c·pr + (1−c)/N`; defaults c=0.7, maxIters=10,
  * include/indri/PageRank.hpp:134; missing sources contribute the
  * initial (1−c)/N, PageRank.cpp:76-83).
  *
  * Dangling mass is dropped exactly like the reference (only docs with
  * out-links redistribute score). Fully DataFrame-iterative: each
  * iteration is one join+agg; ranks stay distributed.
  */
object PageRank {

  /** @param edges (src, dst) distinct link table
    * @param nodes one-column node universe (defines N and the output rows)
    */
  def compute(nodes: DataFrame, edges: DataFrame, c: Double = 0.7,
              iterations: Int = 10): DataFrame = {
    val n = nodes.count().toDouble
    val base = (1.0 - c) / n
    val node = nodes.columns.head
    val outDeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = edges.join(outDeg, "src")
    val eCached = e.persist()
    var pr = nodes.select(col(node).as("id"), lit(base).as("pr"))
    for (_ <- 1 to iterations) {
      val contrib = eCached.join(pr, eCached("src") === pr("id"), "inner")
        .select(col("dst").as("id"), (col("pr") / col("outdeg")).as("w"))
        .groupBy("id").agg(sum("w").as("acc"))
      pr = pr.select(col("id")).join(contrib, Seq("id"), "left")
        .select(col("id"), (lit(c) * coalesce(col("acc"), lit(0.0)) + base).as("pr"))
        // truncate lineage each iteration — 10 chained join plans
        // otherwise grow the optimizer time superlinearly
        .localCheckpoint(true)
    }
    // the final ranks are an eager localCheckpoint — they no longer
    // reference the edge cache, so release it before returning
    eCached.unpersist(false)
    pr
  }
}

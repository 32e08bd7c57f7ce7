package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round side benchmarks (guide §1.4 noop-style isolation).
  * Separate main so the frozen driver-contract Bench stays untouched.
  *
  * Modes (first arg):
  *  - pagerank-lab: times PageRank.compute at several lineage-truncation
  *    cadences over a synthetic 200k-node/600k-edge graph and a 20-node
  *    graph (the two driver fixture scales), medians of R reps after an
  *    untimed warmup rep. Prints one JSON line.
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
    if (java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
      b.config("spark.local.dir", "/dev/shm/spark-local")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def medianD(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "pagerank-lab"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = session(cpus)
    try {
      mode match {
        case "pagerank-lab" =>
          // deterministic harvest-shaped graph: n nodes, 3 out-edges each
          def graph(n: Long): (DataFrame, DataFrame) = {
            val nodes = spark.range(0, n).toDF("id")
            val e = nodes
              .select(col("id").as("src"),
                explode(array(
                  (col("id") * 7 + 1) % n,
                  (col("id") * 13 + 3) % n,
                  (col("id") + 17) % n)).as("dst"))
              .where(col("src") =!= col("dst")).distinct()
            (nodes, e)
          }
          val cadences = Seq(1, 2, 4, 10)
          val out = Seq(200000L, 20L).map { n =>
            val (nodes, edges) = graph(n)
            nodes.count(); edges.count()
            // untimed JIT warmup at this scale
            graft.pipeline.PageRank.compute(nodes, edges, 0.7, 10, 1).count()
            val rows = cadences.map { ck =>
              val ts = (1 to reps).map { _ =>
                val t0 = System.nanoTime()
                graft.pipeline.PageRank.compute(nodes, edges, 0.7, 10, ck).count()
                (System.nanoTime() - t0) / 1e9
              }
              s""""ckpt_every_$ck":{"median":${medianD(ts)},"reps":${ts.mkString("[", ",", "]")}}"""
            }
            s""""n_$n":{${rows.mkString(",")}}"""
          }
          println(s"""{"metric":"pagerank_lab","cpus":$cpus,${out.mkString(",")}}""")
        case other =>
          System.err.println(s"unknown mode: $other")
      }
    } finally spark.stop()
  }
}

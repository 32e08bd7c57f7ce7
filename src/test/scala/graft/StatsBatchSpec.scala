package graft

import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{Engine, QueryParser, ScoringRule}

/** The stats round for complex leaves is ONE Spark job regardless of
  * leaf count (reference: src/QueryEnvironment.cpp:957-966 — a single
  * _sumServerQuery over the whole ContextCountGraph), and the batched
  * stats feed the same combiner arithmetic as independently-evaluated
  * children.
  */
class StatsBatchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta alpha gamma delta"),
    (2L, "beta beta delta alpha"),
    (3L, "alpha delta delta delta beta gamma"),
    (4L, "gamma gamma alpha beta")
  )
  private val cfg = IndexConfig(analyzerMode = "simple", blockSize = 8, numBuckets = 2)
  private lazy val index = IndexBuilder.build(corpus.toDF("docId", "content"), cfg)
  private lazy val eng = new Engine(spark, index, cfg.analyzer, ScoringRule(method = "dirichlet"))

  private val query = "#combine(#od1(alpha beta) #uw4(beta delta) #syn(alpha gamma))"

  test("belief construction runs exactly 2 driver actions: term-stats collect + ONE batched complex-leaf stats collect") {
    eng.evaluate(QueryParser.parse(query)).df.collect() // warm index build / caches
    // count SQL executions (= driver-blocking actions); AQE fans one
    // action into several scheduler jobs, so job count is not the metric
    val actions = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case _: SparkListenerSQLExecutionStart => actions.incrementAndGet()
        case _ =>
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      eng.evaluate(QueryParser.parse(query)) // construction only — no action on the belief df
      // the listener bus is async: wait for the count to go quiescent
      var last = -1; var stable = 0
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (stable < 5 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val v = actions.get()
        if (v == last) stable += 1 else { stable = 0; last = v }
      }
      assert(actions.get() == 2,
        s"expected 2 actions for a 3-complex-leaf query (term stats + batched leaf stats), saw ${actions.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("batched stats scores == query-order fold of independently-evaluated children") {
    val whole = eng.evaluate(QueryParser.parse(query)).df
      .select("docId", "score").as[(Long, Double)].collect().toMap
    val parts = Seq("#od1(alpha beta)", "#uw4(beta delta)", "#syn(alpha gamma)")
      .map(q => eng.evaluate(QueryParser.parse(q)))
    val partMaps = parts.map(_.df.select("docId", "score").as[(Long, Double)].collect().toMap)
    val doclens = index.doclens.select("docId", "length").as[(Long, Int)].collect().toMap
    val w = 1.0 / parts.length
    val candidates = partMaps.flatMap(_.keySet).toSet
    assert(candidates.nonEmpty && whole.keySet == candidates)
    candidates.foreach { d =>
      var acc = 0.0
      parts.indices.foreach { i =>
        acc += w * partMaps(i).getOrElse(d, parts(i).bg(doclens(d)))
      }
      assert(whole(d) == acc, s"doc $d: ${whole(d)} vs $acc")
    }
  }
}

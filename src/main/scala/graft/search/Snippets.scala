package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.analysis.Analyzer

/** Query-match snippets — the SnippetBuilder analogue
  * (reference: src/SnippetBuilder.cpp:104-187: match extents are merged
  * into regions no wider than `windowWidth` positions, best regions are
  * emitted in document order, matched words highlighted).
  *
  * Simplifications vs the reference (documented, deterministic):
  * regions greedily merge consecutive matches while the span stays
  * within `windowWidth`; every region is kept (the reference keeps the
  * best until a word budget is spent); highlight marker is `<b>…</b>`
  * like the reference's HTML mode.
  */
object Snippets {

  def build(
      docs: DataFrame,           // must carry (idCol, contentCol)
      query: String,
      analyzer: Analyzer,
      windowWidth: Int = 12,
      idCol: String = "docId",
      contentCol: String = "content"
  ): DataFrame = {
    val terms = QueryParser.termLeaves(QueryParser.parse(query))
      .flatMap(t => Option(analyzer.processTerm(t))).toSet
    val az = analyzer
    val snippetUdf = udf { (content: String) =>
      val slots = az.analyze(content)
      val raw = az.rawTokens(content)
      val matches = slots.indices.filter(i => slots(i) != null && terms.contains(slots(i)))
      if (matches.isEmpty) null
      else {
        // merge matches into regions within windowWidth (reference:
        // SnippetBuilder.cpp:123-146 newEnd - region.begin > windowWidth)
        val regions = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        var rb = matches.head
        var re = matches.head + 1
        matches.tail.foreach { m =>
          if (m + 1 - rb > windowWidth) { regions += ((rb, re)); rb = m; re = m + 1 }
          else re = m + 1
        }
        regions += ((rb, re))
        val matchSet = matches.toSet
        regions.map { case (b, e) =>
          val cb = math.max(0, b - 2)
          val ce = math.min(raw.length, e + 2)
          (cb until ce).map { i =>
            if (matchSet.contains(i)) s"<b>${raw(i)}</b>" else raw(i)
          }.mkString(" ")
        }.mkString(" ... ")
      }
    }
    docs.withColumn("snippet", snippetUdf(col(contentCol)))
      .where(col("snippet").isNotNull)
      .select(col(idCol), col("snippet"))
  }
}

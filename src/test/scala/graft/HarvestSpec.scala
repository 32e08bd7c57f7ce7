package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.index.{FieldAnnotators, IndexBuilder, IndexConfig}
import graft.pipeline.HarvestLinks

/** harvestlinks analogue (reference: harvestlinks/harvestlinks.cpp,
  * src/AnchorTextHarvester.cpp): link harvest, the non-empty-anchor
  * guard, single-hop redirect conflation, off-corpus drop at
  * resolution, deterministic anchor aggregation, and the
  * AnchorTextAnnotator hand-off into the index's appendText path.
  */
class HarvestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def a(href: String, text: String) = s"""<a href="$href">$text</a>"""

  private lazy val web = Seq(
    (1L, "http://s.test/p1",
      "<p>intro</p>" + a("http://s.test/p2", "go two") +
        a("http://s.test/p3", "  ") +             // whitespace-only anchor → DROPPED
        a("http://ext.test/x", "offsite page")),  // off-corpus → drops at resolve only
    (2L, "http://s.test/p2",
      a("http://old.test/r1", "via redirect") +   // conflates to p3
        a("http://s.test/p2", "self loop")),      // same-domain+self kept (filter commented out in the reference)
    (3L, "http://s.test/p3", "<p>no links here</p>")
  ).toDF("doc_id", "url", "html")

  private lazy val redirects = Seq(
    ("http://old.test/r1", "http://s.test/p3"),
    // a chain: r2 → old r1 → p3. The reference does ONE keyfile lookup
    // per link (AnchorTextHarvester.cpp:138-155) — chains do NOT follow.
    ("http://old.test/r2", "http://old.test/r1")
  ).toDF("from_url", "to_url")

  test("harvest: extraction, term-stream anchors, ordinals survive the empty-anchor drop") {
    val links = HarvestLinks.harvest(web).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getString(3), r.getString(4))).toSet
    assert(links == Set(
      (1L, 0, "http://s.test/p2", "go two"),
      // ord 1 (whitespace anchor) dropped; ord 2 keeps its position
      (1L, 2, "http://ext.test/x", "offsite page"),
      (2L, 0, "http://old.test/r1", "via redirect"),
      (2L, 1, "http://s.test/p2", "self loop")))
  }

  test("conflate: one redirect hop, chains not followed") {
    val chained = Seq((9L, "http://s.test/p9", a("http://old.test/r2", "deep chain")))
      .toDF("doc_id", "url", "html")
    val out = HarvestLinks.conflate(
        HarvestLinks.harvest(web.union(chained)), redirects)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3))).toSet
    assert(out.contains((2L, 0, "http://s.test/p3")))      // r1 → p3
    assert(out.contains((9L, 0, "http://old.test/r1")))    // r2 → r1, NOT p3
    assert(out.contains((1L, 0, "http://s.test/p2")))      // non-redirect untouched
  }

  test("resolve + anchorText: off-corpus drop, deterministic aggregation order") {
    val resolved = HarvestLinks.resolve(
      HarvestLinks.conflate(HarvestLinks.harvest(web), redirects),
      web.select(col("url"), col("doc_id")))
    val edges = resolved.select("src_doc", "dst_doc").as[(Long, Long)].collect().toSet
    assert(edges == Set((1L, 2L), (2L, 3L), (2L, 2L))) // ext.test dropped
    val at = HarvestLinks.anchorText(resolved).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(at(2L) == ((2L, "go two self loop"))) // (src,ord) order: (1,0) then (2,1)
    assert(at(3L) == ((1L, "via redirect")))
  }

  test("anchor text feeds appendText: target doclen grows by the anchor term count") {
    val cfg = IndexConfig(analyzerMode = "simple", blockSize = 64, numBuckets = 2)
    val docs = web.select(col("doc_id").as("docId"),
      regexp_replace(col("html"), "<[^>]*>", " ").as("content"))
    val resolved = HarvestLinks.resolve(
      HarvestLinks.conflate(HarvestLinks.harvest(web), redirects),
      web.select(col("url"), col("doc_id")))
    val anchors = HarvestLinks.anchorText(resolved)
      .select(col("dst_doc").as("docId"), col("anchors"))
    val withAnchors = docs.join(anchors, Seq("docId"), "left")

    val base = IndexBuilder.build(docs, cfg)
    val aug = IndexBuilder.build(withAnchors, cfg,
      FieldAnnotators.appendText("anchors", cfg.analyzer))
    val dl = base.doclens.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val dlA = aug.doclens.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dlA(1L) == dl(1L))          // no in-links
    assert(dlA(2L) == dl(2L) + 4)      // "go two self loop"
    assert(dlA(3L) == dl(3L) + 2)      // "via redirect"
    // the appended anchor terms become searchable on the TARGET: the
    // phrase lives only in source doc2's visible text at base, and on
    // doc3 too once its in-link anchors append
    def hits(idx: graft.index.InvertedIndex) =
      new graft.search.Engine(spark, idx, cfg.analyzer,
        graft.search.ScoringRule(method = "okapi"))
        .runQuery("#od1(via redirect)", 10).collect().map(_.getLong(0)).toSet
    assert(hits(base) == Set(2L))
    assert(hits(aug) == Set(2L, 3L))
  }
}

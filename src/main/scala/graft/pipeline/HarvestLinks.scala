package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Anchor/link-graph harvesting over an HTML-ish corpus — the
  * `harvestlinks` application analogue (reference:
  * harvestlinks/harvestlinks.cpp, src/AnchorTextHarvester.cpp).
  *
  * The reference walks each parsed document's tag extents and emits a
  * link record whenever an `absolute-url`/`relative-url` extent is
  * immediately followed by a non-empty `<a>` anchor-text extent
  * (src/AnchorTextHarvester.cpp:118-135 — note the `extent.end -
  * extent.begin > 0` guard: links whose anchor has no terms are
  * DROPPED). Each record carries (target-url, source-page-url, anchor
  * terms space-joined) (AnchorTextHarvester.cpp:154-176), with the
  * target conflated through an optional redirect map first
  * (AnchorTextHarvester.cpp:138-155, one keyfile lookup = one hop).
  * A separate doc-order file maps page-url → docno
  * (AnchorTextHarvester.cpp:96-107) so the sorted merge can resolve
  * in-corpus targets; same-domain links are KEPT (the domain filter at
  * AnchorTextHarvester.cpp:126-130 is commented out in the reference).
  * The reference hashes URL keyfile keys longer than 511 bytes
  * (SHA1, AnchorTextHarvester.cpp:100-107) — a keyfile storage detail
  * with no analogue here: Spark join keys have no length limit.
  *
  * Spark-first shape: ONE scan of the corpus with codegen'd
  * `regexp_extract_all` projections (href group + anchor group),
  * `posexplode` for link ordinals, then plain joins for redirect
  * conflation and docno resolution. No UDFs, no collect — the link
  * table is a shuffle-free projection of the corpus scan, the
  * conflation is a broadcast-sized left join on the redirect table,
  * and resolution is one equi-join on url. At 100 TB the harvest is
  * embarrassingly parallel; only resolve() shuffles (on dst_url), the
  * same key a billion-edge web graph shards on.
  */
object HarvestLinks {

  /** `<a href="…">anchor</a>` — the HTMLParser extent pair this engine
    * consumes as markup (reference: src/HTMLParser.cpp:58-59 binds the
    * absolute-url/relative-url tags, the anchor extent follows).
    */
  private val LinkPattern = "<a href=\"([^\"]+)\">([^<]*)</a>"

  /** Harvest the raw link table from an HTML-ish corpus.
    *
    * @param docs    (idCol, urlCol, htmlCol) corpus
    * @return (src_doc, src_url, link_ord, dst_url, anchor) — one row
    *         per href whose anchor extent has ≥1 term; `anchor` is the
    *         space-joined simple-token stream of the anchor text
    *         (the reference emits terms, not raw bytes:
    *         AnchorTextHarvester.cpp:163-172), `link_ord` the 0-based
    *         in-document link ordinal.
    */
  def harvest(docs: DataFrame, idCol: String = "doc_id",
              urlCol: String = "url", htmlCol: String = "html"): DataFrame = {
    // materialize both regexp projections ONCE before the explode —
    // inlining a regexp into a downstream lambda re-evaluates it per
    // element access (TextPipeline.withTokens trap, measured 16.2→0.5s)
    val extracted = docs.select(
      col(idCol).as("src_doc"), col(urlCol).as("src_url"),
      expr(s"regexp_extract_all($htmlCol, '$LinkPattern', 1)").as("__hrefs"),
      expr(s"regexp_extract_all($htmlCol, '$LinkPattern', 2)").as("__anchors"))
    extracted
      .select(col("src_doc"), col("src_url"),
        posexplode(arrays_zip(col("__hrefs"), col("__anchors"))))
      .select(col("src_doc"), col("src_url"), col("pos").as("link_ord"),
        col("col.__hrefs").as("dst_url"),
        array_join(expr("regexp_extract_all(lower(col.__anchors), '[a-z0-9]+', 0)"), " ")
          .as("anchor"))
      .where(col("dst_url").isNotNull && col("anchor") =!= "")
  }

  /** Conflate link targets through a redirect map — ONE hop, exactly
    * the reference's single redirectKeyfile lookup per link
    * (AnchorTextHarvester.cpp:138-155; chains are not followed).
    *
    * @param redirects (from_url, to_url); broadcast when small — the
    *                  planner does this automatically under AQE, and a
    *                  web-scale redirect set shuffles on from_url like
    *                  any dimension join.
    */
  def conflate(links: DataFrame, redirects: DataFrame): DataFrame =
    links.join(redirects, links("dst_url") === redirects("from_url"), "left")
      .select(links("src_doc"), links("src_url"), links("link_ord"),
        coalesce(redirects("to_url"), links("dst_url")).as("dst_url"),
        links("anchor"))

  /** Resolve in-corpus targets: join dst_url against the doc-order
    * (url → docno) table (the harvestlinks sorted-merge step,
    * harvestlinks.cpp + AnchorTextHarvester.cpp:96-107). Off-corpus
    * targets drop (inner join) — the reference's merge only emits
    * anchor records for pages present in the docno keyfile.
    *
    * @param docOrder (url, doc_id) page universe
    * @return links + dst_doc
    */
  def resolve(links: DataFrame, docOrder: DataFrame,
              urlCol: String = "url", idCol: String = "doc_id"): DataFrame =
    links.join(docOrder.select(col(urlCol).as("__u"), col(idCol).as("dst_doc")),
        links("dst_url") === col("__u"))
      .drop("__u")

  /** Per-target anchor-text aggregation — the record the reference's
    * AnchorTextAnnotator consumes per document (src/AnchorTextAnnotator
    * .cpp:56-77 reads LINKS=n then n anchor lines and appends their
    * terms to the target's token stream; feed the `anchors` column to
    * [[graft.index.FieldAnnotators.appendText]] for that step).
    * Anchors concatenate in deterministic (src_doc, link_ord) order so
    * the appended token stream is reproducible under any partitioning.
    */
  def anchorText(resolved: DataFrame): DataFrame =
    resolved
      .groupBy(col("dst_doc"))
      .agg(count(lit(1)).as("n_inlinks"),
        array_join(transform(array_sort(collect_list(struct(
            col("src_doc"), col("link_ord"), col("anchor")))),
          s => s("anchor")), " ").as("anchors"))
}

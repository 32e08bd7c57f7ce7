package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.SegmentStore

/** The modifyfields application surface (reference:
  * modifyfields/ModifyFields.cpp): add or remove indexed fields of an
  * existing repository without re-parsing the collection. Added fields
  * come from an OFFSET ANNOTATIONS file — 8-column tab-delimited
  * (docno, TAG|ATTRIBUTE, id, name, start, length, value, parentid
  * [, debug]) with start/length in byte space
  * (reference: src/OffsetAnnotationAnnotator.cpp:20-55).
  *
  * Parameter surface (ModifyFields.cpp:19-55): `index`, `annotations`
  * (single file), `addField.field{name,numeric}`*, `removeField{name}`*,
  * `fileclass` and `memory` (parse as no-ops — conflations and sort
  * budgets are container/file details). One deviation: `corpus` names
  * the source table — the reference re-reads document text from its
  * CompressedCollection, and this engine's collection IS the input
  * table (SURVEY §1.9), which the repository does not copy.
  *
  * Byte→token conversion follows convert_annotations
  * (OffsetAnnotationAnnotator.cpp:255-400): a tag activates at the
  * first token its begin precedes the end of (rounding to the nearer
  * token boundary via the integer-midpoint rule), closes at the first
  * LATER token whose end reaches the tag's end (same midpoint rule),
  * zero-token-length tags drop, unclosed tags run to the document end,
  * and bounds clamp to [0, size−1] / [1, size]. ATTRIBUTE rows are
  * accepted and ignored — field surgery stores extents, not tag
  * attributes. TAG `value` becomes the extent's numeric payload
  * (the NumericField path for annotation-sourced fields).
  *
  * The reference refuses to run over pending deletes ("compact with
  * dumpindex first", ModifyFields.cpp:276-284); stored repositories
  * here never carry a pending-delete sidecar (deletes are runtime
  * state compacted by Repository.compactDeletes), so the guard is
  * structural.
  */
object ModifyFieldsApp {

  final case class FieldAdd(name: String, numeric: Boolean)

  final case class Params(
      indexPath: String = "",
      corpus: String = "",
      annotations: String = "",
      addFields: Seq[FieldAdd] = Nil,
      removeFields: Seq[String] = Nil)

  def parseParams(xml: String): Params = fromTree(ParamTree.parseXml(xml))

  def fromTree(t: ParamTree): Params = Params(
    indexPath = t.get("index", ""),
    corpus = t.get("corpus", ""),
    annotations = t.get("annotations", ""),
    addFields = t.all("addField").flatMap(_.all("field")).map { f =>
      FieldAdd(f.get("name", "").toLowerCase(java.util.Locale.ROOT),
        f.getBool("numeric", default = false))
    },
    removeFields = t.all("removeField").flatMap(_.all("name").map(_.value))
      .distinct.map(_.toLowerCase(java.util.Locale.ROOT)))

  def overlay(p: Params, args: Seq[String]): Params =
    args.foldLeft(p) { (acc, a) =>
      val s = a.stripPrefix("-")
      val i = s.indexOf('=')
      require(i > 0, s"command-line parameter must be -key=value: $a")
      val (k, v) = (s.substring(0, i), s.substring(i + 1))
      k match {
        case "index" => acc.copy(indexPath = v)
        case "corpus" => acc.copy(corpus = v)
        case "annotations" => acc.copy(annotations = v)
        case "removeField.name" =>
          acc.copy(removeFields = acc.removeFields :+ v.toLowerCase(java.util.Locale.ROOT))
        case _ => acc
      }
    }

  def validate(p: Params): Unit = {
    require(p.indexPath.nonEmpty, "modifyfields requires <index>")
    require(p.addFields.isEmpty || (p.annotations.nonEmpty && p.corpus.nonEmpty),
      "adding fields requires <annotations> and <corpus>")
    require(p.addFields.nonEmpty || p.removeFields.nonEmpty,
      "nothing to do: no addField or removeField")
  }

  /** one parsed TAG annotation (byte space) */
  final case class Tag(docno: String, id: Long, name: String,
                       begin: Long, end: Long, number: Long, parentId: Long)

  /** parse the 8-column tab-delimited annotations file; ATTRIBUTE rows
    * and malformed lines drop
    */
  def readAnnotations(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.text(path)
      .select(split(col("value"), "\t").as("f"))
      .where(size(col("f")) >= 8 && element_at(col("f"), 2) === "TAG")
      .select(
        element_at(col("f"), 1).as("docno"),
        element_at(col("f"), 3).cast("long").as("id"),
        lower(element_at(col("f"), 4)).as("name"),
        element_at(col("f"), 5).cast("long").as("start"),
        element_at(col("f"), 6).cast("long").as("length"),
        element_at(col("f"), 7).cast("long").as("number"),
        element_at(col("f"), 8).cast("long").as("parentId"))
      .where(col("id").isNotNull && col("start").isNotNull && col("length").isNotNull)
  }

  /** Byte extent → token extent against the token spans (begins/ends),
    * the convert_annotations rules. Returns None when the tag never
    * activates or covers zero tokens.
    */
  def toTokenExtent(tagBegin: Long, tagEnd: Long,
                    bs: Array[Int], es: Array[Int]): Option[(Int, Int)] = {
    val size = bs.length
    if (size == 0) return None
    // activation: first token whose end the tag's begin precedes
    var p = 0
    while (p < size && tagBegin >= es(p)) p += 1
    if (p == size) return None // begins after every token
    if (tagEnd <= bs(p)) return None // zero token-length
    val mid = bs(p) + (es(p) - bs(p)) / 2
    var begin = if (tagBegin <= mid) p else p + 1
    if (begin >= size) begin = size - 1
    if (begin < 0) begin = 0
    // close: first token AFTER the activation token whose end reaches
    // the tag's end (the close check runs before activation each step)
    var q = p + 1
    while (q < size && tagEnd > es(q)) q += 1
    var end =
      if (q >= size) size // unclosed → document end
      else if (tagEnd <= bs(q)) q
      else if (tagEnd <= bs(q) + (es(q) - bs(q)) / 2) q
      else q + 1
    if (end > size) end = size
    if (end < 1) end = 1
    Some((begin, end))
  }

  /** resolve docnos, convert every TAG to a token-space field extent
    * row (docId, field, begin, end, number, ordinal, parentField,
    * parentOrdinal) — ordinals number a field's extents in document
    * order, parent links follow the file's parentid column
    */
  def convert(spark: SparkSession, p: Params, analyzer: Analyzer): DataFrame = {
    import spark.implicits._
    val names = p.addFields.map(_.name).toSet
    val tags = readAnnotations(spark, p.annotations)
      .where(col("name").isin(names.toSeq: _*))
    val meta = BuildIndex.openMetadata(spark, p.indexPath).getOrElse(
      throw new IllegalArgumentException(
        s"repository ${p.indexPath} has no docno metadata"))
    val corpus = spark.read.parquet(p.corpus)
    // the corpus carries its docno directly, or the BuildIndex
    // convention rebuilds it from (repo, path, commit)
    val docnoOf =
      if (corpus.columns.contains("docno")) col("docno")
      else BuildIndex.docno(col("repo"), col("path"), col("commit"))
    // PRIORITY order content > text > html (Seq.intersect would follow
    // the table's column order instead — a corpus listing html first
    // would tokenize the wrong surface and land every converted extent
    // on wrong token positions)
    val textCol = Seq("content", "text", "html").find(corpus.columns.contains)
      .getOrElse(throw new IllegalArgumentException(
        "corpus has no text column (expected one of content/text/html), " +
          s"got: ${corpus.columns.mkString(", ")}"))
    val texts = corpus.select(docnoOf.as("docno"), col(textCol).as("text"))
    val az = analyzer
    tags
      .join(meta.select(col("docId"), col("docno")), Seq("docno"))
      .join(texts, Seq("docno"))
      .select(col("docId"), col("id"), col("name"), col("start"),
        col("length"), col("number"), col("parentId"), col("text"))
      .as[(Long, Long, String, Long, Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (docId: Long, it: Iterator[(Long, Long, String, Long, Long, Long, Long, String)]) =>
        val rows = it.toArray
        val (bs, es) = az.tokenOffsets(rows.head._8)
        // convert in "first and longest" order like the reference's
        // raw_tags set ordering
        val converted = rows.sortBy(r => (r._4, -(r._4 + r._5))).flatMap { r =>
          toTokenExtent(r._4, r._4 + r._5, bs, es).map { case (b, e) =>
            (r._2, r._3, b, e, r._6, r._7) // (id, name, begin, end, number, parentId)
          }
        }
        // per-field document-order ordinals; id → (field, ordinal) for
        // parent links
        val ordinals = scala.collection.mutable.HashMap.empty[String, Int]
        val byId = scala.collection.mutable.HashMap.empty[Long, (String, Int)]
        val out = converted.sortBy(t => (t._3, t._4)).map { t =>
          val o = ordinals.getOrElse(t._2, 0) + 1
          ordinals.update(t._2, o)
          byId.update(t._1, (t._2, o))
          (t._1, t._2, t._3, t._4, t._5, t._6, o)
        }
        out.iterator.map { case (_, name, b, e, num, parentId, o) =>
          val parent = if (parentId == 0) None else byId.get(parentId)
          (docId, name, b, e, num, o,
            parent.map(_._1).orNull, parent.map(_._2).getOrElse(0))
        }
      }
      .toDF("docId", "field", "begin", "end", "number", "ordinal",
        "parentField", "parentOrdinal")
  }

  /** full surgery: convert (when adding) + rewrite the stored fields
    * table (SegmentStore.rewriteFields — rewrite == full rebuild,
    * StoreRewriteSpec)
    */
  def run(spark: SparkSession, p: Params, analyzer: Analyzer): Unit = {
    val add = if (p.addFields.isEmpty) null else convert(spark, p, analyzer)
    SegmentStore.rewriteFields(spark, p.indexPath,
      remove = p.removeFields, add = add)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ModifyFieldsApp <param.xml> [-key=value ...]")
    val xml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args.head)), "UTF-8")
    val p = overlay(parseParams(xml), args.tail.toSeq)
    validate(p)
    val spark = SparkSession.builder()
      .appName("graft-modifyfields")
      .config("spark.sql.shuffle.partitions", 32)
      .getOrCreate()
    val analyzer = BuildIndex.storedAnalyzer(p.indexPath).getOrElse(Analyzer())
    run(spark, p, analyzer)
    println(s"rewrote fields of ${p.indexPath}")
    spark.stop()
  }
}

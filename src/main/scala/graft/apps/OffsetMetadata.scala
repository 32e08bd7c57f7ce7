package graft.apps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offset METADATA injection — the metadata sibling of the offset
  * field-annotation surface (reference: src/OffsetMetadataAnnotator.cpp;
  * wired per corpus by buildindex/IndriBuildIndex.cpp:1091-1092 via
  * `<corpus><metadata>`).
  *
  * File format: 3-column tab-delimited `docno \t key \t value`. The
  * reference loader's quirks are reproduced exactly:
  *  - the FIRST EMPTY LINE TERMINATES the parse (`if (buf[0]=='\0')
  *    break;` — everything after a blank line is silently ignored);
  *  - keys are ASCII-downcased (C `tolower` per byte);
  *  - only the first three fields of a line are read (a fourth tab and
  *    anything after it is dropped — `fieldCount < 3` stops the scan);
  *  - per (docno, key) the FIRST pair wins: the transform's
  *    key-already-exists check runs against the document's metadata
  *    vector, which grows as pairs are added, so a second same-key pair
  *    from the file is skipped (OffsetMetadataAnnotator.cpp:185-205);
  *  - a key the document ALREADY carries (docno, a configured metadata
  *    column with a value) is skipped for that document.
  * Where the reference exhibits undefined behavior we fail loudly
  * instead: a line with fewer than three fields leaves `value` NULL and
  * segfaults in `strlen`; a field of 256+ chars exits the field scan
  * early with the same effect. Both raise IllegalArgumentException.
  */
object OffsetMetadata {

  private def asciiLower(s: String): String = {
    val a = s.toCharArray
    var i = 0
    while (i < a.length) {
      val c = a(i)
      if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
      i += 1
    }
    new String(a)
  }

  /** parse the offset metadata lines with the reference loader's exact
    * termination/field semantics → (docno, key, value) in file order
    */
  def parsePairs(lines: Iterator[String]): Seq[(String, String, String)] = {
    val out = Seq.newBuilder[(String, String, String)]
    var stop = false
    while (!stop && lines.hasNext) {
      val line = lines.next()
      if (line.isEmpty) stop = true // reference: blank line ends the file
      else {
        // first three tab-separated fields; the rest of the line drops
        val t1 = line.indexOf('\t')
        val t2 = if (t1 < 0) -1 else line.indexOf('\t', t1 + 1)
        require(t1 > -1 && t2 > -1, "malformed offset metadata line " +
          s"(docno\\tkey\\tvalue required; reference segfaults here): '$line'")
        val t3 = line.indexOf('\t', t2 + 1)
        val docno = line.substring(0, t1)
        val key = line.substring(t1 + 1, t2)
        val value = if (t3 < 0) line.substring(t2 + 1)
                    else line.substring(t2 + 1, t3)
        Seq(docno, key, value).foreach(f => require(f.length < 256,
          s"offset metadata field over the reference's 255-char buffer: '$f'"))
        out += ((docno, asciiLower(key), value))
      }
    }
    out.result()
  }

  def parseFile(path: String): Seq[(String, String, String)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parsePairs(src.getLines()) finally src.close()
  }

  /** Apply parsed pairs to a wide metadata table (one column per key,
    * `docno` join key). First pair per (docno, key) wins; keys already
    * present ON A DOCUMENT (non-null in an existing column) are skipped
    * for that document; new keys become new columns. Docnos absent from
    * the metadata table drop (the reference only transforms parsed
    * documents). The pair list is driver-resident exactly like the
    * reference's in-memory HashTable — offset metadata is a side input,
    * not a corpus-scale table; a corpus-scale variant would pass the
    * pairs as a DataFrame through the identical min_by + pivot plan.
    */
  def annotate(spark: SparkSession, metadata: DataFrame,
               pairs: Seq[(String, String, String)]): DataFrame = {
    if (pairs.isEmpty) return metadata
    import spark.implicits._
    val keys = pairs.map(_._2).distinct // bounded: the metadata schema
    // the join key is renamed BEFORE the pivot — a file key named
    // "docno" must become a pivot column without colliding with it
    val firsts = pairs.zipWithIndex
      .map { case ((d, k, v), ix) => (d, k, v, ix.toLong) }
      .toDF("__omj_key", "key", "value", "ix")
      .groupBy("__omj_key", "key")
      .agg(min_by(col("value"), col("ix")).as("value"))
    val wide = firsts.groupBy("__omj_key")
      .pivot("key", keys).agg(first(col("value")))
    // file-supplied key names are arbitrary strings (the reference only
    // ASCII-downcases them) — backtick-quote every col() reference so a
    // key like "og.url" is a column name, not a nested-field access
    def qcol(name: String) = col("`" + name.replace("`", "``") + "`")
    val w = broadcast(wide.select(
      col("__omj_key") +: keys.map(k => qcol(k).as(s"__om_$k")): _*))
    val joined = metadata.join(w,
      metadata("docno") === w("__omj_key"), "left")
    // existing-key lookup must be CASE-INSENSITIVE: withColumn resolves
    // case-insensitively under Spark's default resolver, so a file key
    // "docid" would otherwise silently REPLACE the Long docId column
    // with a mostly-null string column. Map each key to the existing
    // column's real name (preserving its spelling) and cast the file
    // value to its type so per-doc fill never widens the schema.
    val existingByLower = metadata.columns
      .map(c => c.toLowerCase(java.util.Locale.ROOT) -> c).toMap
    val merged = keys.foldLeft(joined) { (df, k) =>
      val offv = qcol(s"__om_$k")
      existingByLower.get(k.toLowerCase(java.util.Locale.ROOT)) match {
        case Some(orig) => // per-doc skip: fill only missing values
          df.withColumn(orig,
            coalesce(qcol(orig), offv.cast(metadata.schema(orig).dataType)))
        case None => df.withColumn(k, offv)
      }
    }
    merged.drop("__omj_key" +: keys.map(k => s"__om_$k"): _*)
  }
}

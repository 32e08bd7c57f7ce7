package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The webtrack ad-hoc task's max-passage rerank (reference:
  * webtrack/clue.cc performAdhocTask → reScore → prepareResult):
  * retrieve top-k documents, chop each retrieved document into
  * fixed-size token chunks with a carried overlap window
  * (webtrack/clue.cc createPassage: `passageSz` tokens per chunk, the
  * LAST `windowSz` tokens re-seed the next chunk → chunk k covers
  * token range [k·(P−W), k·(P−W)+P), the final partial chunk runs to
  * the end), score every chunk with the dirichlet passage LM
  * (webtrack/LanguageModel.cc:8-30, μ=2500 via the default ctor at
  * clue.cc:243), then rank documents by their BEST passage — one
  * result per document, first (= highest-scored) passage wins
  * (prepareResult's seenIds dedup, clue.cc:166-186).
  *
  * Passage LM (LanguageModel::score, the collFreq/collSize form):
  *   score(q, psg) = Σ_{w ∈ q, ctf_w > 0}
  *     ln(psgTf(w) + μ·ctf_w/C) − ln(psgLen + μ)
  * A query term with zero collection probability is SKIPPED, not
  * background-scored (the `cProb <= 0 → continue` guard at
  * LanguageModel.cc:20-23; the `cFreq = 1` substitution two lines up
  * is computed into a variable the formula never reads — dead code).
  * Query-token duplicates each add their term's score.
  *
  * Tokenization: the reference's Tokenize::tokenize camel-case /
  * special-character splitting is PARSING of raw crawl bytes — our
  * input is an already-parsed table (the repo-wide scoping decision),
  * so both query and passage tokens are whitespace-split, lowercased,
  * kept when longer than 1 char and not stopped — the same filter the
  * reference applies after its boundary detection.
  *
  * The reference sorts all passages with std::sort (UNSTABLE — ties
  * are nondeterministic); we break score ties by docId ascending.
  */
object WebTrackRerank {

  private val Mu = 2500.0

  /** whitespace split, lowercase, length > 1, stop-filtered — the
    * token filter of webtrack Tokenize::tokenize (charLimit=1)
    */
  def tokenizeQuery(text: String, stopwords: Set[String]): Seq[String] =
    text.split("\\s+").toSeq.map(_.toLowerCase)
      .filter(t => t.length > 1 && !stopwords.contains(t))

  private def tokenCol(c: Column, stopwords: Set[String]): Column = {
    val base = filter(split(lower(c), "\\s+"), t => length(t) > 1)
    if (stopwords.isEmpty) base
    else filter(base, t => !t.isInCollection(stopwords.toSeq))
  }

  /** Max-passage rerank over the engine's top-`k` retrieval.
    *
    * @param content (docId, content) — the stored collection text the
    *                reference fetches via QueryEnvironment::documents
    * @return (docId, qid, score, rank): one row per retrieved document
    *         that produced ≥1 passage (a document whose filtered token
    *         list is empty yields no passages and silently drops, like
    *         the reference's empty `psgs`); rank = 1..n per query by
    *         (score desc, docId asc). Everything downstream of the
    *         retrieval is bounded by k·⌈maxDoclen/stride⌉ rows per
    *         query — the per-query window sort is k docs, not a corpus
    *         sort.
    */
  def maxPassageRerank(eng: Engine, content: DataFrame,
                       queries: Seq[(String, String)],
                       stopwords: Set[String] = Set.empty,
                       k: Int = 5, passageSz: Int = 150, windowSz: Int = 50,
                       contentCol: String = "content"): DataFrame = {
    require(passageSz > windowSz, "passageSz must exceed windowSz (reference assert)")
    val spark = eng.index.segments.sparkSession
    import spark.implicits._
    val stride = passageSz - windowSz

    val qTokens: Map[String, Seq[String]] = queries.map { case (qid, text) =>
      qid -> tokenizeQuery(text, stopwords)
    }.toMap
    val allTerms = qTokens.values.flatten.toSeq.distinct
    val collSize = eng.index.stats.totalTerms.toDouble
    val ctfMap: Map[String, Long] = eng.index.dictionary
      .where(col("term").isin(allTerms: _*))
      .select("term", "ctf").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val perQuery = queries.map { case (qid, text) =>
      val cands = eng.runQuery(s"#combine($text)", k)
        .select(col("docId"))
        .join(content.select(col("docId"), col(contentCol).as("__content")), "docId")
        .withColumn("toks", tokenCol(col("__content"), stopwords))
        .withColumn("n", size(col("toks")))
        .where(col("n") > 0)
        // full chunks emitted in-loop: k·stride + P < n; the flush chunk
        // F runs [F·stride, n) (createPassage trace — a doc of exactly P
        // tokens is ONE chunk)
        .withColumn("f",
          when(col("n") > passageSz,
            floor((col("n") - passageSz - 1) / stride) + 1).otherwise(lit(0L)))
        .withColumn("ck", explode(sequence(lit(0L), col("f"))))
        .withColumn("cstart", col("ck") * stride)
        .withColumn("cend",
          when(col("ck") < col("f"), col("cstart") + passageSz).otherwise(col("n")))
        .withColumn("ctoks",
          slice(col("toks"), col("cstart") + 1, col("cend") - col("cstart")))
        .withColumn("clen", size(col("ctoks")))

      // per-term contributions: dup_w · (ln(tf_w + μ·ctf_w/C) − ln(clen+μ));
      // ctf_w == 0 → the term is skipped entirely (cProb <= 0 guard)
      val live = qTokens(qid).groupBy(identity).toSeq
        .map { case (t, occ) => (t, occ.size, ctfMap.getOrElse(t, 0L)) }
        .filter(_._3 > 0L)
      val lnLen = log(col("clen").cast("double") + lit(Mu))
      val scoreCol =
        if (live.isEmpty) lit(0.0)
        else live.map { case (t, dup, ctf) =>
          val tf = size(filter(col("ctoks"), x => x === lit(t))).cast("double")
          lit(dup.toDouble) * (log(tf + lit(Mu * ctf / collSize)) - lnLen)
        }.reduce(_ + _)

      cands.select(col("docId"), lit(qid).as("qid"), scoreCol.as("psg"))
        .groupBy("docId", "qid").agg(max(col("psg")).as("score"))
    }
    val scored = perQuery.reduce(_.unionByName(_))
    // per-query rank: k retrieved docs per query — a bounded window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("docId").asc)
    scored.withColumn("rank", row_number().over(w))
  }
}

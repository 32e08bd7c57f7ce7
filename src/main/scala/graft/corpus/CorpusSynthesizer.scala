package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic source-code corpus with the BASELINE input
  * shape (repo, path, commit, lang, content). Seeded, reproducible, and
  * partitioning-independent: every row derives purely from (seed, id) so
  * the same id yields the same row on any cluster layout. Generation is
  * distributed (spark.range → map), never a driver-side loop — at
  * 10^12 rows this is an embarrassingly parallel scan.
  *
  * The content mixes:
  *  (a) a Zipf-sampled keyword vocabulary (code-like terms; `return` and
  *      `license` planted as mega-hot terms — the skew fixture),
  *  (b) rare unique identifiers (df=1 long tail),
  *  (c) punctuation/markup exercising the tokenizer rules
  *      (reference: src/TextTokenizer.l:46-58 — acronyms, apostrophes,
  *      negative decimals, tags, entities).
  */
object CorpusSynthesizer {

  val Langs = Array("scala", "java", "py", "c", "md")
  val Exts = Map("scala" -> "scala", "java" -> "java", "py" -> "py", "c" -> "c", "md" -> "md")

  /** Code-like vocabulary; index ~ rank for Zipf sampling. */
  val Vocabulary: Array[String] = {
    val keywords = Array(
      "return", "license", "class", "def", "val", "var", "import", "public",
      "static", "void", "int", "string", "new", "if", "else", "for", "while",
      "try", "catch", "throw", "null", "true", "false", "this", "super",
      "override", "private", "final", "match", "case", "object", "trait",
      "extends", "with", "implicit", "lazy", "type", "package", "function")
    val rng = new scala.util.Random(421)
    val syllables = Array("get", "set", "run", "map", "list", "node", "tree",
      "hash", "key", "value", "index", "query", "parse", "token", "buffer",
      "stream", "block", "merge", "sort", "scan", "read", "write", "util",
      "data", "meta", "config", "handler", "builder", "factory", "impl")
    val identifiers = (0 until 5000).map { i =>
      val a = syllables(rng.nextInt(syllables.length))
      val b = syllables(rng.nextInt(syllables.length))
      s"$a$b${i % 97}"
    }
    keywords ++ identifiers
  }

  /** Zipf-ish rank sampler over the vocabulary. */
  @inline private def zipfIndex(u: Double, n: Int): Int = {
    // inverse-CDF approximation for s=1: rank ∝ exp(u * ln(n))
    val r = math.exp(u * math.log(n.toDouble)).toInt - 1
    math.min(math.max(r, 0), n - 1)
  }

  private def hexString(rng: scala.util.Random, len: Int): String = {
    val sb = new java.lang.StringBuilder(len)
    var i = 0
    while (i < len) { sb.append("0123456789abcdef".charAt(rng.nextInt(16))); i += 1 }
    sb.toString
  }

  /** Generate one document deterministically from (seed, id). */
  def genDoc(seed: Long, id: Long): (String, String, String, String, String) = {
    val rng = new scala.util.Random(seed * 1000003L + id)
    val org = rng.nextInt(20)
    val repoN = rng.nextInt(50)
    val lang = Langs(rng.nextInt(Langs.length))
    val depth = 1 + rng.nextInt(4)
    val dirs = (0 until depth).map(_ => Vocabulary(40 + rng.nextInt(200))).mkString("/")
    val path = s"src/$dirs/file${rng.nextInt(1000)}.${Exts(lang)}"
    val commit = hexString(rng, 40)

    val nTokens = 20 + rng.nextInt(180)
    val sb = new java.lang.StringBuilder(nTokens * 8)
    var i = 0
    while (i < nTokens) {
      val roll = rng.nextDouble()
      if (roll < 0.50) {
        // hot skew plant: `return` in ~50% of docs, license/class/def ~10%
        if (i == 0 && rng.nextDouble() < 0.5) sb.append("return ")
        else sb.append(Vocabulary(zipfIndex(rng.nextDouble(), Vocabulary.length))).append(' ')
      } else if (roll < 0.90) {
        sb.append(Vocabulary(zipfIndex(rng.nextDouble(), Vocabulary.length))).append(' ')
      } else if (roll < 0.95) {
        // df=1 long-tail unique identifier
        sb.append("uniq").append(id).append('x').append(i).append(' ')
      } else {
        // tokenizer-rule exercisers
        rng.nextInt(6) match {
          case 0 => sb.append("U.S.A. ")
          case 1 => sb.append("don't ")
          case 2 => sb.append("-3.14 ")
          case 3 => sb.append("<b>tag</b> ")
          case 4 => sb.append("&amp; ")
          case _ => sb.append("x1.y2 ")
        }
      }
      i += 1
    }
    val repo = s"org$org/repo$repoN"
    (repo, path, commit, lang, sb.toString.trim)
  }

  /** Distributed deterministic corpus of `n` docs. */
  def corpus(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n)
      .map(id => CorpusSynthesizer.genDoc(seed, id))
      .toDF("repo", "path", "commit", "lang", "content")
  }

  /** The seeded reference query set (FIXTURES.md §2): 30 queries spanning
    * the df spectrum, bags, weighted bags, stop/OOV cases, and staged
    * positional operators.
    */
  def querySet: Seq[(Int, String)] = Seq(
    1 -> "return",
    2 -> "license",
    3 -> "class",
    4 -> "getset0",
    5 -> "hashkey1",
    6 -> "querytoken2",
    7 -> "uniq1x5",
    8 -> "mergesort3",
    9 -> "def",
    10 -> "bufferstream4",
    11 -> "#combine(return license)",
    12 -> "#combine(class def val)",
    13 -> "#combine(hashkey1 mergesort3)",
    14 -> "#combine(return return class)", // duplicate qtf case
    15 -> "#combine(getset0 querytoken2 import public)",
    16 -> "#combine(static void int)",
    17 -> "#combine(stream block merge sort)",
    18 -> "#combine(license val)",
    19 -> "#combine(usa dont)",
    20 -> "#combine(index query parse)",
    21 -> "#weight(0.7 return 0.3 license)",
    22 -> "#weight(2.0 class 1.0 def)",
    23 -> "#weight(0.5 hashkey1 0.5 mergesort3)",
    24 -> "#weight(1.0 return 2.0 val 3.0 import)",
    25 -> "zzznotaword",
    26 -> "#combine(zzznotaword return)",
    27 -> "U.S.A.",
    28 -> "#od1(return license)",
    29 -> "#uw8(class def)",
    30 -> "#band(return license)"
  )
}

package graft.extra

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tokenize

/** Text-analysis operators for the training-data pipeline: token
  * counting, quality scoring, language ID, document fingerprinting.
  * All codegen'd Column algebra except where a typed map is the honest
  * tool (fingerprint, simhash). */
object TextMetrics {

  /** Token counting two ways: whitespace and a BPE-ish regex segmentation
    * (letters | digits | single punct). Both mirrored in DuckDB SQL. */
  val BpeishRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(filter(split(col("text"), "\\s+"), t => length(t) > 0))
        .cast("long").as("n_ws"),
      regexp_count(col("text"), lit(BpeishRegex)).cast("long").as("n_bpe"))
      .orderBy("doc_id")

  /** Stopword set for quality scoring (frozen literal, both engines). */
  val Stopwords = Seq("the", "a", "of", "and", "in", "to")

  /** Quality scoring: length, stopword ratio, mean word length, and a
    * deterministic composite in micros. Mirrors OracleSqlExtra.qualitySql
    * expression-for-expression. */
  def quality(docs: DataFrame): DataFrame = {
    val toks = Tokenize.tokensCol(col("text"))
    val nTok = size(toks).cast("long")
    val nStop = size(filter(toks, t => t.isin(Stopwords.map(lit): _*)))
      .cast("long")
    val sumLen = aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), (acc, v) => acc + v)
    val stopRatio = nStop.cast("double") / nTok
    val avgWlen = sumLen.cast("double") / nTok
    val quality =
      lit(0.5) * least(nTok.cast("double") / 50.0, lit(1.0)) +
        lit(0.3) * (lit(1.0) - stopRatio) +
        lit(0.2) * least(avgWlen / 8.0, lit(1.0))
    docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        nTok.as("n_tokens"),
        when(nTok > 0, floor(stopRatio * 1e6 + 0.5)).otherwise(0L)
          .cast("long").as("stop_ratio_micro"),
        when(nTok > 0, floor(avgWlen * 1e6 + 0.5)).otherwise(0L)
          .cast("long").as("avg_wlen_micro"),
        when(nTok > 0, floor(quality * 1e6 + 0.5)).otherwise(0L)
          .cast("long").as("quality_micro"))
      .orderBy("doc_id")
  }

  /** Language-ID heuristic: per-language stopword profiles; predicted =
    * argmax hit count (ties → "und"). The driver corpus shares one
    * vocabulary across langs, so this demonstrates the OPERATOR (profile
    * scoring, argmax), not corpus-specific accuracy. */
  val LangProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "of", "and", "is", "to", "in"),
    "es" -> Set("el", "la", "de", "y", "es", "en", "los"),
    "de" -> Set("der", "die", "das", "und", "ist", "zu", "ein"),
    "fr" -> Set("le", "la", "de", "et", "est", "un", "les"))

  def langId(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select($"doc_id", $"lang", Tokenize.tokensCol($"text").as("toks"))
      .as[(Long, String, Seq[String])]
      .map { case (d, lang, toks) =>
        val hits = LangProfiles.view.mapValues(p => toks.count(p)).toSeq.sortBy(_._1)
        val best = hits.maxBy(_._2)
        val pred =
          if (best._2 == 0 || hits.count(_._2 == best._2) > 1) "und" else best._1
        (d, lang, pred)
      }
      .toDF("doc_id", "lang", "pred_lang")
      .orderBy("doc_id")
  }

  /** Rabin-Karp rolling-hash document fingerprint over the token stream
    * (base 31, mod 2^61−1, portable term hashes) — content-defined
    * identity that survives re-serialization (unlike md5 of raw bytes). */
  def fingerprint64(toks: Seq[String]): Long = {
    val p = (1L << 61) - 1
    var acc = 0L
    toks.foreach { t =>
      val x = PortableHash.md5_60(t) % p
      // acc = (acc*31 + x) mod p ; 31·acc < 2^66 → reduce via split
      val prod = acc * 31
      val hi = Math.multiplyHigh(acc, 31L)
      val lo = prod & p
      val mid = (prod >>> 61) | (hi << 3)
      acc = (lo + mid + x) % p
    }
    acc
  }

  def fingerprints(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select($"doc_id", Tokenize.tokensCol($"text").as("toks"))
      .as[(Long, Seq[String])]
      .map { case (d, toks) => (d, fingerprint64(toks)) }
      .toDF("doc_id", "fingerprint")
      .orderBy("doc_id")
  }
}

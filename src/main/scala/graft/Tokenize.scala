package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic tokenizer, frozen for rank-identity (SURVEY.md §7.4).
  *
  * Definition: lowercase, split on runs of non-(letter|digit), drop empties.
  * Expressed once as a Column (codegen'd, no UDF) and once as plain Scala
  * (for the WAND scorer / unit tests); [[OracleSql]] carries the DuckDB
  * mirror (`regexp_split_to_array(lower(text), '[^\pL\pN]+')`).
  */
object Tokenize {
  /** Java-regex for Spark; DuckDB RE2 equivalent is [^\pL\pN]+ */
  val SplitRegex = "[^\\p{L}\\p{N}]+"

  /** Column of ARRAY<STRING> tokens for a text column. */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), SplitRegex), t => length(t) > 0)

  /** Driver/executor-side mirror of [[tokensCol]] (identical semantics). */
  def tokenize(text: String): Seq[String] =
    text.toLowerCase.split(SplitRegex).toSeq.filter(_.nonEmpty)

  private val splitPattern = java.util.regex.Pattern.compile(SplitRegex)

  /** Hot-path variant of [[tokenize]] (precompiled pattern, no Seq
    * wrapper). Parity notes: Catalyst `lower` uses the same
    * `String.toLowerCase` for non-ASCII and an equivalent ASCII fast
    * path; Catalyst `split(str, re, -1)` differs from Java's
    * `split(re)` (limit 0) only in TRAILING empty strings, which the
    * nonEmpty filter removes on both sides. Bit-equality with
    * [[tokensCol]] is spec-asserted on the driver corpora. */
  def tokenizeArray(text: String): Array[String] =
    splitPattern.split(text.toLowerCase).filter(_.nonEmpty)
}

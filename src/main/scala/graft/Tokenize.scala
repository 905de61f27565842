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

  /** Receiver for [[scanTokens]] — a trait (not a Function3) so the
    * per-token call passes primitive ints unboxed. */
  trait TokenSink {
    /** One token = `lower.substring(start, end)`; `hash` equals that
      * substring's `String.hashCode`. */
    def token(lower: String, start: Int, end: Int, hash: Int): Unit
  }

  /** `\p{L}\p{N}` code-point class of [[SplitRegex]], evaluated directly:
    * the five letter categories (== `Character.isLetter`) plus the three
    * number categories (Nd, Nl, No — wider than `isDigit`, which is Nd
    * only). Spec-pinned equal to the regex path (TokenizeSpec property
    * test over Unicode strings incl. supplementary planes). */
  @inline private def isWordCp(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }

  /** Receiver for [[scanTokensAscii]] — token char ranges over a REUSED
    * char buffer instead of a String, so the ASCII fast path of the
    * fused build pass allocates nothing per document (see
    * `IndexBuild.partialPostingsFromDocs`). */
  trait CharsTokenSink {
    /** One token = `new String(chars, start, end - start)`; `hash`
      * equals that String's `hashCode`. */
    def token(chars: Array[Char], start: Int, end: Int, hash: Int): Unit
  }

  /** `\p{L}\p{N}` membership for an ALREADY-LOWERCASED pure-ASCII char:
    * the only ASCII code points in the letter/number categories are
    * [A-Za-z0-9], and lowering removes A-Z. */
  @inline private def isAsciiWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** [[countTokens]] over a lowered pure-ASCII char buffer. */
  def countTokensAscii(buf: Array[Char], len: Int): Int = {
    var i = 0
    var n = 0
    var in = false
    while (i < len) {
      if (isAsciiWord(buf(i))) { if (!in) { n += 1; in = true } }
      else in = false
      i += 1
    }
    n
  }

  /** [[scanTokens]] over a lowered pure-ASCII char buffer (caller
    * guarantees every char < 128 and already lowercased). Token ranges
    * and hashes are bit-identical to running [[scanTokens]] on
    * `new String(buf, 0, len)` — spec-pinned in TokenizeSpec. */
  def scanTokensAscii(buf: Array[Char], len: Int, sink: CharsTokenSink): Unit = {
    var i = 0
    var start = -1
    var h = 0
    while (i < len) {
      val c = buf(i)
      if (isAsciiWord(c)) {
        if (start < 0) { start = i; h = 0 }
        h = 31 * h + c
      } else if (start >= 0) {
        sink.token(buf, start, i, h)
        start = -1
      }
      i += 1
    }
    if (start >= 0) sink.token(buf, start, len, h)
  }

  /** Token count of an ALREADY-LOWERCASED string — one classification
    * pass, zero allocation. Equals `tokenizeArray(text).length` when
    * `lower == text.toLowerCase`. */
  def countTokens(lower: String): Int = {
    var i = 0
    var n = 0
    var in = false
    while (i < lower.length) {
      val c = lower.charAt(i)
      var cp: Int = c
      var w = 1
      if (Character.isHighSurrogate(c) && i + 1 < lower.length &&
          Character.isLowSurrogate(lower.charAt(i + 1))) {
        cp = Character.toCodePoint(c, lower.charAt(i + 1)); w = 2
      }
      if (isWordCp(cp)) { if (!in) { n += 1; in = true } }
      else in = false
      i += w
    }
    n
  }

  /** Allocation-free tokenizer drive over an ALREADY-LOWERCASED string:
    * emits each token's [start, end) char range and its String-compatible
    * hash to `sink` — no substring, no split array. This is the hot-path
    * sibling of [[tokenizeArray]]: the regex-split path allocates ~3
    * arrays + one String per token (the dominant allocation source of
    * the index build's map stage); this allocates nothing. Bit-parity
    * with the regex path is spec-pinned (TokenizeSpec). */
  def scanTokens(lower: String, sink: TokenSink): Unit = {
    var i = 0
    var start = -1
    var h = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      var cp: Int = c
      var w = 1
      if (Character.isHighSurrogate(c) && i + 1 < lower.length &&
          Character.isLowSurrogate(lower.charAt(i + 1))) {
        cp = Character.toCodePoint(c, lower.charAt(i + 1)); w = 2
      }
      if (isWordCp(cp)) {
        if (start < 0) { start = i; h = 0 }
        h = 31 * h + c
        if (w == 2) h = 31 * h + lower.charAt(i + 1)
      } else if (start >= 0) {
        sink.token(lower, start, i, h)
        start = -1
      }
      i += w
    }
    if (start >= 0) sink.token(lower, start, lower.length, h)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}

/** Parity of the allocation-free tokenizer scan ([[Tokenize.scanTokens]] /
  * [[Tokenize.countTokens]]) with the frozen regex definition
  * ([[Tokenize.tokenizeArray]]) — the scan replaces the regex in the
  * index build's fused map pass, so any divergence would silently change
  * every index. Property-tested over adversarial Unicode including
  * supplementary-plane code points, lone surrogates, and Nl/No number
  * categories the `isDigit` shortcut would miss. */
class TokenizeSpec extends AnyFunSuite {

  private def viaScan(text: String): (Seq[String], Int) = {
    val lower = text.toLowerCase
    val out = Seq.newBuilder[String]
    Tokenize.scanTokens(lower, new Tokenize.TokenSink {
      def token(l: String, s: Int, e: Int, h: Int): Unit = {
        val t = l.substring(s, e)
        assert(h == t.hashCode, s"hash mismatch for token '$t'")
        out += t
      }
    })
    (out.result(), Tokenize.countTokens(lower))
  }

  private def checkParity(text: String): Unit = {
    val expected = Tokenize.tokenizeArray(text).toSeq
    val (got, n) = viaScan(text)
    assert(got == expected, s"scan tokens diverge for ${text.take(80)}")
    assert(n == expected.length, s"countTokens diverges for ${text.take(80)}")
  }

  test("parity on hand-picked edges") {
    Seq(
      "", "...", "The  quick,brown fox! 42", "a", " a ", "7seven 7",
      "ünïcödé Straße ĲSSELMEER", // sharp-s lowercasing changes length
      "İstanbul İ", // dotted capital I → i + combining dot
      "Ⅻ rome Ⅻ", // Nl LETTER_NUMBER (not isDigit)
      "½ and ¾ halves", // No OTHER_NUMBER
      "𝐀math𝐚bold", // supplementary-plane letters
      "😀 emoji 😀 gap", // supplementary non-letters
      "𝟎 zero 𝟏", // MATHEMATICAL BOLD DIGITs (Nd, supplementary)
      "lone\uD800surrogate", "tail\uDC00low", "\uD800", "\uDC00",
      "ends with high\uD800", "mixed\uD800𐀀run"
    ).foreach(checkParity)
  }

  test("parity on random Unicode strings") {
    val interesting: Gen[Char] = Gen.oneOf(
      Gen.alphaNumChar, Gen.const(' '), Gen.const(','), Gen.const('ß'),
      Gen.const('Ⅻ'), Gen.const('½'), Gen.const('İ'),
      Gen.choose('\uD800', '\uDBFF'), Gen.choose('\uDC00', '\uDFFF'),
      Arbitrary.arbitrary[Char])
    val texts: Gen[String] = Gen.listOf(interesting).map(_.mkString)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(texts) { text => checkParity(text); true })
    assert(res.passed, res.status.toString)
  }

  test("parity on the driver corpus") {
    val spark = TestSpark.spark
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().foreach(r => checkParity(r.getString(0)))
  }

  /** The ASCII byte fast path of the fused build pass: tokenize straight
    * off the UTF8String bytes with on-the-fly lowering. Must be token-
    * and hash-identical to the String path for any pure-ASCII input and
    * must refuse (count = -1, nothing emitted) anything else. */
  private def viaUtf8Scan(text: String): Option[(Seq[String], Int)] = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(text)
    val n = Tokenize.countTokensUtf8Ascii(u)
    if (n < 0) return None
    val out = Seq.newBuilder[String]
    Tokenize.scanTokensUtf8(u, new Tokenize.Utf8TokenSink {
      def token(uu: org.apache.spark.unsafe.types.UTF8String,
                s: Int, e: Int, h: Int): Unit = {
        val t = Tokenize.lowerAsciiToken(uu, s, e)
        assert(h == t.hashCode, s"utf8 hash mismatch for token '$t'")
        out += t
      }
    })
    Some((out.result(), n))
  }

  test("utf8 ascii fast path parity (hand-picked + random)") {
    val hand = Seq("", "...", "The  quick,brown fox! 42", "A", " MiXeD CaSe ",
      "UPPER lower 0123456789", "under_score-dash", "a!b@c#d$e%f")
    hand.foreach { t =>
      val Some((got, n)) = viaUtf8Scan(t): @unchecked
      val expected = Tokenize.tokenizeArray(t).toSeq
      assert(got == expected, s"utf8 tokens diverge for '$t'")
      assert(n == expected.length)
    }
    val asciiTexts: Gen[String] =
      Gen.listOf(Gen.choose(0.toChar, 127.toChar)).map(_.mkString)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(asciiTexts) { text =>
        val Some((got, n)) = viaUtf8Scan(text): @unchecked
        val expected = Tokenize.tokenizeArray(text).toSeq
        got == expected && n == expected.length
      })
    assert(res.passed, res.status.toString)
    assert(viaUtf8Scan("naïve").isEmpty, "non-ASCII must fall back")
    assert(viaUtf8Scan("😀 emoji").isEmpty, "supplementary must fall back")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** VByte/delta-gap round-trip (upgrades the reference's binary IO
  * round-trip test, `tests/test_binary_io.cpp`, to a property test) +
  * one frozen golden block to pin the byte layout across refactors
  * (FIXTURES.md §5). */
class CodecSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val postingsGen: Gen[(Array[Long], Array[Int], Array[Int])] = for {
    n <- Gen.choose(1, 500)
    gaps <- Gen.listOfN(n, Gen.choose(1L, 1L << 40))
    tfs <- Gen.listOfN(n, Gen.choose(1, 1 << 20))
    dls <- Gen.listOfN(n, Gen.choose(1, 1 << 20))
  } yield {
    val docIds = gaps.scanLeft(-1L)(_ + _).tail.toArray
    (docIds, tfs.toArray, dls.toArray)
  }

  test("decode(encode(xs)) == xs for sorted distinct ids (property)") {
    check(Prop.forAll(postingsGen) { case (docIds, tfs, dls) =>
      val blocks = Codec.encodeBlocks(docIds, tfs, dls)
      val decoded = blocks.flatMap { b =>
        val (d, t, l) = Codec.decodeBlock(b)
        d.indices.map(i => (d(i), t(i), l(i)))
      }
      val headersOk = blocks.forall { b =>
        val (d, t, l) = Codec.decodeBlock(b)
        b.max_doc == d.last && b.max_tf == t.max && b.min_dl == l.min
      }
      decoded == docIds.indices.map(i => (docIds(i), tfs(i), dls(i))) &&
        blocks.map(_.n).sum == docIds.length &&
        blocks.last.max_doc == docIds.last && headersOk
    })
  }

  test("vlong round trip (property incl. 0 and Long.MaxValue)") {
    val gen = Gen.oneOf(Gen.choose(0L, Long.MaxValue), Gen.const(0L), Gen.const(Long.MaxValue))
    check(Prop.forAll(gen) { v =>
      val buf = new scala.collection.mutable.ArrayBuffer[Byte]
      Codec.putVLong(buf, v)
      val r = new Codec.Reader(buf.toArray)
      r.readVLong() == v && !r.hasNext
    })
  }

  test("golden block layout is frozen") {
    // postings: (5,2,10), (7,1,3), (300,4,12)
    val b = Codec.encodeBlock(Array(5L, 7L, 300L), Array(2, 1, 4), Array(10, 3, 12))
    // vbyte: 5,2,10, 2,1,3, 293(= 0xA5 0x02),4,12
    assert(b.bytes.toSeq == Seq[Byte](5, 2, 10, 2, 1, 3, 0xA5.toByte, 2, 4, 12))
    assert(b.max_doc == 300 && b.n == 3 && b.max_tf == 4 && b.min_dl == 3)
  }

  test("blocks split at blockSize with absolute first docId per block") {
    val n = 300
    val docIds = Array.tabulate(n)(i => (i * 3 + 1).toLong)
    val tfs = Array.fill(n)(1)
    val dls = Array.fill(n)(7)
    val blocks = Codec.encodeBlocks(docIds, tfs, dls, blockSize = 128)
    assert(blocks.map(_.n) == Seq(128, 128, 44))
    // each block decodes standalone
    val (d2, _, _) = Codec.decodeBlock(blocks(1))
    assert(d2.head == docIds(128))
  }
}

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

  test("PFor: decode(encode(xs)) == xs and headers match (property)") {
    check(Prop.forAll(postingsGen) { case (docIds, tfs, dls) =>
      val blocks = Codec.encodeBlocks(docIds, tfs, dls, codec = Codec.PForId)
      val decoded = blocks.flatMap { b =>
        val (d, t, l) = Codec.decodeBlock(b)
        d.indices.map(i => (d(i), t(i), l(i)))
      }
      val headersOk = blocks.forall { b =>
        val (d, t, l) = Codec.decodeBlock(b)
        b.codec == Codec.PForId &&
          b.max_doc == d.last && b.max_tf == t.max && b.min_dl == l.min
      }
      decoded == docIds.indices.map(i => (docIds(i), tfs(i), dls(i))) && headersOk
    })
  }

  test("PFor: skewed stream patches exceptions, dense stream beats VByte") {
    // 90% tiny gaps + 10% huge outliers: the patch path
    val n = 200
    val docIds = new Array[Long](n)
    var d = 0L
    for (i <- 0 until n) { d += (if (i % 10 == 9) 1L << 33 else 2L); docIds(i) = d }
    val tfs = Array.fill(n)(1)
    val dls = Array.fill(n)(50)
    val pf = Codec.encodeBlocks(docIds, tfs, dls, codec = Codec.PForId)
    val vb = Codec.encodeBlocks(docIds, tfs, dls)
    assert(pf.flatMap(Codec.decodeBlock(_)._1.toSeq) == docIds.toSeq)
    // dense small-gap lists: PFor strictly smaller than VByte
    val dense = Array.tabulate(1000)(i => (i * 2 + 1).toLong)
    val pfDense = Codec.encodeBlocks(dense, Array.fill(1000)(1), Array.fill(1000)(40), codec = Codec.PForId)
    val vbDense = Codec.encodeBlocks(dense, Array.fill(1000)(1), Array.fill(1000)(40))
    assert(pfDense.map(_.bytes.length).sum < vbDense.map(_.bytes.length).sum,
      s"pfor ${pfDense.map(_.bytes.length).sum} !< vbyte ${vbDense.map(_.bytes.length).sum}")
  }

  test("PFor: single-posting block and zero-width streams round-trip") {
    val b = Codec.encodeBlocks(Array(42L), Array(1), Array(1), codec = Codec.PForId).head
    val (ds, ts, ls) = Codec.decodeBlock(b)
    assert(ds.toSeq == Seq(42L) && ts.toSeq == Seq(1) && ls.toSeq == Seq(1))
    // constant values → width 0 everywhere, all bits in exceptions=0 path
    val const = Array.tabulate(128)(i => (i + 1).toLong)
    val bc = Codec.encodeBlocks(const, Array.fill(128)(3), Array.fill(128)(3), codec = Codec.PForId)
    assert(bc.flatMap(Codec.decodeBlock(_)._1.toSeq) == const.toSeq)
  }

  test("mixed-codec blocks interleave through PostingBuf.addBlock") {
    // one list, first half VByte, second half PFor — the concat-merge shape
    val docIds = Array.tabulate(256)(i => (i * 5 + 2).toLong)
    val tfs = Array.tabulate(256)(i => i % 7 + 1)
    val dls = Array.fill(256)(30)
    val vb = Codec.encodeBlocks(docIds.take(128), tfs.take(128), dls.take(128))
    val pf = Codec.encodeBlocks(docIds.drop(128), tfs.drop(128), dls.drop(128), codec = Codec.PForId)
    val buf = new IndexBuild.PostingBuf
    (vb ++ pf).foreach(buf.addBlock)
    buf.sortIfNeeded()
    assert(buf.n == 256)
    assert((0 until 256).forall(i => buf.docs(i) == docIds(i) && buf.tfs(i) == tfs(i) && buf.dls(i) == dls(i)))
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

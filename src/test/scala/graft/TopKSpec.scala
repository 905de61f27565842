package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Bounded top-k structure: insert/merge equal full-sort truncation under
  * the frozen total order (score DESC, doc_id ASC). */
class TopKSpec extends AnyFunSuite {
  import TopK._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def sortAll(cs: Seq[Cand]): Seq[Cand] =
    cs.sortBy(c => (-c.score_micro, c.doc_id))

  private val candsGen: Gen[List[Cand]] = Gen.listOf(for {
    d <- Gen.choose(0L, 50L)
    s <- Gen.choose(0L, 20L) // small ranges force ties
  } yield Cand(d, s)).map(_.distinctBy(_.doc_id))

  test("insert keeps exactly the k best (property, with ties)") {
    check(Prop.forAll(candsGen, Gen.choose(1, 12)) { (cs, k) =>
      val got = cs.foldLeft(Seq.empty[Cand])((b, c) => insert(b, c, k))
      got == sortAll(cs).take(k)
    })
  }

  test("merge == global top-k of the union (property)") {
    check(Prop.forAll(candsGen, candsGen, Gen.choose(1, 12)) { (as0, bs0, k) =>
      // make doc ids disjoint between the two sides
      val as = as0.map(c => c.copy(doc_id = c.doc_id * 2))
      val bs = bs0.map(c => c.copy(doc_id = c.doc_id * 2 + 1))
      val ta = sortAll(as).take(k)
      val tb = sortAll(bs).take(k)
      mergeTopK(ta, tb, k) == sortAll(as ++ bs).take(k)
    })
  }

  test("sortableBits: order-preserving bijection Double <-> Long (property)") {
    val doubles: Gen[Double] = Gen.oneOf(
      Gen.choose(-1.0, 1.0),                        // cosine range
      Gen.choose(-1e12, 1e12),                      // L2 range
      Gen.oneOf(0.0, -0.0, 1.0, -1.0,
        Double.MinPositiveValue, -Double.MinPositiveValue,
        Double.MaxValue, Double.MinValue))
    check(Prop.forAll(doubles, doubles) { (a, b) =>
      val (ea, eb) = (sortableBits(a), sortableBits(b))
      val roundTrip = fromSortableBits(ea) == a && fromSortableBits(eb) == b
      // -0.0 == 0.0 as doubles but has a distinct encoding; compare() is
      // the total order the encoding actually mirrors
      val orderPreserved =
        java.lang.Long.compare(ea, eb).sign == java.lang.Double.compare(a, b).sign
      roundTrip && orderPreserved
    })
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The batched bucket scorer's three accumulation shapes (single-list
  * stream, dense tagged-add, sparse stamped scatter) against a naive
  * reference, INCLUDING the carried-heap seeding across buckets (the θ
  * floor): whatever shape the dispatch picks per (query, bucket), the
  * final heap must equal the frozen-order top-k over the union of all
  * buckets. Ties are forced (tiny contrib range), zero-micro contribs are
  * included (df≈N terms at huge N floor to 0 — the dense path's tag bits
  * exist exactly so those stay distinguishable from untouched slots). */
class BucketTaatSpec extends AnyFunSuite {

  /** One random scenario: `nBuckets` buckets of `width` docs, a global
    * term universe with per-(term, bucket) posting lists, one query. */
  private def runScenario(rnd: Random, width: Int, k: Int, nBuckets: Int,
                          listLen: Int => Int): Unit = {
    val terms = (0 until (2 + rnd.nextInt(4))).map(i => s"t$i")
    val queryTerms = rnd.shuffle(terms).take(1 + rnd.nextInt(terms.size))
    // per bucket: term -> (sorted distinct doc idxs, contribs; 0 allowed)
    val buckets = (0 until nBuckets).map { b =>
      val lists = terms.flatMap { t =>
        if (rnd.nextDouble() < 0.15) None // term absent from this bucket
        else {
          val n = math.min(width, math.max(0, listLen(width)))
          val idxs = rnd.shuffle((0 until width).toList).take(n).sorted.toArray
          val cs = Array.fill(n)(rnd.nextInt(5).toLong) // ties + zeros
          Some(t -> (idxs, cs))
        }
      }.toMap
      (b.toLong * width, lists)
    }
    // naive: global candidate set = docs touched by >=1 present query list
    val naive = buckets.flatMap { case (base, lists) =>
      val acc = scala.collection.mutable.Map.empty[Long, Long]
      queryTerms.foreach { t =>
        lists.get(t).foreach { case (idxs, cs) =>
          idxs.indices.foreach { i =>
            val d = base + idxs(i)
            acc(d) = acc.getOrElse(d, 0L) + cs(i)
          }
        }
      }
      acc.toSeq
    }.sortBy { case (d, s) => (-s, d) }.take(k)
      .map { case (d, s) => TopK.Cand(d, s) }

    val taat = new QueryEngine.BucketTaat(width, k)
    val heap = new QueryEngine.QueryHeap(k)
    buckets.foreach { case (base, lists) =>
      taat.score(queryTerms, lists, base, heap)
    }
    assert(heap.toCands == naive,
      s"width=$width k=$k q=$queryTerms got=${heap.toCands} want=$naive")
  }

  test("scorer == naive across shapes (property, ties + zero contribs)") {
    val rnd = new Random(42)
    (0 until 300).foreach { i =>
      val width = 4 + rnd.nextInt(60)
      val k = 1 + rnd.nextInt(8)
      // rotate the list-length regime so the dispatch exercises all three
      // shapes: tiny lists (sparse), near-full lists (dense), and the
      // single-term draws above cover the single-list stream
      val lens: Int => Int = (i % 3) match {
        case 0 => w => rnd.nextInt(math.max(1, w / 4))          // sparse
        case 1 => w => w - rnd.nextInt(math.max(1, w / 8))      // dense
        case _ => w => rnd.nextInt(w + 1)                       // mixed
      }
      runScenario(rnd, width, k, 1 + rnd.nextInt(4), lens)
    }
  }

  /** Conjunctive analog of [[runScenario]]: required = the query's full
    * distinct-term count; naive keeps only docs touched by EVERY query
    * term's list in their bucket (terms absent from a bucket exclude all
    * of that bucket's docs — per-bucket AND is global AND because a doc
    * lives in exactly one bucket). */
  private def runConjScenario(rnd: Random, width: Int, k: Int, nBuckets: Int,
                              listLen: Int => Int): Unit = {
    val terms = (0 until (2 + rnd.nextInt(4))).map(i => s"t$i")
    val queryTerms = rnd.shuffle(terms).take(1 + rnd.nextInt(terms.size))
    val m = queryTerms.size
    val buckets = (0 until nBuckets).map { b =>
      val lists = terms.flatMap { t =>
        if (rnd.nextDouble() < 0.15) None
        else {
          val n = math.min(width, math.max(0, listLen(width)))
          val idxs = rnd.shuffle((0 until width).toList).take(n).sorted.toArray
          val cs = Array.fill(n)(rnd.nextInt(5).toLong)
          Some(t -> (idxs, cs))
        }
      }.toMap
      (b.toLong * width, lists)
    }
    val naive = buckets.flatMap { case (base, lists) =>
      val acc = scala.collection.mutable.Map.empty[Long, (Long, Int)]
      queryTerms.foreach { t =>
        lists.get(t).foreach { case (idxs, cs) =>
          idxs.indices.foreach { i =>
            val d = base + idxs(i)
            val (s0, n0) = acc.getOrElse(d, (0L, 0))
            acc(d) = (s0 + cs(i), n0 + 1)
          }
        }
      }
      acc.collect { case (d, (s, n)) if n == m => (d, s) }.toSeq
    }.sortBy { case (d, s) => (-s, d) }.take(k)
      .map { case (d, s) => TopK.Cand(d, s) }

    val taat = new QueryEngine.BucketTaat(width, k)
    val heap = new QueryEngine.QueryHeap(k)
    buckets.foreach { case (base, lists) =>
      taat.score(queryTerms, lists, base, heap, required = m)
    }
    assert(heap.toCands == naive,
      s"CONJ width=$width k=$k q=$queryTerms got=${heap.toCands} want=$naive")
  }

  test("conjunctive scorer == naive AND across shapes (property)") {
    val rnd = new Random(1337)
    (0 until 300).foreach { i =>
      val width = 4 + rnd.nextInt(60)
      val k = 1 + rnd.nextInt(8)
      val lens: Int => Int = (i % 3) match {
        case 0 => w => rnd.nextInt(math.max(1, w / 4))          // sparse
        case 1 => w => w - rnd.nextInt(math.max(1, w / 8))      // dense
        case _ => w => rnd.nextInt(w + 1)                       // mixed
      }
      runConjScenario(rnd, width, k, 1 + rnd.nextInt(4), lens)
    }
  }

  test("carried θ floor never drops a true member (adversarial: rising k-th)") {
    // bucket 0 fills the heap with high scores; later buckets contain docs
    // exactly AT and just below the k-th — ties must survive by doc id
    val width = 8
    val k = 3
    val taat = new QueryEngine.BucketTaat(width, k)
    val heap = new QueryEngine.QueryHeap(k)
    val t = "t"
    // bucket 0: scores 10, 9, 8 at docs 0,1,2
    taat.score(Seq(t), Map(t -> (Array(0, 1, 2), Array(10L, 9L, 8L))), 0L, heap)
    assert(heap.kth == 8L)
    // bucket 1 (base 8): doc 8 scores 8 (tie with k-th, LARGER doc id —
    // must lose), doc 9 scores 9 (tie with 2nd, larger id — must slot
    // after doc 1), doc 10 scores 7 (below θ — rejected)
    taat.score(Seq(t), Map(t -> (Array(0, 1, 2), Array(8L, 9L, 7L))), 8L, heap)
    assert(heap.toCands == Seq(TopK.Cand(0, 10), TopK.Cand(1, 9), TopK.Cand(9, 9)))
    // bucket 2 (base 16): doc 16 ties the NEW k-th (9) with smaller... no:
    // larger id — rejected; doc 17 beats everything
    taat.score(Seq(t), Map(t -> (Array(0, 1), Array(9L, 11L))), 16L, heap)
    assert(heap.toCands == Seq(TopK.Cand(17, 11), TopK.Cand(0, 10), TopK.Cand(1, 9)))
  }

  test("dense tag bits: all-zero contribs are candidates, untouched slots are not") {
    val width = 4
    val k = 4
    val taat = new QueryEngine.BucketTaat(width, k)
    val heap = new QueryEngine.QueryHeap(k)
    // two full-width lists (total=8 >= width → dense path), every contrib 0
    val lists = Map(
      "a" -> (Array(0, 1, 2, 3), Array(0L, 0L, 0L, 0L)),
      "b" -> (Array(0, 1, 2, 3), Array(0L, 0L, 0L, 0L)))
    taat.score(Seq("a", "b"), lists, 0L, heap)
    // all four docs are genuine 0-score candidates, ordered by doc id
    assert(heap.toCands == (0 until 4).map(d => TopK.Cand(d.toLong, 0L)))
  }

  test("stamp mask: beginMask invalidates the previous bucket's allows") {
    val width = 4
    val taat = new QueryEngine.BucketTaat(width, k = 4)
    val t = "t"
    val lists = Map(t -> (Array(0, 1, 2, 3), Array(4L, 3L, 2L, 1L)))
    // bucket 0: only offsets 0 and 2 allowed
    val h0 = new QueryEngine.QueryHeap(4)
    taat.beginMask(); taat.allow(0); taat.allow(2)
    taat.score(Seq(t), lists, 0L, h0, masked = true)
    assert(h0.toCands == Seq(TopK.Cand(0, 4), TopK.Cand(2, 2)))
    // bucket 1 reuses the SAME scorer: a fresh mask allowing only offset 1
    // must not leak bucket 0's allows (the reused array is stamp-cleared)
    val h1 = new QueryEngine.QueryHeap(4)
    taat.beginMask(); taat.allow(1)
    taat.score(Seq(t), lists, 4L, h1, masked = true)
    assert(h1.toCands == Seq(TopK.Cand(5, 3)))
    // and masked=false ignores the mask entirely
    val h2 = new QueryEngine.QueryHeap(4)
    taat.score(Seq(t), lists, 8L, h2)
    assert(h2.toCands.map(_.doc_id) == Seq(8L, 9L, 10L, 11L))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** WAND ≡ exhaustive scorer on randomized corpora (SURVEY.md §7.6 item 3:
  * block-max skipping must never drop a true top-k member). Pure JVM —
  * posting rows are built via [[Codec]] directly, no Spark. Mirrors the
  * reference's synthetic self-check (`tests/test_ivf.cpp:27-108`), seeded
  * for determinism (reference precedent seed=123). */
class WandSpec extends AnyFunSuite {

  private def buildLists(corpus: Map[Long, Seq[String]], terms: Seq[String],
                         nDocs: Long, bucketWidth: Long, headDf: Long)
      : (Map[String, (Double, Seq[PostingRow])], Double) = {
    val dl = corpus.map { case (d, toks) => d -> toks.length.toLong }
    val avgdl = dl.values.sum.toDouble / nDocs
    val lists = terms.flatMap { t =>
      val postings = corpus.toSeq
        .map { case (d, toks) => (d, toks.count(_ == t).toLong) }
        .filter(_._2 > 0).sortBy(_._1)
      if (postings.isEmpty) None
      else {
        val df = postings.length.toLong
        val idf = Bm25.idf(nDocs, df)
        val rows =
          if (df > headDf)
            postings.groupBy(p => (p._1 / bucketWidth).toInt).toSeq.sortBy(_._1)
              .map { case (b, ps) =>
                val blocks = Codec.encodeBlocks(
                  ps.map(_._1).toArray, ps.map(_._2.toInt).toArray,
                  ps.map(p => dl(p._1).toInt).toArray, blockSize = 8)
                PostingRow(0, t, b, ps.length.toLong, ps.map(_._2).sum, ps.head._1, blocks)
              }
          else {
            val blocks = Codec.encodeBlocks(
              postings.map(_._1).toArray, postings.map(_._2.toInt).toArray,
              postings.map(p => dl(p._1).toInt).toArray, blockSize = 8)
            Seq(PostingRow(0, t, 0, postings.length.toLong, postings.map(_._2).sum,
              postings.head._1, blocks))
          }
        Some(t -> (idf, rows))
      }
    }.toMap
    (lists, avgdl)
  }

  test("WAND == naive exhaustive top-k on 200 random corpora") {
    val rnd = new scala.util.Random(123)
    val vocab = ('a' to 'z').map(_.toString)
    for (trial <- 1 to 200) {
      val nDocs = 20 + rnd.nextInt(180)
      val corpus = (0L until nDocs.toLong).map { d =>
        val len = 1 + rnd.nextInt(30)
        // Zipf-ish: low letters much more likely
        d -> Seq.fill(len)(vocab(math.min(rnd.nextInt(26), rnd.nextInt(26))))
      }.toMap
      val qTerms = rnd.shuffle(vocab).take(1 + rnd.nextInt(5))
      val (lists, avgdl) = buildLists(corpus, qTerms, nDocs.toLong,
        bucketWidth = 16, headDf = 30)
      if (lists.nonEmpty) {
        val k = 1 + rnd.nextInt(15)
        val wand = Wand.topk(trial, lists, avgdl, k)
        val naive = Wand.naiveTopk(trial, lists, avgdl, k)
        assert(wand == naive, s"trial $trial k=$k qTerms=$qTerms")
      }
    }
  }

  test("exhausted/empty cases") {
    assert(Wand.topk(1, Map.empty, 10.0, 5) == Seq.empty)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Positional sidecar + phrase matching: codec round-trip, phrase hits vs
  * a naive token-window scan (property fuzz over random corpora including
  * repeated-word phrases and overlapping occurrences), and the end-to-end
  * top-k's rank order. */
class PositionalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("PosRow encode/decode round-trip (property)") {
    val rnd = new Random(7)
    (0 until 100).foreach { _ =>
      val nDocs = 1 + rnd.nextInt(8)
      var doc = rnd.nextInt(5).toLong
      val docs = (0 until nDocs).map { _ =>
        doc += 1 + rnd.nextInt(100)
        val npos = 1 + rnd.nextInt(6)
        var p = rnd.nextInt(3)
        val pos = (0 until npos).map { _ => p += 1 + rnd.nextInt(9); p }.toArray
        (doc, 1 + rnd.nextInt(200), pos)
      }
      val row = Positional.encodeRow("t", 3, docs)
      assert(row.n == nDocs && row.min_doc == docs.head._1)
      val back = Positional.decodeRow(row)
      assert(back.map(d => (d.doc_id, d.dl, d.positions.toSeq)) ==
        docs.map(d => (d._1, d._2, d._3.toSeq)))
    }
  }

  /** Naive phrase tf: count sliding-window matches over the token list
    * (overlapping starts count). */
  private def naiveTf(tokens: Seq[String], phrase: Seq[String]): Int =
    tokens.sliding(phrase.size).count(_ == phrase)

  test("phraseHits == naive sliding-window scan (property fuzz)") {
    val rnd = new Random(99)
    import spark.implicits._
    (0 until 5).foreach { round =>
      val vocab = Vector("a", "b", "c", "d")
      val corpus = (0 until 40).map { i =>
        val n = 3 + rnd.nextInt(30)
        (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val docsDf = corpus.toDF("doc_id", "text")
      val phrases = Seq(
        1 -> Seq("a", "b"),
        2 -> Seq("a", "a"),            // repeated word, overlapping starts
        3 -> Seq("b", "c", "d"),
        4 -> Seq("a", "a", "a"),
        5 -> Seq("a", "zz")            // absent term
      )
      val pos = Positional.build(spark, docsDf, width = 8)
      val got = Positional.phraseHits(spark, pos, phrases)
        .as[(Int, Long, Long, Long)].collect().toSet
      val want = (for {
        (pid, ph) <- phrases
        (doc, text) <- corpus
        toks = Tokenize.tokenize(text)
        tf = naiveTf(toks, ph) if tf > 0
      } yield (pid, doc, tf.toLong, toks.size.toLong)).toSet
      assert(got == want, s"round $round: got=$got want=$want")
    }
  }

  /** Naive ordered-proximity tf: #position pairs (pa, pb) of (t1, t2)
    * with 1 ≤ pb − pa ≤ slop + 1. */
  private def naiveProxTf(tokens: Seq[String], t1: String, t2: String,
                          slop: Int): Int = {
    val pa = tokens.zipWithIndex.collect { case (t, i) if t == t1 => i }
    val pb = tokens.zipWithIndex.collect { case (t, i) if t == t2 => i }
    pa.map(a => pb.count(b => b > a && b <= a + slop + 1)).sum
  }

  test("proximityHits == naive window count; slop 0 == phrase (property fuzz)") {
    val rnd = new Random(2024)
    import spark.implicits._
    (0 until 5).foreach { round =>
      val vocab = Vector("a", "b", "c")
      val corpus = (0 until 30).map { i =>
        val n = 3 + rnd.nextInt(25)
        (i.toLong, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val docsDf = corpus.toDF("doc_id", "text")
      val pairs = Seq(
        (1, "a", "b", 0), (2, "a", "b", 3), (3, "a", "a", 2),
        (4, "b", "c", 1), (5, "a", "zz", 4))
      val pos = Positional.build(spark, docsDf, width = 8)
      val got = Positional.proximityHits(spark, pos, pairs)
        .as[(Int, Long, Long, Long)].collect().toSet
      val want = (for {
        (pid, t1, t2, slop) <- pairs
        (doc, text) <- corpus
        toks = Tokenize.tokenize(text)
        tf = naiveProxTf(toks, t1, t2, slop) if tf > 0
      } yield (pid, doc, tf.toLong, toks.size.toLong)).toSet
      assert(got == want, s"round $round")
      // slop 0 ≡ the bigram phrase
      val phr = Positional.phraseHits(spark, pos, Seq(1 -> Seq("a", "b")))
        .as[(Int, Long, Long, Long)].collect().toSet
      assert(phr == got.filter(_._1 == 1), s"round $round: slop0 != phrase")
    }
  }

  test("phraseTopK: frozen order, dense ranks, absent-term phrases empty") {
    import spark.implicits._
    val docsDf = Stats.readDocuments(spark, "/root/testdata/sf0.001")
    val cs = Stats.corpus(docsDf)
    val pos = Positional.build(spark, docsDf, width = 128)
    val out = Positional.phraseTopK(spark, pos, PhraseSet.phrases,
      PhraseSet.K, cs.n_docs, cs.avgdl)
      .as[(Int, Int, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    // phrase 6 contains 'plan' (absent from the corpus) — must match nothing
    assert(!out.exists(_._1 == 6))
    out.groupBy(_._1).foreach { case (pid, hs) =>
      assert(hs.map(_._2).sorted == (1 to hs.length), s"ranks not dense for p$pid")
      val sorted = hs.sortBy(h => (-h._4, h._3))
      assert(hs.sortBy(_._2).map(h => (h._3, h._4)) == sorted.map(h => (h._3, h._4)),
        s"order not frozen for p$pid")
    }
  }

  test("conjunctive topk: every hit contains ALL query terms; subset of disjunctive candidates") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val docsDf = Stats.readDocuments(spark, sfDir)
    val conj = SparkEntry.queries("q_topk_conj")(spark, sfDir)
      .as[(Int, Int, Long, Long)].collect().toSeq
    assert(conj.nonEmpty)
    val textById = docsDf.select($"doc_id", $"text").as[(Long, String)]
      .collect().toMap
    val qterms = QuerySet.queryTerms.toMap
    conj.foreach { case (qid, _, doc, _) =>
      val toks = Tokenize.tokenize(textById(doc)).toSet
      assert(qterms(qid).forall(toks.contains),
        s"q$qid doc $doc missing a query term")
    }
    // absent-term queries (6, 17, 20) match nothing under AND
    assert(!conj.exists(h => Set(6, 17, 20).contains(h._1)))
  }
}

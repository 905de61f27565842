package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Seeded end-to-end fuzz: random corpora × random build configs ×
  * random query batches, disk-indexed in BOTH layouts, must be
  * rank-identical to the exact oracle. Exercises the interactions the
  * targeted specs pin individually: sparse docIds across bucket ranges,
  * sampled head salting (inv > 1) with max_bucket routing, the
  * head-heavy rebucket fallback, zero-token docs, unknown query terms,
  * and tie-breaking under heavy score collisions. */
class RandomizedEngineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("/root/repo/target"), "fuzz").toString

  test("random corpora + configs + queries: disk index == oracle (8 seeded rounds, both layouts)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260817L)
    val vocab = ('a' to 'o').map(c => s"w$c") // 15 terms → heavy collisions
    for (iter <- 1 to 8) {
      val n = 30 + rnd.nextInt(120)
      var id = 0L
      val docs = (0 until n).map { _ =>
        id += 1 + rnd.nextInt(5) // sparse, gappy docIds
        val len = rnd.nextInt(40) // zero-token docs included
        (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("doc_id", "text")
      val cfg = IndexBuild.Config(
        numPartitions = 4 + rnd.nextInt(12),
        bucketWidth = 8 + rnd.nextInt(56),
        headDf = 2 + rnd.nextInt(18),
        headSampleInv = 1 + rnd.nextInt(4),
        docPartitioned = iter % 2 == 0,
        codec = if (rnd.nextBoolean()) Codec.PForId else Codec.VByteId)
      val queries = (1 to 4).map { qid =>
        val nt = 1 + rnd.nextInt(3)
        val ts = Seq.fill(nt)(vocab(rnd.nextInt(vocab.size))) ++
          (if (rnd.nextBoolean()) Seq("zz_unknown") else Nil)
        (qid, ts.distinct)
      }
      val dir = tmpDir()
      IndexBuild.writeIndex(spark, docs, dir, cfg)
      val got = QueryEngine.runOnIndex(spark, dir, queries)
        .as[(Int, Int, Long, Long)].collect().toSeq
      val oracle = Oracle.topk(spark, docs, queries = queries)
        .as[(Int, Int, Long, Long)].collect().toSeq
      assert(got == oracle,
        s"iter=$iter cfg=$cfg queries=$queries: indexed != oracle")
    }
  }

  test("random micro-batch chunkings: streamed ingest + compaction == one-shot build (5 seeded rounds)") {
    import spark.implicits._
    import graft.streaming.StreamIngest
    val rnd = new scala.util.Random(20260818L)
    val vocab = ('a' to 'o').map(c => s"w$c")
    for (iter <- 1 to 5) {
      val n = 30 + rnd.nextInt(90)
      val pages = (0 until n).map { i =>
        val len = rnd.nextInt(30)
        val text = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (f"https://x.org/${rnd.nextInt(1000)}%03d/$i", text)
      }
      val cfg = IndexBuild.Config(
        numPartitions = 4 + rnd.nextInt(8),
        bucketWidth = 8 + rnd.nextInt(56),
        headDf = 2 + rnd.nextInt(18),
        docPartitioned = iter % 2 == 0)
      // random chunking, empty chunks included
      val nChunks = 1 + rnd.nextInt(4)
      val chunks: Seq[Seq[(String, String)]] = {
        val base = pages.grouped(math.max(1, n / nChunks)).toSeq
        if (rnd.nextBoolean()) base :+ Seq.empty else base
      }
      val workDir = tmpDir()
      val tierFactor = 2 + rnd.nextInt(2) // fuzz the tier policy too
      chunks.zipWithIndex.foreach { case (ch, id) =>
        val wrapped = ch.map { case (u, t) =>
          (u, s"<html><body>$t</body></html>".getBytes("UTF-8"))
        }.toDF("url", "html")
        StreamIngest.ingestBatch(spark, wrapped, workDir, cfg, id.toLong)
        if (rnd.nextBoolean()) StreamIngest.tierUp(spark, workDir, tierFactor)
      }
      // expected corpus: per-chunk url rank + monotone offsets
      var offset = 0L
      val expected = chunks.flatMap { ch =>
        val rows = ch.sortBy(_._1).zipWithIndex.map { case ((u, t), i) =>
          (offset + i, t)
        }
        offset += ch.size
        rows
      }
      val oneShot = tmpDir(); val serving = tmpDir()
      IndexBuild.writeIndex(spark, expected.toDF("doc_id", "text"), oneShot, cfg)
      StreamIngest.compact(spark, workDir, serving)
      val dec = (d: String) => IndexBuild.readSegments(spark, d)
        .flatMap(Codec.decodeAll _).as[Posting]
        .collect().toSeq.sortBy(p => (p.term, p.doc_id))
      assert(dec(serving) == dec(oneShot),
        s"iter=$iter chunks=${chunks.map(_.size)} cfg=$cfg: streamed != one-shot")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.extra.Pages
import graft.streaming.StreamIngest
import java.nio.file.Files

/** Structured-Streaming incremental ingest: per-micro-batch segment
  * builds + concat compaction must reproduce the one-shot batch build
  * POSTING-identically (reference InsertIvf analog: lists grow without
  * re-reading earlier data), and batch replay must be a no-op. */
class StreamIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("/root/repo/target"), "stream").toString

  test("streamed micro-batch builds + compaction == one-shot build; replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Stats.readDocuments(spark, sfDir)
    // the input_hint pages stream, arriving in three chunks
    val pages = Pages.fromDocuments(docs)
      .select($"url", $"html").as[(String, Array[Byte])].collect().toSeq
    val chunks = pages.grouped((pages.size + 2) / 3).toSeq
    assert(chunks.size == 3)

    val workDir = tmpDir()
    val cfg = SparkEntry.testConfig
    val ms = MemoryStream[(String, Array[Byte])]
    val q = StreamIngest.start(ms.toDS().toDF("url", "html"), workDir, cfg)
    try {
      chunks.foreach { ch => ms.addData(ch: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(StreamIngest.committedBatchIds(spark, workDir).size == 3)

    // expected corpus: per-chunk url-ranked ids + monotone offsets — the
    // ids the stream assigned; one-shot build over it is the comparator
    var offset = 0L
    val expected = chunks.flatMap { ch =>
      val rows = ch.sortBy(_._1).zipWithIndex.map { case ((url, html), i) =>
        (offset + i, url, Pages.extractText(html))
      }
      offset += ch.size
      rows
    }
    val oneShot = tmpDir()
    IndexBuild.writeIndex(spark,
      expected.toDF("doc_id", "url", "text"), oneShot, cfg)

    val serving = tmpDir()
    val meta = StreamIngest.compact(spark, workDir, serving)
    assert(meta.n_docs == docs.count())
    val metaOne = IndexBuild.readMeta(spark, oneShot)
    assert((meta.n_docs, meta.n_tokens, meta.min_doc_id, meta.max_doc_id) ==
      (metaOne.n_docs, metaOne.n_tokens, metaOne.min_doc_id, metaOne.max_doc_id))
    // POSTING-identical to the one-shot build (block boundaries may
    // differ across the concat seam; salting is batch-local — same
    // contract as MergeSpec's concat test)
    val dec = (d: String) => IndexBuild.readSegments(spark, d)
      .flatMap(Codec.decodeAll _).as[Posting]
      .collect().toSeq.sortBy(p => (p.term, p.doc_id))
    assert(dec(serving) == dec(oneShot))
    val st = (d: String) => spark.read.parquet(s"$d/stats/terms")
      .select($"term", $"df", $"cf").as[(String, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(st(serving) == st(oneShot))
    // query the compacted index == query the one-shot index
    val res = (d: String) => QueryEngine.runOnIndex(spark, d)
      .as[(Int, Int, Long, Long)].collect().toSeq
    assert(res(serving) == res(oneShot))

    // tiering (T=2) folded batches 0+1 into one segment and stripped the
    // batch dirs to their stats/meta replay markers
    val units = StreamIngest.currentUnits(spark, workDir)
    assert(units.map(u => (u.lo, u.hi)) == Seq((0L, 1L), (2L, 2L)))
    assert(!new java.io.File(
      s"${StreamIngest.batchDir(workDir, 1)}/segments").exists())

    // replay of an already-committed (now stripped) batch is a no-op
    // (exactly-once on top of the streaming checkpoint): the meta marker
    // short-circuits it and nothing gets rebuilt
    val replayed = StreamIngest.ingestBatch(spark,
      chunks(1).toDF("url", "html"), workDir, cfg, batchId = 1)
    assert(replayed.isDefined)
    assert(!new java.io.File(
      s"${StreamIngest.batchDir(workDir, 1)}/segments").exists())
    assert(StreamIngest.committedBatchIds(spark, workDir).size == 3)
  }

  test("streamed sidecars: per-batch attrs + positions fold through tiers; filtered/phrase queries exact") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Stats.readDocuments(spark, sfDir)
    val pages = Pages.fromDocuments(docs)
      .select($"url", $"html").as[(String, Array[Byte])].collect().toSeq
    val chunks = pages.grouped((pages.size + 2) / 3).toSeq

    val workDir = tmpDir()
    val cfg = SparkEntry.testConfig
    val ms = MemoryStream[(String, Array[Byte])]
    val q = StreamIngest.start(ms.toDS().toDF("url", "html"), workDir, cfg,
      attrCols = Seq("n_chars"), withPositions = true)
    try {
      chunks.foreach { ch => ms.addData(ch: _*); q.processAllAvailable() }
    } finally q.stop()

    // every LIVE unit (merged segment or uncovered batch) carries both
    // sidecars — the tier merges folded them along with the postings
    StreamIngest.currentUnits(spark, workDir).foreach { u =>
      assert(Attrs.hasAttrs(spark, u.dir), s"no attrs on ${u.dir}")
      assert(Positional.hasPositions(spark, Positional.positionsDir(u.dir)),
        s"no positions on ${u.dir}")
    }

    val serving = tmpDir()
    StreamIngest.compact(spark, workDir, serving)
    assert(Attrs.hasAttrs(spark, serving))
    assert(Positional.hasPositions(spark, Positional.positionsDir(serving)))

    // comparator corpus: the ids the stream assigned (per-chunk url rank
    // + monotone offsets), with the same derived n_chars
    var offset = 0L
    val expected = chunks.flatMap { ch =>
      val rows = ch.sortBy(_._1).zipWithIndex.map { case ((url, html), i) =>
        (offset + i, url, Pages.extractText(html))
      }
      offset += ch.size
      rows
    }
    val expDf = expected.toDF("doc_id", "url", "text")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
    val rows = (df: org.apache.spark.sql.DataFrame) =>
      df.as[(Int, Int, Long, Long)].collect().toSeq
    // range-filtered query over the compacted index == exact oracle
    val got = rows(QueryEngine.runOnIndex(spark, serving,
      rangeFilter = Some(("n_chars", 120.0, 260.0))))
    assert(got == rows(Oracle.topkFilteredRange(spark, expDf, "n_chars", 120.0, 260.0)))
    assert(got.nonEmpty)
    // phrase query over the compacted positions == a one-shot sidecar
    val cs = Stats.corpus(expDf)
    val onePos = s"${tmpDir()}/positions"
    Positional.writeBuild(spark, expDf, onePos, cfg.bucketWidth, cfg.numPartitions)
    val tk = (d: String) =>
      rows(Positional.phraseTopK(spark, Positional.read(spark, d),
        PhraseSet.phrases, PhraseSet.K, cs.n_docs, cs.avgdl))
    val gotP = tk(Positional.positionsDir(serving))
    assert(gotP == tk(onePos) && gotP.nonEmpty)

    // kill-window repair: wipe one live batch's sidecars (an index that
    // committed before its sidecar writes died), replay the batch —
    // ingestBatch rebuilds exactly the missing sidecars
    val liveBatch = StreamIngest.currentUnits(spark, workDir)
      .filter(u => u.lo == u.hi).head
    val fsys = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(Attrs.attrsDir(liveBatch.dir)), true)
    fsys.delete(new org.apache.hadoop.fs.Path(
      Positional.positionsDir(liveBatch.dir)), true)
    StreamIngest.ingestBatch(spark, chunks(liveBatch.lo.toInt).toDF("url", "html"),
      workDir, cfg, liveBatch.lo, attrCols = Seq("n_chars"), withPositions = true)
    assert(Attrs.hasAttrs(spark, liveBatch.dir))
    assert(Positional.hasPositions(spark, Positional.positionsDir(liveBatch.dir)))
    // the repaired log still compacts to the same filtered answer
    val serving2 = tmpDir()
    StreamIngest.compact(spark, workDir, serving2)
    assert(rows(QueryEngine.runOnIndex(spark, serving2,
      rangeFilter = Some(("n_chars", 120.0, 260.0)))) == got)
  }

  test("tiered compaction: K batches merge with O(log K) rewrites, == one-shot build") {
    import spark.implicits._
    val docs = Stats.readDocuments(spark, sfDir)
    val pages = extra.Pages.fromDocuments(docs)
      .select($"url", $"html").as[(String, Array[Byte])].collect().toSeq
    val k = 8
    val chunks = pages.grouped((pages.size + k - 1) / k).toSeq
    assert(chunks.size == k)
    val workDir = tmpDir()
    val cfg = SparkEntry.testConfig
    val mergeLog = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    chunks.zipWithIndex.foreach { case (ch, i) =>
      StreamIngest.ingestBatch(spark, ch.toDF("url", "html"), workDir, cfg, i.toLong)
      mergeLog ++= StreamIngest.tierUp(spark, workDir, tierFactor = 2)
    }
    // binary-counter dynamics: 8 batches collapse to ONE segment via
    // exactly K-1 = 7 pairwise merges, and total rewrite mass is
    // K·log2(K) = 24 batch-units — no posting rewritten more than 3 times
    assert(StreamIngest.currentUnits(spark, workDir)
      .map(u => (u.lo, u.hi)) == Seq((0L, 7L)))
    assert(mergeLog.size == k - 1)
    assert(mergeLog.map(_._3).sum == k * 3)
    assert(mergeLog.map(m => (m._1, m._2)).toSet ==
      Set((0L, 1L), (2L, 3L), (0L, 3L), (4L, 5L), (6L, 7L), (4L, 7L), (0L, 7L)))

    // the compacted serving index equals the one-shot build over the same
    // id-assigned corpus
    var offset = 0L
    val expected = chunks.flatMap { ch =>
      val rows = ch.sortBy(_._1).zipWithIndex.map { case ((url, html), i) =>
        (offset + i, url, extra.Pages.extractText(html))
      }
      offset += ch.size
      rows
    }
    val oneShot = tmpDir()
    IndexBuild.writeIndex(spark, expected.toDF("doc_id", "url", "text"), oneShot, cfg)
    val serving = tmpDir()
    StreamIngest.compact(spark, workDir, serving)
    val dec = (d: String) => IndexBuild.readSegments(spark, d)
      .flatMap(Codec.decodeAll _).as[Posting]
      .collect().toSeq.sortBy(p => (p.term, p.doc_id))
    assert(dec(serving) == dec(oneShot))
    val res = (d: String) => QueryEngine.runOnIndex(spark, d)
      .as[(Int, Int, Long, Long)].collect().toSeq
    assert(res(serving) == res(oneShot))
  }

  test("tierUp reclaims merge inputs orphaned by a kill after the segment commit") {
    import spark.implicits._
    val docs = Stats.readDocuments(spark, sfDir)
    val pages = Pages.fromDocuments(docs)
      .select($"url", $"html").as[(String, Array[Byte])].collect().toSeq
    val chunks = pages.grouped((pages.size + 3) / 4).toSeq
    assert(chunks.size == 4)
    val workDir = tmpDir()
    val cfg = SparkEntry.testConfig
    chunks.zipWithIndex.foreach { case (ch, i) =>
      StreamIngest.ingestBatch(spark, ch.toDF("url", "html"), workDir, cfg, i.toLong)
    }
    // simulate three merges each killed between the merged segment's
    // meta-last commit and its input cleanup: segs committed, inputs
    // (batch dirs, then the two intermediate segs) left at full weight
    Merge.concatMergeIndexes(spark,
      Seq(StreamIngest.batchDir(workDir, 0), StreamIngest.batchDir(workDir, 1)),
      StreamIngest.segDir(workDir, 0, 1))
    Merge.concatMergeIndexes(spark,
      Seq(StreamIngest.batchDir(workDir, 2), StreamIngest.batchDir(workDir, 3)),
      StreamIngest.segDir(workDir, 2, 3))
    Merge.concatMergeIndexes(spark,
      Seq(StreamIngest.segDir(workDir, 0, 1), StreamIngest.segDir(workDir, 2, 3)),
      StreamIngest.segDir(workDir, 0, 3))
    val ex = (p: String) => new java.io.File(p).exists()
    assert(ex(StreamIngest.segDir(workDir, 0, 1))) // orphan state on disk
    assert(ex(IndexBuild.segmentsDir(StreamIngest.batchDir(workDir, 0))))
    // the log itself already reads correctly (subsumption filter) ...
    assert(StreamIngest.currentUnits(spark, workDir)
      .map(u => (u.lo, u.hi)) == Seq((0L, 3L)))
    // ... and tierUp's entry sweep reclaims the invisible disk mass:
    // subsumed seg dirs deleted, covered batch dirs stripped to meta
    StreamIngest.tierUp(spark, workDir)
    assert(!ex(StreamIngest.segDir(workDir, 0, 1)))
    assert(!ex(StreamIngest.segDir(workDir, 2, 3)))
    (0 to 3).foreach { i =>
      assert(!ex(IndexBuild.segmentsDir(StreamIngest.batchDir(workDir, i.toLong))))
    }
    // replay/offset tombstones survive, and the log is unchanged
    assert(StreamIngest.committedBatchIds(spark, workDir) == Seq(0L, 1L, 2L, 3L))
    assert(StreamIngest.currentUnits(spark, workDir)
      .map(u => (u.lo, u.hi)) == Seq((0L, 3L)))
    // the reclaimed log still serves: compaction == one-shot content
    val serving = tmpDir()
    StreamIngest.compact(spark, workDir, serving)
    assert(QueryEngine.runOnIndex(spark, serving).count() > 0)
  }
}

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

    // replay of an already-committed batch is a no-op (exactly-once on
    // top of the streaming checkpoint): content before == after
    val before = dec(StreamIngest.batchDir(workDir, 1))
    val replayed = StreamIngest.ingestBatch(spark,
      chunks(1).toDF("url", "html"), workDir, cfg, batchId = 1)
    assert(replayed.isDefined)
    assert(dec(StreamIngest.batchDir(workDir, 1)) == before)
    assert(StreamIngest.committedBatchIds(spark, workDir).size == 3)
  }
}

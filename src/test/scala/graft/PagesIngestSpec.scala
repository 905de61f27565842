package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.extra.Pages
import java.nio.file.Files

/** The full north-star composition: a pages table of the input_hint
  * shape (url, warc_ts, html BINARY, text, lang) → ingest (binary text
  * extraction + dense url-ranked doc ids) → disk index build → batched
  * BM25 query — rank-identical to the exact oracle computed over the
  * ingested corpus. */
class PagesIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("/root/repo/target"), "ing").toString

  test("pages → ingest → index → query == oracle over the ingested corpus") {
    import spark.implicits._
    val docs = Stats.readDocuments(spark, "/root/testdata/sf0.01")
    val pages = Pages.fromDocuments(docs)
    val corpus = Pages.toDocuments(pages).cache()
    try {
      // ids are dense 0..n-1 in url order; extraction is byte-identical
      val n = corpus.count()
      assert(n == docs.count())
      val ids = corpus.select($"doc_id").as[Long].collect().sorted
      assert(ids.head == 0L && ids.last == n - 1 && ids.distinct.length == n)
      val urlText = corpus.select($"url", md5($"text")).as[(String, String)].collect().toMap
      val direct = docs.select(
          concat(lit("https://example.org/"), $"source", lit("/"), $"doc_id"),
          md5($"text")).as[(String, String)].collect().toMap
      assert(urlText == direct)
      // index the INGESTED corpus and query it
      val dir = tmpDir()
      IndexBuild.writeIndex(spark, corpus, dir, SparkEntry.testConfig)
      val got = QueryEngine.runOnIndex(spark, dir)
        .as[(Int, Int, Long, Long)].collect().toSeq
      val oracle = Oracle.topk(spark, corpus)
        .as[(Int, Int, Long, Long)].collect().toSeq
      assert(got == oracle && got.nonEmpty)
    } finally { corpus.unpersist(); () }
  }
}

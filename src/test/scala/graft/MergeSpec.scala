package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Segment merge: merging per-half indexes must reproduce the single
  * full build EXACTLY (stats, postings bytes, query results) — the
  * FIXTURES.md §6 contract (reference analog: LoadFromBook unioning
  * per-cluster segment files). */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  private def tmpDir(): String =
    Files.createTempDirectory(java.nio.file.Paths.get("/root/repo/target"), "mrg").toString

  test("merge(halves) == single full build (interleaved doc_id % 2 split)") {
    import spark.implicits._
    val docs = Stats.readDocuments(spark, sfDir).cache()
    val full = tmpDir(); val h0 = tmpDir(); val h1 = tmpDir(); val merged = tmpDir()
    IndexBuild.writeIndex(spark, docs, full, SparkEntry.testConfig)
    IndexBuild.writeIndex(spark, docs.where($"doc_id" % 2 === 0), h0, SparkEntry.testConfig)
    IndexBuild.writeIndex(spark, docs.where($"doc_id" % 2 === 1), h1, SparkEntry.testConfig)
    Merge.mergeIndexes(spark, Seq(h0, h1), merged)

    // meta identical
    assert(IndexBuild.readMeta(spark, merged) == IndexBuild.readMeta(spark, full))
    // stats identical
    val st = (d: String) => spark.read.parquet(s"$d/stats/terms")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(st(merged) == st(full))
    // posting rows identical INCLUDING compressed block bytes
    val rows = (d: String) => IndexBuild.readSegments(spark, d).collect().toSeq
      .sortBy(r => (r.term, r.bucket))
      .map(r => (r.part_id, r.term, r.bucket, r.n, r.min_doc,
        r.blocks.map(b => (b.max_doc, b.n, b.max_tf, b.min_dl, b.bytes.toSeq))))
    assert(rows(merged) == rows(full))
    // query results identical to the exact oracle
    val q = (d: String) => QueryEngine.runOnIndex(spark, d)
      .as[(Int, Int, Long, Long)].collect().toSeq
    val oracle = Oracle.topk(spark, docs).as[(Int, Int, Long, Long)].collect().toSeq
    assert(q(merged) == oracle && q(full) == oracle)
    docs.unpersist()
  }

  test("three-way merge in two passes == one three-way merge") {
    import spark.implicits._
    val docs = Stats.readDocuments(spark, "/root/testdata/sf0.001").cache()
    val parts = (0 until 3).map { i =>
      val d = tmpDir()
      IndexBuild.writeIndex(spark, docs.where($"doc_id" % 3 === i), d, SparkEntry.testConfig)
      d
    }
    val onePass = tmpDir(); val twoPassA = tmpDir(); val twoPass = tmpDir()
    Merge.mergeIndexes(spark, parts, onePass)
    Merge.mergeIndexes(spark, parts.take(2), twoPassA)
    Merge.mergeIndexes(spark, Seq(twoPassA, parts(2)), twoPass)
    val rows = (d: String) => IndexBuild.readSegments(spark, d).collect().toSeq
      .sortBy(r => (r.term, r.bucket))
      .map(r => (r.part_id, r.term, r.bucket, r.n, r.min_doc,
        r.blocks.map(b => (b.max_doc, b.n, b.max_tf, b.min_dl, b.bytes.toSeq))))
    assert(rows(onePass) == rows(twoPass))
    docs.unpersist()
  }
}

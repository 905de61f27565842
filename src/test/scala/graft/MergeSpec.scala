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
      .select($"term", $"df", $"cf", $"max_bucket")
      .as[(String, Long, Long, Int)].collect().toSeq.sortBy(_._1)
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

  test("concat fast merge (disjoint docId intervals): posting-identical, query-identical") {
    import spark.implicits._
    val docs = Stats.readDocuments(spark, sfDir).cache()
    val mid = 250L // sf0.01 has doc_id 0..499 — two disjoint INTERVALS
    val full = tmpDir(); val lo = tmpDir(); val hi = tmpDir(); val merged = tmpDir()
    IndexBuild.writeIndex(spark, docs, full, SparkEntry.testConfig)
    IndexBuild.writeIndex(spark, docs.where($"doc_id" < mid), lo, SparkEntry.testConfig)
    IndexBuild.writeIndex(spark, docs.where($"doc_id" >= mid), hi, SparkEntry.testConfig)
    Merge.concatMergeIndexes(spark, Seq(lo, hi), merged)

    // stats and meta identical to the full build (exact additive merge).
    // max_bucket is a LAYOUT column: concat preserves the inputs' layout
    // (each half's head terms were below headDf -> unsalted), so it is
    // compared against the inputs, not the (re-salted) full build.
    assert(IndexBuild.readMeta(spark, merged) == IndexBuild.readMeta(spark, full))
    val st = (d: String) => spark.read.parquet(s"$d/stats/terms")
      .select($"term", $"df", $"cf")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(st(merged) == st(full))
    val maxB = (d: String) => spark.read.parquet(s"$d/stats/terms")
      .select($"term", $"max_bucket").as[(String, Int)].collect().toMap
    val inB = (maxB(lo).toSeq ++ maxB(hi).toSeq).groupBy(_._1)
      .map { case (t, xs) => t -> xs.map(_._2).max }
    assert(maxB(merged) == inB)
    // POSTING-identical (block boundaries may differ — no decode happened)
    val dec = (d: String) => IndexBuild.readSegments(spark, d)
      .flatMap(Codec.decodeAll _).as[Posting]
      .collect().toSeq.sortBy(p => (p.term, p.doc_id))
    assert(dec(merged) == dec(full))
    // per-row invariants survive concat: n/cf/min_doc consistent with blocks
    IndexBuild.readSegments(spark, merged).collect().foreach { r =>
      assert(r.n == r.blocks.map(_.n.toLong).sum)
      val ps = Codec.decodeAll(r)
      assert(r.cf == ps.map(_.tf).sum && r.min_doc == ps.head.doc_id)
      assert(ps.map(_.doc_id) == ps.map(_.doc_id).sorted)
    }
    // query results identical to the exact oracle
    val q = QueryEngine.runOnIndex(spark, merged)
      .as[(Int, Int, Long, Long)].collect().toSeq
    val oracle = Oracle.topk(spark, docs).as[(Int, Int, Long, Long)].collect().toSeq
    assert(q == oracle)

    // interleaved inputs are rejected (must use the re-encoding merge)
    val e0 = tmpDir(); val e1 = tmpDir(); val bad = tmpDir()
    IndexBuild.writeIndex(spark, docs.where($"doc_id" % 2 === 0), e0, SparkEntry.testConfig)
    IndexBuild.writeIndex(spark, docs.where($"doc_id" % 2 === 1), e1, SparkEntry.testConfig)
    // rejected DRIVER-SIDE (meta interval check) before anything is
    // written: a bad merge must not leave a half-written outDir
    val ex = intercept[IllegalArgumentException] {
      Merge.concatMergeIndexes(spark, Seq(e0, e1), bad)
    }
    assert(ex.getMessage.contains("overlap"))
    assert(!new java.io.File(s"$bad/stats/meta").exists)
    docs.unpersist()
  }
}

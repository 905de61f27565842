package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.{IndexBuild, Merge}
import graft.extra.Pages

/** Incremental index maintenance via Structured Streaming — the
  * Spark-first expression of the reference's incremental insert
  * (`InsertIvf`, `src/index_ivf.cpp:82-108`: posting lists grow without
  * re-reading earlier data) over the input_hint pages stream.
  *
  * Shape (the Lucene segment + merge-policy pattern, reusing this repo's
  * proven pieces — nothing here is a new index format):
  *
  *  - each micro-batch of pages extracts text ([[Pages.toDocuments]]),
  *    takes a MONOTONE dense doc-id offset (1 + max doc id over all
  *    previously committed batch indexes), and runs the normal
  *    [[IndexBuild.writeIndex]] into its own `batches/batch=<id>` dir —
  *    a complete, independently queryable index whose docId interval is
  *    disjoint from every other batch's by construction;
  *  - [[compact]] folds the batch indexes into one serving index with
  *    [[Merge.concatMergeIndexes]] — the zero-decode block concat, legal
  *    exactly BECAUSE the intervals are disjoint; the result is
  *    bit-identical to a one-shot build of the concatenated corpus
  *    (MergeSpec invariant, re-asserted end-to-end in StreamIngestSpec).
  *
  * Exactly-once: Spark's streaming checkpoint dedupes batch REPLAY, and
  * [[ingestBatch]] is idempotent on top — a replayed batch sees its
  * committed `stats/meta` (the build's commit point, written LAST) and
  * skips; a batch killed MID-build left no meta, and its doc-id offset
  * re-derives identically because it reads only batches with SMALLER ids
  * (deterministic extraction ⇒ the rebuild is byte-identical). This is
  * the same manifest-last discipline as the batch engine's resume path.
  *
  * Scale shape: per-batch work is one fused build over the batch (no
  * global state, no re-tokenize of old data); compaction cost is one
  * read+concat of compressed blocks, amortized at any batch count the
  * usual exponential merge tiers would give — at 10^12 docs the batches
  * are Iceberg-partition-sized and this IS the checkpointed per-partition
  * build the north rule asks for, driven by a stream instead of a loop.
  */
object StreamIngest {

  def batchDir(workDir: String, batchId: Long): String =
    f"$workDir/batches/batch=$batchId%05d"

  private def fs(spark: SparkSession) =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def committed(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/stats/meta")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Ids of batches already committed under workDir (meta present). */
  def committedBatchIds(spark: SparkSession, workDir: String): Seq[Long] = {
    val base = new org.apache.hadoop.fs.Path(s"$workDir/batches")
    val f = fs(spark)
    if (!f.exists(base)) Seq.empty
    else f.listStatus(base).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("batch=") => s.stripPrefix("batch=").toLong }
      .filter(id => committed(spark, batchDir(workDir, id)))
      .sorted
  }

  /** One micro-batch: extract → offset ids → build a segment index.
    * Idempotent (replay sees the committed meta and skips). Returns the
    * batch's meta, or None for an empty/replayed batch. */
  def ingestBatch(spark: SparkSession, pagesBatch: DataFrame, workDir: String,
                  cfg: IndexBuild.Config, batchId: Long): Option[IndexBuild.Meta] = {
    val dir = batchDir(workDir, batchId)
    if (committed(spark, dir)) return Some(IndexBuild.readMeta(spark, dir))
    if (pagesBatch.isEmpty) return None
    // monotone offset from PRIOR batches only — deterministic on replay
    val offset = committedBatchIds(spark, workDir).filter(_ < batchId)
      .map(id => IndexBuild.readMeta(spark, batchDir(workDir, id)).max_doc_id + 1)
      .foldLeft(0L)(math.max)
    val docs = Pages.toDocuments(pagesBatch)
      .select((col("doc_id") + offset).as("doc_id"), col("text"))
    Some(IndexBuild.writeIndex(spark, docs, dir, cfg))
  }

  /** Wire a streaming pages source into per-batch index builds. The
    * caller owns the trigger/await; checkpoint lives under workDir. */
  def start(pages: DataFrame, workDir: String,
            cfg: IndexBuild.Config): StreamingQuery = {
    val spark = pages.sparkSession
    pages.writeStream
      .option("checkpointLocation", s"$workDir/checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, batch, workDir, cfg, batchId); ()
      }
      .start()
  }

  /** Fold all committed batch indexes into one serving index (zero-decode
    * concat; disjoint intervals are validated driver-side by the merge).
    * With a single batch the index is already in final form — it copies
    * through the same merge path via a synthetic split only when needed,
    * so callers always get a complete index at `outDir`. */
  def compact(spark: SparkSession, workDir: String, outDir: String): IndexBuild.Meta = {
    val dirs = committedBatchIds(spark, workDir).map(batchDir(workDir, _))
    require(dirs.nonEmpty, "no committed batches to compact")
    if (dirs.size == 1) {
      // single segment: the "merge" is a filesystem copy of the one
      // index. The destination must NOT pre-exist: Hadoop's FileUtil.copy
      // nests the source UNDER an existing directory instead of copying
      // onto it.
      val f = fs(spark)
      val dst = new org.apache.hadoop.fs.Path(outDir)
      f.delete(dst, true)
      org.apache.hadoop.fs.FileUtil.copy(f, new org.apache.hadoop.fs.Path(dirs.head),
        f, dst, false, true, spark.sparkContext.hadoopConfiguration)
      IndexBuild.readMeta(spark, outDir)
    } else Merge.concatMergeIndexes(spark, dirs, outDir)
  }
}

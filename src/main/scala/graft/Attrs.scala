package graft

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Attribute filters as VIRTUAL POSTING LISTS — the engine's analog of a
  * keyword/filter field: a predicate `attr = value` compiles to the
  * posting list of the docs having that value, bucketed by the SAME docId
  * ranges as the serving index, so it rides the existing shuffle, cache
  * and codec with zero new machinery (Lucene evaluates FILTER clauses the
  * same way: a filter IS a doc-id posting iterator intersected with the
  * scored clauses).
  *
  * Capability graft: the reference restricts a query to a candidate
  * subset by loading only the probed clusters' id lists
  * (`src/index_ivfpq.cpp:122-159` LoadFromBook + the per-cluster
  * `posting_lists_` membership, `include/index_ivf.hpp:83-84`); here the
  * subset is value-driven instead of geometry-driven, stored per
  * (attr=value, bucket).
  *
  * Scale shape (10^12 docs): the sidecar holds one row per
  * (attr-value, bucket) whose doc list is ≤ bucketWidth entries — build
  * is one linear groupBy with bounded groups (no skew: buckets are
  * uniform-width ranges); a filtered query ships only the REQUESTED
  * values' lists (parquet row-group pruning on the sorted filter-term
  * column) through the same bucket co-shuffle the batch already pays.
  * The match set is never collected or broadcast — a `lang='en'` filter
  * over 10^12 docs stays distributed end to end.
  */
object Attrs {

  /** Filter terms live under U+0000 — a control char the tokenizer can
    * never emit (non-letter/digit ⇒ split boundary), so virtual lists
    * can share the posting stream with real terms without collision. */
  val FilterMarker = '\u0000'

  /** The marker doubles as the attr/value separator: neither side can
    * contain U+0000 (values come from string columns of real data; a '='
    * separator would let ("a=b","c") and ("a","b=c") collide). */
  def filterTerm(attr: String, value: String): String =
    s"$FilterMarker$attr$FilterMarker$value"

  def isFilterTerm(term: String): Boolean =
    term.nonEmpty && term.charAt(0) == FilterMarker

  def attrsDir(dir: String) = s"$dir/attrs"

  def hasAttrs(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(attrsDir(dir))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Virtual posting lists for one attribute column: one [[PostingRow]]
    * per (value, bucket) with that bucket's matching docIds (sorted,
    * VByte-coded through the shared [[Codec]]; tf=1, dl=1 — filter rows
    * are never scored, the scorer consumes only their docIds). NULL
    * attribute values match no filter (SQL semantics). */
  def attrPostings(spark: SparkSession, docs: DataFrame, attr: String,
                   bucketWidth: Long, blockSize: Int): Dataset[PostingRow] = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        col(attr).cast("string").as("value"))
      .where(col("value").isNotNull)
      // DIV = exact integer division (doc_id/width in Column land is
      // DOUBLE division — inexact past 2^53)
      .withColumn("bucket", expr(s"CAST(doc_id DIV $bucketWidth AS INT)"))
      .groupBy($"value", $"bucket")
      .agg(sort_array(collect_list($"doc_id")).as("docs"))
      .as[(String, Int, Seq[Long])]
      .map { case (v, b, ds) =>
        val ids = ds.toArray
        val ones = Array.fill(ids.length)(1)
        PostingRow(0, filterTerm(attr, v), b, ids.length.toLong, 0L, ids(0),
          Codec.encodeBlocks(ids, ones, ones, blockSize))
      }
  }

  /** Persist filter lists for `attrCols` next to an index (`dir/attrs`),
    * bucketed with the index's own geometry (read from its meta). Sorted
    * by (term, bucket) within files so a value predicate prunes on
    * parquet row-group min/max stats. Overwrites any previous sidecar. */
  def writeAttrs(spark: SparkSession, docs: DataFrame, dir: String,
                 attrCols: Seq[String]): Unit = {
    require(attrCols.nonEmpty, "writeAttrs needs at least one attribute column")
    val meta = IndexBuild.readMeta(spark, dir)
    val rows = attrCols
      .map(a => attrPostings(spark, docs, a, meta.bucket_width, meta.block_size))
      .reduce(_ union _)
    rows
      .repartition(col("bucket"))
      .sortWithinPartitions(col("term"), col("bucket"))
      .write.mode(SaveMode.Overwrite).parquet(attrsDir(dir))
  }

  private def readRows(spark: SparkSession, dir: String): Dataset[PostingRow] = {
    import spark.implicits._
    require(hasAttrs(spark, dir),
      s"no attribute sidecar at ${attrsDir(dir)} — write one with Attrs.writeAttrs " +
        "before querying with a filter")
    // explicit schema: an attr column that is all-NULL writes a fileless
    // sidecar, and schema inference on it throws (same hazard as
    // [[IndexBuild.segmentSchema]])
    spark.read.schema(IndexBuild.segmentSchema).parquet(attrsDir(dir))
      .select($"part_id".cast("int").as("part_id"), $"term", $"bucket", $"n",
        $"cf", $"min_doc", $"blocks")
      .as[PostingRow]
  }

  /** Every persisted filter list (all attrs, all values) — what
    * [[QueryEngine.openIndex]] folds into the cached serving layout so
    * filtered batches hit the same in-memory cache as unfiltered ones. */
  def allFilterRows(spark: SparkSession, dir: String): Dataset[PostingRow] =
    readRows(spark, dir)

  /** Filter lists for `attr IN values` only (parquet row-group pruning on
    * the sorted term column keeps this read proportional to the MATCHING
    * lists, not the sidecar). */
  def filterRows(spark: SparkSession, dir: String, attr: String,
                 values: Seq[String]): Dataset[PostingRow] = {
    import spark.implicits._
    val terms = values.map(v => filterTerm(attr, v))
    readRows(spark, dir).where($"term".isin(terms: _*))
  }
}

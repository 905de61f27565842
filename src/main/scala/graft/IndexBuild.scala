package graft

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** Inverted-index build — the graft of the reference's `Populate`/
  * `InsertIvf` (`src/index_ivf.cpp:72-156`, SURVEY.md §2.4 A1/A2) as one
  * Catalyst-planned pipeline:
  *
  *   tf rows → (broadcast head-term join) salt → repartition(P, part_id)
  *          → sortWithinPartitions(term, bucket, doc_id)
  *          → mapPartitions: cut+compress posting blocks → segments
  *
  * The reference's per-list mutex dance (`index_ivf.cpp:85-93`) IS the
  * shuffle; Spark plans it. Head-term skew (north rule): terms with
  * df > headDf are salted into docId-range buckets of `bucketWidth` docs,
  * so no single reducer ever owns more than `bucketWidth` postings of a
  * head term — the partition histogram stays flat at any corpus size.
  * Rare terms keep bucket 0 ⇒ exact single-partition pruning at query
  * time. part_id = pmod(xxhash64(term, bucket), P).
  *
  * On-disk layout (Iceberg-style: partitioned parquet + manifest tables,
  * SURVEY.md §7.3 — no Iceberg jar in the sandbox):
  *   dir/stats/terms   (term, df, cf)
  *   dir/stats/meta    corpus scalars + frozen build config
  *   dir/segments/part_id=N/   PostingRow parquet (term-sorted in-file)
  *   dir/manifest      (part_id, n_lists, n_postings)  — resume lineage
  *   dir/metrics       build metrics (docs/sec, counts)
  */
object IndexBuild {

  /** @param docPartitioned false → TERM-partitioned layout (north-rule
    *   build/merge/storage layout: part_id = hash(term, bucket) % P, only
    *   head terms bucketed — exact single-partition pruning for rare
    *   terms). true → DOC-partitioned SERVING layout (part_id = bucket %
    *   P, EVERY term bucketed by docId range): each partition holds all
    *   terms of its doc range, so one batched query job evaluates every
    *   query per partition with ZERO posting duplication and merges
    *   per-partition heaps — the treeReduce shape of the north star. The
    *   same duality as the reference's offline per-cluster files vs
    *   LoadFromBook serving selection. */
  final case class Config(
      numPartitions: Int = 32,
      bucketWidth: Long = 128,
      headDf: Long = 300,
      blockSize: Int = Codec.BlockSize,
      docPartitioned: Boolean = false)

  /** Meta row persisted with the index: corpus scalars + the build config
    * (query-time pruning must use the SAME hash geometry). */
  final case class Meta(
      n_docs: Long, n_tokens: Long, max_doc_id: Long,
      num_partitions: Int, bucket_width: Long, head_df: Long, block_size: Int,
      doc_partitioned: Boolean)

  /** Input row for the per-partition block builder. */
  final case class TokenPosting(
      term: String, bucket: Int, doc_id: Long, tf: Long, dl: Long, part_id: Int)

  /** Salted, partitioned tf rows, clustered for the block builder.
    * `tf` = (doc_id, term, tf, dl) rows — from [[Stats.tfRows]] at build
    * time, or from decoded segments at merge time ([[Merge]]). */
  def saltedTf(spark: SparkSession, tf: DataFrame, termStats: DataFrame,
               cfg: Config): Dataset[TokenPosting] = {
    import spark.implicits._
    // Head-term set is tiny under Zipf (O(1/headDf · vocab)); broadcast.
    val bucketed =
      if (cfg.docPartitioned)
        // serving layout: every term bucketed, partitions = doc ranges
        tf.withColumn("bucket", ($"doc_id" / cfg.bucketWidth).cast("int"))
          .withColumn("part_id", pmod($"bucket", lit(cfg.numPartitions)).cast("int"))
      else {
        val heads = termStats.where($"df" > cfg.headDf)
          .select($"term", lit(true).as("is_head"))
        tf.join(broadcast(heads), Seq("term"), "left")
          .withColumn("bucket",
            when($"is_head", ($"doc_id" / cfg.bucketWidth).cast("int")).otherwise(lit(0)))
          .withColumn("part_id",
            pmod(xxhash64($"term", $"bucket"), lit(cfg.numPartitions)).cast("int"))
      }
    bucketed
      .select($"term", $"bucket", $"doc_id", $"tf", $"dl", $"part_id")
      .as[TokenPosting]
  }

  /** Consecutive-key run grouping + block compression (runs inside one
    * task over rows already clustered by (term, bucket, doc_id)). */
  def buildLists(rows: Iterator[TokenPosting], blockSize: Int): Iterator[PostingRow] =
    new Iterator[PostingRow] {
      private val it = rows.buffered
      def hasNext: Boolean = it.hasNext
      def next(): PostingRow = {
        val head = it.head
        val docIds = new ArrayBuffer[Long]
        val tfs = new ArrayBuffer[Int]
        val dls = new ArrayBuffer[Int]
        while (it.hasNext && it.head.term == head.term && it.head.bucket == head.bucket) {
          val r = it.next()
          docIds += r.doc_id; tfs += r.tf.toInt; dls += r.dl.toInt
        }
        val blocks = Codec.encodeBlocks(docIds.toArray, tfs.toArray, dls.toArray, blockSize)
        PostingRow(head.part_id, head.term, head.bucket, docIds.length.toLong,
          docIds.head, blocks)
      }
    }

  /** In-memory build: postings Dataset + stats (no disk IO) — used by the
    * Verify contract and algorithm tests; the disk path below adds only
    * IO + manifest around this same plan. */
  def buildPostings(spark: SparkSession, docs: DataFrame, cfg: Config = Config())
      : (Dataset[PostingRow], DataFrame, CorpusStats) = {
    import spark.implicits._
    val cs = Stats.corpus(docs)
    val tf = Stats.tfRows(docs)
    val ts = Stats.termStats(tf)
    val postings = saltedTf(spark, tf, ts, cfg)
      .repartition(cfg.numPartitions, $"part_id")
      .sortWithinPartitions($"term", $"bucket", $"doc_id")
      .mapPartitions(it => buildLists(it, cfg.blockSize))
    (postings, ts, cs)
  }

  // ---- Disk layout ----------------------------------------------------
  def segmentsDir(dir: String) = s"$dir/segments"
  def manifestDir(dir: String) = s"$dir/manifest"
  def metricsDir(dir: String)  = s"$dir/metrics"

  /** Full build to disk. With resume=true, partitions already present in
    * the manifest are skipped and only the gap is rebuilt (reference
    * analog: LoadFromBook's idempotent selective load,
    * `src/index_ivfpq.cpp:122-159`); dynamic partition overwrite cleans
    * any partial files a killed run left in unfinished partitions. */
  def writeIndex(spark: SparkSession, docs: DataFrame, dir: String,
                 cfg: Config = Config(), resume: Boolean = false): Meta = {
    import spark.implicits._
    val t0 = System.nanoTime()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def phase[T](name: String)(body: => T): T = {
      val t = System.nanoTime()
      val r = body
      if (sys.env.contains("SPARK_GRAFT_LOG"))
        System.err.println(f"[build-phase] $name ${(System.nanoTime() - t) / 1e9}%.2fs")
      r
    }
    // ONE tokenize+tf pass, materialized: corpus scalars, term stats, the
    // head-term set and the posting shuffle all read the cache instead of
    // re-tokenizing the corpus (4 scans → 1 scan + 1 cached shuffle).
    val tf = Stats.tfRows(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ts = Stats.termStats(tf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // n_docs / max_doc_id need no tokenization; n_tokens = Σ cf over the
    // (tiny) term-stats table — no extra pass over token data.
    val docRow = phase("docs-scan")(docs.agg(count(lit(1)), max($"doc_id")).head())
    val nTokens = phase("tf+stats")(ts.agg(sum($"cf")).head().getLong(0))
    val cs = CorpusStats(docRow.getLong(0), nTokens, docRow.getLong(1))
    val meta = Meta(cs.n_docs, cs.n_tokens, cs.max_doc_id,
      cfg.numPartitions, cfg.bucketWidth, cfg.headDf, cfg.blockSize,
      cfg.docPartitioned)

    val done: Set[Int] =
      if (resume && exists(spark, manifestDir(dir)))
        spark.read.parquet(manifestDir(dir)).select($"part_id").as[Int].collect().toSet
      else Set.empty
    if (done.isEmpty) phase("stats-write") {
      ts.write.mode(SaveMode.Overwrite).parquet(s"$dir/stats/terms")
      Seq(meta).toDS().write.mode(SaveMode.Overwrite).parquet(s"$dir/stats/meta")
    }

    val salted0 = saltedTf(spark, tf, ts, cfg)
    val salted = if (done.isEmpty) salted0 else salted0.where(!$"part_id".isin(done.toSeq: _*))
    val postings = salted
      .repartition(cfg.numPartitions, $"part_id")
      .sortWithinPartitions($"term", $"bucket", $"doc_id")
      .mapPartitions(it => buildLists(it, cfg.blockSize))
      .persist()
    try {
      phase("segments-write") {
        postings.write
          .mode(SaveMode.Overwrite) // dynamic mode: only touched part_ids replaced
          .partitionBy("part_id")
          .parquet(segmentsDir(dir))
      }
      // Manifest rows appended LAST (atomic per-partition commit point).
      phase("manifest") {
        val manifest = postings.groupBy($"part_id")
          .agg(count(lit(1)).as("n_lists"), sum($"n").as("n_postings"))
        manifest.write.mode(SaveMode.Append).parquet(manifestDir(dir))
      }
      val wallSec = (System.nanoTime() - t0) / 1e9
      Seq((cs.n_docs, cs.n_tokens, wallSec, cs.n_docs / wallSec))
        .toDF("n_docs", "n_postings_tokens", "wall_sec", "docs_per_sec")
        .write.mode(SaveMode.Append).parquet(metricsDir(dir))
    } finally {
      postings.unpersist()
      ts.unpersist()
      tf.unpersist()
    }
    meta
  }

  def readMeta(spark: SparkSession, dir: String): Meta = {
    import spark.implicits._
    spark.read.parquet(s"$dir/stats/meta").as[Meta].head()
  }

  def readSegments(spark: SparkSession, dir: String): Dataset[PostingRow] = {
    import spark.implicits._
    spark.read.parquet(segmentsDir(dir))
      .select($"part_id".cast("int").as("part_id"), $"term", $"bucket", $"n",
        $"min_doc", $"blocks")
      .as[PostingRow]
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}

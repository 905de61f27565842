package graft.extra

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index over an embedding table — the graft of the
  * reference's core index lifecycle train → WriteIndex → LoadIndex →
  * selective-cell query (`src/index_ivfpq.cpp:326-348` write/load,
  * `:122-159` selective cell load): the codebook is fit ONCE at build
  * time and persisted; query time trains NOTHING and reads ONLY the
  * probed cells (parquet partition pruning on the cell directory key).
  *
  * On-disk layout (mirrors the fulltext index's manifest-last commit):
  *   dir/cells/cell=N/  (vec_id, embedding) — one directory per coarse cell
  *   dir/centroids      (cell, centroid: array<double>) — the codebook
  *   dir/meta           (n_vecs, dim, kc, iters) — written LAST (commit point)
  */
object AnnIndex {

  final case class Meta(n_vecs: Long, dim: Int, kc: Int, iters: Int)

  /** Deterministic training sample: every `inv`-th vector by id — the
    * reference clamps training to nsamples rows (`src/index_ivf.cpp:43-45`,
    * seeded shuffle `:50-62`); at 10^12 vectors a full-table Lloyd fit
    * would spend `2·iters` corpus scans on a LAYOUT-ONLY model. Layout-
    * only means results are unaffected: full probe scores every cell
    * regardless of where the centroids landed, and pruned-probe recall is
    * a quality (spec-tested) property, not a correctness one. */
  def trainSample(emb: DataFrame, inv: Int): DataFrame =
    if (inv <= 1) emb else emb.where(pmod(col("vec_id"), lit(inv)) === 0)

  def manifestDir(dir: String): String = s"$dir/manifest"

  private[extra] def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** A parquet artifact counts as COMMITTED only once the committer's
    * _SUCCESS marker exists — a kill mid-write leaves the directory
    * present but fileless (only _temporary), and a resume that trusted
    * bare existence would crash on schema inference at every retry
    * instead of redoing the step. */
  private[extra] def committed(spark: SparkSession, path: String): Boolean =
    exists(spark, s"$path/_SUCCESS")

  private[extra] def deletePaths(spark: SparkSession, paths: Seq[String]): Unit =
    paths.foreach { s =>
      val p = new org.apache.hadoop.fs.Path(s)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true); ()
    }

  /** Build: one k-means fit over a deterministic sample (the only
    * training, ever) + one assignment pass writing cell-partitioned
    * parquet. Scale shape: the fit scans `1/trainSampleInv` of the table
    * per Lloyd iteration; the assignment pass is linear, embarrassingly
    * parallel, and the write shuffles nothing (each task appends to its
    * cells' directories).
    *
    * Commit protocol mirrors the fulltext build (meta LAST; per-cell
    * manifest; reference analog: LoadFromBook idempotent selective load,
    * `src/index_ivfpq.cpp:122-159`). With resume=true a killed build
    * restarts from its last commit point: a complete index no-ops, a
    * committed codebook skips retraining, and cells already in the
    * manifest are dropped BEFORE the encode shuffle-free write (dynamic
    * partition overwrite scrubs partial files in gap cells). With
    * resume=false any previous index at `dir` is deleted first — dynamic
    * overwrite alone would leave stale cells a smaller rebuild never
    * touches. */
  def write(spark: SparkSession, emb: DataFrame, dir: String,
            kc: Int = Ann.KmKc, iters: Int = 8, trainSampleInv: Int = 4,
            resume: Boolean = false): Meta = {
    import spark.implicits._
    if (!resume)
      deletePaths(spark, Seq(s"$dir/meta", s"$dir/cells", s"$dir/centroids",
        manifestDir(dir)))
    else if (committed(spark, s"$dir/meta"))
      return readMeta(spark, dir) // meta is the commit point: already complete
    val centroids =
      if (resume && committed(spark, s"$dir/centroids"))
        loadCentroids(spark, dir)
      else {
        val c = Ann.kmeansFit(trainSample(emb, trainSampleInv), kc, iters)
        c.zipWithIndex
          .map { case (ct, i) => (i, ct.toSeq) }.toSeq
          .toDF("cell", "centroid")
          .coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
        c
      }
    val done: Set[Int] =
      if (resume && committed(spark, manifestDir(dir)))
        spark.read.parquet(manifestDir(dir)).select($"cell").as[Int].collect().toSet
      else Set.empty
    val assignUdf = udf((v: Seq[Float]) => Ann.argminL2(v, centroids))
    val assigned0 = emb.select($"vec_id", $"embedding", assignUdf($"embedding").as("cell"))
    val assigned = if (done.isEmpty) assigned0
                   else assigned0.where(!$"cell".isin(done.toSeq: _*))
    assigned.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell")
      .parquet(s"$dir/cells")
    // manifest rows for the cells THIS run wrote (append = the per-cell
    // commit; counted from the written partitions — partition pruning
    // makes this a gap-only read, no second encode pass)
    val gapManifest = spark.read.parquet(s"$dir/cells")
      .select(col("cell").cast("int").as("cell"))
      .where(if (done.isEmpty) lit(true) else !col("cell").isin(done.toSeq: _*))
      .groupBy($"cell").agg(count(lit(1)).as("n_vecs"))
    gapManifest.coalesce(1).write.mode(SaveMode.Append).parquet(manifestDir(dir))
    val row = emb.agg(count(lit(1)), max(size($"embedding"))).head()
    val meta = Meta(row.getLong(0), row.getInt(1), kc, iters)
    Seq(meta).toDS().write.mode(SaveMode.Overwrite).parquet(s"$dir/meta")
    meta
  }

  def readMeta(spark: SparkSession, dir: String): Meta = {
    import spark.implicits._
    spark.read.parquet(s"$dir/meta").as[Meta].head()
  }

  /** The persisted codebook, cell-ordered (tiny: kc × dim doubles). */
  def loadCentroids(spark: SparkSession, dir: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/centroids")
      .orderBy($"cell")
      .select($"centroid").as[Seq[Double]].collect()
      .map(_.toArray)
  }

  /** Query a loaded index: NO training, NO full scan. Phase 1 routes each
    * query to its nprobe nearest persisted centroids (driver-side, like
    * the fulltext candidatePartIds); the union of probed cells becomes a
    * partition filter on the cells directory, so unprobed cells are never
    * read (reference: LoadFromBook's selective cell load). Phase 2 scores
    * exact cosine inside probed cells and heap-merges per-query top-k. */
  def topk(spark: SparkSession, dir: String, queries: DataFrame,
           nprobe: Int, k: Int = Ann.K): DataFrame = {
    import spark.implicits._
    val centroids = loadCentroids(spark, dir)
    val probeUdf = udf((v: Seq[Float]) => Ann.probeCellsKmeans(v, centroids, nprobe))
    val routed = queries
      .select($"vec_id".as("query_vec_id"), $"embedding".as("qe"))
      .withColumn("probes", probeUdf($"qe"))
    val allProbes = routed.select(explode($"probes").as("c"))
      .distinct().as[Int].collect().toSeq.sorted
    val cells = readCells(spark, dir).where($"cell".isin(allProbes: _*))
    val pairs = broadcast(routed).join(cells,
        array_contains($"probes", $"cell") && $"vec_id" =!= $"query_vec_id")
      .select($"query_vec_id", $"vec_id", Ann.cosCol($"qe", $"embedding").as("cos"))
    Ann.topkFromPairs(pairs, k)
  }

  def readCells(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/cells")
      .select(col("vec_id"), col("embedding"), col("cell").cast("int").as("cell"))
}

package graft.extra

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.TopK

/** Product quantization + asymmetric-distance (ADC) scoring — the graft
  * of the reference's flagship compressed-vector structure (PQ encode
  * `src/quantizer.cpp:133-188` db_codes_; per-query DTable + ADist
  * accumulation `src/index_ivfpq.cpp:554-568`):
  *
  *  - train: per-subspace k-means codebooks (M=8 subspaces × SubDim=8 of
  *    the 64-dim embeddings), reusing [[Ann.kmeansFit]] on sliced
  *    subvector columns;
  *  - encode: each vector → M codeword ids (one byte each at ks ≤ 256 —
  *    32× smaller than the raw floats);
  *  - query: per-query DTable (M × ks partial L2²) computed ONCE and
  *    broadcast; per-vector approximate distance = M table lookups; the
  *    bounded heap keeps top-k per query; selected candidates re-rank on
  *    exact L2 (the classic ADC + refine shape).
  *
  * Verification config (the DuckDB-checked contract, q_ann_pq): ks =
  * n_vecs with 0 Lloyd iterations makes every subvector its own codeword
  * — encoding is LOSSLESS, so ADC == exact L2 and the full train → encode
  * → DTable → ADC → rerank pipeline must reproduce the exact-L2 top-k
  * (the same "full probe == brute" invariant the IVF paths use). The
  * lossy production config (ks=16) is recall-tested in the spec, like
  * the reference's Recall@k harness. */
object Pq {
  val M = 8       // subspaces
  val SubDim = 8  // dims per subspace (M * SubDim = 64)
  val Ks = 16     // production codewords per subspace

  /** Subvector m of the embedding column (1-based slice). */
  def subCol(m: Int): Column = slice(col("embedding"), m * SubDim + 1, SubDim)

  /** Per-subspace codebooks: M × ks × SubDim. iters=0 returns the init
    * (the ks lowest vec_ids' subvectors) — with ks = n that is the
    * lossless verification codebook, no training jobs at all.
    *
    * iters=0 fast path: ONE collect of the ks lowest full vectors, sliced
    * per subspace driver-side — bit-identical to M per-subspace init
    * collects (each init is exactly the same rows' subvector slice), at
    * 1/M of the Spark jobs (the lossless contract queries paid M
    * sequential collect jobs for identical data). */
  def trainCodebooks(emb: DataFrame, ks: Int = Ks, iters: Int = 4): Array[Array[Array[Double]]] =
    if (iters == 0) {
      val spark = emb.sparkSession
      import spark.implicits._
      val init: Array[Array[Double]] = emb
        .orderBy($"vec_id").limit(ks)
        .select($"embedding").as[Seq[Float]].collect()
        .map(_.toArray.map(_.toDouble))
      Array.tabulate(M)(m =>
        init.map(v => java.util.Arrays.copyOfRange(v,
          math.min(m * SubDim, v.length),
          math.min((m + 1) * SubDim, v.length)))) // == slice() on short vectors
    } else Array.tabulate(M) { m =>
      Ann.kmeansFit(emb.select(col("vec_id"), subCol(m).as("embedding")), ks, iters)
    }

  /** PQ code of one vector: per subspace, the nearest codeword id. */
  def encodeOne(v: Seq[Float], codebooks: Array[Array[Array[Double]]]): Array[Int] =
    Array.tabulate(M)(m => Ann.argminL2(v.slice(m * SubDim, (m + 1) * SubDim), codebooks(m)))

  /** (vec_id, code) table — the compressed index (db_codes_ analog). */
  def encode(emb: DataFrame, codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cb = spark.sparkContext.broadcast(codebooks)
    emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .map { case (id, v) => (id, encodeOne(v, cb.value).toSeq) }
      .toDF("vec_id", "code")
  }

  /** Per-query distance table: dtable(m)(c) = ||q_m − codeword_{m,c}||². */
  def dtable(q: Seq[Float], codebooks: Array[Array[Array[Double]]]): Array[Array[Double]] =
    Array.tabulate(M) { m =>
      val qm = q.slice(m * SubDim, (m + 1) * SubDim)
      codebooks(m).map { cw =>
        var d = 0.0; var i = 0
        while (i < SubDim) { val x = qm(i) - cw(i); d += x * x; i += 1 }
        d
      }
    }

  /** Canonical exact L2² between two float-array columns — sequential
    * left-to-right fold over all dims, bit-parity with the DuckDB mirror
    * (OracleSqlExtra.l2Expr), used for the rerank scores. */
  def l2Col(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (p, q) => (p.cast("double") - q.cast("double")) * (p.cast("double") - q.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** ADC top-k + exact rerank. Scale shape: queries' DTables broadcast
    * (nq × M × ks doubles); one pass over the code table scores every
    * query per code row (M lookups each) into bounded per-query heaps
    * (map-side partial aggregation — no per-candidate shuffle); only the
    * nq·k winners join back to raw embeddings for the exact rerank.
    * Output (query_vec_id, rank, vec_id, l2_micro) under (L2 ASC, vec_id
    * ASC).
    *
    * This flat variant scans EVERY code row per query — the in-memory
    * oracle shape. The scale path is [[AnnIndexPq]]: the same ADC against
    * cell-partitioned PERSISTED codes where each query touches only its
    * probed cells, which bounds both the scanned rows and the per-row
    * `nq` loop (only queries probing that cell score it). */
  def pqTopk(spark: SparkSession, emb: DataFrame,
             codebooks: Array[Array[Array[Double]]],
             k: Int = Ann.K, nq: Int = Ann.NumQueryVecs,
             rerankFactor: Int = 4): DataFrame = {
    import spark.implicits._
    val queries: Map[Long, Array[Array[Double]]] = emb
      .where($"vec_id" < nq)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> dtable(v, codebooks) }.toMap
    val qBc = spark.sparkContext.broadcast(queries)
    // ADC keeps a pool of k·rerankFactor; the exact rerank distills to k
    // (quantization error shuffles near-ties — a wider pool restores
    // recall at negligible cost since the pool is still O(k))
    val agg = new TopK.Agg[Long](k * rerankFactor).toColumn
    val cands = encode(emb, codebooks)
      .as[(Long, Seq[Int])]
      .flatMap { case (vid, code) =>
        qBc.value.iterator.collect { case (qid, dt) if qid != vid =>
          var d = 0.0; var m = 0
          while (m < M) { d += dt(m)(code(m)); m += 1 }
          // distance ASC rides the max-heap as encoded(-d); vec_id ASC
          // tie-break matches Cand's doc_id ASC
          (qid, TopK.Cand(vid, TopK.sortableBits(-d)))
        }
      }
      .groupByKey(_._1)
      .agg(agg.name("hits"))
      .flatMap { case (qid, hits) => hits.map(c => (qid, c.doc_id)) }
      .toDF("query_vec_id", "vec_id")
    val q = emb.where($"vec_id" < nq)
      .select($"vec_id".as("query_vec_id"), $"embedding".as("qe"))
    rerankExact(cands, emb, q, k)
  }

  /** Exact-L2 rerank of an ADC candidate pool: join the O(nq·k·rf)
    * survivors back to raw vectors, score with the canonical fold
    * ([[l2Col]] — the DuckDB-parity order), keep top-k per query. Both
    * joins BROADCAST the tiny candidate/query side, so the corpus is one
    * column-pruned hash-probe scan — never shuffled — and the window runs
    * over the tiny candidate set, not the corpus. */
  def rerankExact(cands: DataFrame, emb: DataFrame, q: DataFrame,
                  k: Int): DataFrame = {
    import cands.sparkSession.implicits._
    val rer = emb.select($"vec_id", $"embedding")
      .join(broadcast(cands.join(broadcast(q), Seq("query_vec_id"))), Seq("vec_id"))
      .select($"query_vec_id", $"vec_id", l2Col($"qe", $"embedding").as("l2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_vec_id").orderBy($"l2".asc, $"vec_id".asc)
    rer.withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .select($"query_vec_id", $"rank".cast("int").as("rank"), $"vec_id",
        floor($"l2" * 1e6 + 0.5).cast("long").as("l2_micro"))
      .orderBy($"query_vec_id", $"rank")
  }

  /** The lossless verification pipeline (ks = n, zero Lloyd iterations):
    * codewords ARE the subvectors, so ADC lookups sum the same per-
    * subspace L2² partials the exact distance would.
    *
    * What carries the == exact-L2 guarantee (ADVICE round 2): NOT bitwise
    * ADC == l2Col equality — ADC sums M per-subspace partials while
    * [[l2Col]] folds all 64 dims sequentially, a different FP association
    * that can differ by ulps. The guarantee is (a) the k·rerankFactor
    * pool absorbs any ulp-order boundary ties before (b) the exact rerank
    * rescores with the canonical fold. Hence rerankFactor ≥ 2 is REQUIRED
    * here: with a bare k-pool a near-tie on the pool boundary could drop
    * a true top-k member before the rerank can restore order. */
  def pqTopkLossless(spark: SparkSession, emb: DataFrame,
                     k: Int = Ann.K, nq: Int = Ann.NumQueryVecs,
                     rerankFactor: Int = 4): DataFrame = {
    require(rerankFactor >= 2,
      "lossless contract needs pool slack: ulp-order ADC ties on the pool " +
        "boundary are absorbed by k*rerankFactor and fixed by the exact rerank")
    val n = emb.count().toInt
    pqTopk(spark, emb, trainCodebooks(emb, ks = n, iters = 0), k, nq, rerankFactor)
  }
}

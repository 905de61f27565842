package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** End-to-end rank-identity over the driver corpus (reference test
  * pattern: index result vs exact ground truth, SURVEY.md §5): the
  * indexed WAND path, the window-oracle and the heap-oracle must agree
  * row-for-row on the frozen query batch. */
class EngineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(df: DataFrame): Seq[(Int, Int, Long, Long)] = {
    import spark.implicits._
    df.select($"query_id", $"rank", $"doc_id", $"score_micro")
      .as[(Int, Int, Long, Long)].collect().toSeq
  }

  private def checkSf(sfDir: String): Unit = {
    val docs = Stats.readDocuments(spark, sfDir)
    val oracle = rows(Oracle.topk(spark, docs))
    assert(oracle.nonEmpty)
    // every query with ≥1 known term has results; ranks are 1..≤k dense
    val byQ = oracle.groupBy(_._1)
    byQ.foreach { case (q, hs) =>
      assert(hs.map(_._2).sorted == (1 to hs.length), s"ranks not dense for q$q")
      // frozen total order within each query
      val sorted = hs.sortBy(h => (-h._4, h._3))
      assert(hs.sortBy(_._2).map(h => (h._3, h._4)) == sorted.map(h => (h._3, h._4)))
    }
    val heap = rows(Oracle.topkViaHeap(spark, docs))
    assert(heap == oracle, "heap-aggregator path != window oracle")

    val indexed = rows(SparkEntry.queries("q_topk_indexed")(spark, sfDir))
    assert(indexed == oracle, "indexed WAND path != exact oracle")
  }

  test("sf0.001: indexed == heap == oracle (rank-identical)") {
    checkSf("/root/testdata/sf0.001")
  }

  test("sf0.01: indexed == heap == oracle (rank-identical)") {
    checkSf("/root/testdata/sf0.01")
  }

  test("zero-result and unknown-term queries behave") {
    val docs = Stats.readDocuments(spark, "/root/testdata/sf0.001")
    val oracle = rows(Oracle.topk(spark, docs))
    // q17 = 'zzznotfound' must yield no rows
    assert(!oracle.exists(_._1 == 17))
    // q6 = 'spark query plan' must still rank on the two known terms
    assert(oracle.exists(_._1 == 6))
  }

  test("decoded index postings == tf rows (index stores the corpus exactly)") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val decoded = SparkEntry.queries("q_postings_decode")(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSeq
    val docs = Stats.readDocuments(spark, sfDir)
    val expected = Stats.tfRows(docs)
      .select($"term", $"doc_id", $"tf", $"dl")
      .orderBy($"term", $"doc_id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(decoded == expected)
  }

  test("partIdOf (Scala) == Catalyst pmod(xxhash64(term,bucket),P) bit-exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pairs = (for (t <- Seq("the", "dup", "zzz", "Ünïcode-词"); b <- 0 to 5)
      yield (t, b))
    val catalyst = pairs.toDF("term", "bucket")
      .select($"term", $"bucket",
        pmod(xxhash64($"term", $"bucket"), lit(32)).cast("int").as("part_id"))
      .as[(String, Int, Int)].collect()
    catalyst.foreach { case (t, b, pid) =>
      assert(IndexBuild.partIdOf(t, b, 32) == pid, s"($t,$b)")
    }
  }

  test("salting: head terms split into doc-range buckets, rare terms do not") {
    import spark.implicits._
    val docs = Stats.readDocuments(spark, "/root/testdata/sf0.01")
    val (postings, ts, _) = IndexBuild.buildPostings(spark, docs, SparkEntry.testConfig)
    val rowsByTerm = postings.collect().groupBy(_.term)
    val dfMap = ts.select($"term", $"df").as[(String, Long)].collect().toMap
    val cfg = SparkEntry.testConfig
    rowsByTerm.foreach { case (t, rs) =>
      if (dfMap(t) > cfg.headDf) {
        assert(rs.length > 1, s"head term $t not salted")
        // buckets hold disjoint docId ranges
        rs.foreach { r =>
          val ds = Codec.decodeAll(r).map(_.doc_id)
          assert(ds.forall(d => d / cfg.bucketWidth == r.bucket))
        }
      } else {
        assert(rs.length == 1 && rs.head.bucket == 0, s"rare term $t salted")
      }
      // postings within a row strictly increasing
      rs.foreach { r =>
        val ds = Codec.decodeAll(r).map(_.doc_id)
        assert(ds == ds.sorted && ds.distinct == ds)
      }
    }
  }

  test("Scala tokenizer == Catalyst tokenizer on every driver document") {
    import spark.implicits._
    val docs = Stats.readDocuments(spark, "/root/testdata/sf0.01")
    val viaCatalyst = docs
      .select($"doc_id", Tokenize.tokensCol($"text").as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val viaScala = docs.select($"doc_id", $"text").as[(Long, String)]
      .collect().map { case (d, t) => d -> Tokenize.tokenizeArray(t).toSeq }.toMap
    assert(viaScala == viaCatalyst)
    // plus adversarial edge cases (punctuation runs, leading/trailing
    // separators, unicode letters, digits, empty)
    val edge = Seq("", "  ", "a", ".a.", "Héllo, Wörld!", "x1 2y --", "ΣΙΓΜΑΣ",
      "tab\tsep", "newline\nsep", "ÆØÅ æøå", "naïve café")
    val viaCol = edge.toDF("text")
      .select(Tokenize.tokensCol($"text")).as[Seq[String]].collect().toSeq
    assert(edge.map(t => Tokenize.tokenizeArray(t).toSeq) == viaCol)
  }

  test("whereTerms: broadcast semi-join path (>128 terms) == isin path") {
    import spark.implicits._
    val docs = Stats.readDocuments(spark, "/root/testdata/sf0.01")
    val (postings, ts, _) = IndexBuild.buildPostings(spark, docs, SparkEntry.testConfig)
    val p = postings.persist()
    try {
      // corpus vocab is small; pad with absent terms to cross the 128
      // threshold (absent terms must match nothing on either path)
      val vocab = ts.select($"term").as[String].collect().toSeq.sorted ++
        (0 until 150).map(i => f"zz_absent_$i%03d")
      assert(vocab.size > 128)
      val viaJoin = QueryEngine.whereTerms(p, vocab).collect()
        .map(r => (r.term, r.bucket)).toSet
      val viaIsin = p.where($"term".isin(vocab: _*)).collect()
        .map(r => (r.term, r.bucket)).toSet
      assert(viaJoin == viaIsin)
      // and a sub-128 subset still routes through isin with equal results
      val few = vocab.take(20)
      assert(QueryEngine.whereTerms(p, few).collect().map(_.term).toSet ==
        p.where($"term".isin(few: _*)).collect().map(_.term).toSet)
    } finally { p.unpersist(); () }
  }

  test("in-memory run: head-heavy batch re-routes to bounded TAAT, rank-identical") {
    import spark.implicits._
    // every doc contains the head term — the per-query grouping would pull
    // its FULL posting set (all salted buckets) into one task's memory
    val docs = (0L until 512L).map { d =>
      val extra = if (d % 97 == 3) " rare" else ""
      (d, s"the w$d$extra")
    }.toDF("doc_id", "text")
    val cfg = IndexBuild.Config(numPartitions = 4, bucketWidth = 32, headDf = 50)
    val (postings, ts, cs) = IndexBuild.buildPostings(spark, docs, cfg)
    val p = postings.persist()
    try {
      val queries = Seq((1, Seq("the")), (2, Seq("the", "rare")), (3, Seq("rare")))
      val termDf = ts.select($"term", $"df").as[(String, Long)].collect().toMap
      val plan = QueryEngine.plan(cs, termDf, queries)
      val oracle = rows(Oracle.topk(spark, docs, queries = queries))
      // guard OFF (cap above the corpus): the per-query WAND grouping
      val grouped = rows(QueryEngine.run(spark, p, plan, maxGroupPostings = 1L << 20))
      // guard ON (cap of 1 posting): every query re-routes through the
      // re-bucketed TAAT path — per-task rows bounded by the range width
      val rerouted = rows(QueryEngine.run(spark, p, plan, maxGroupPostings = 1L))
      assert(grouped == oracle)
      assert(rerouted == oracle, "re-routed head-heavy path != oracle")
      // the default cap really would fire for this shape at scale: the
      // head term's candidate mass is its full df
      val headMass = termDf("the")
      assert(headMass == 512L)
    } finally { p.unpersist(); () }
  }

  test("fused doc→postings pass == tf-row pass; sampled heads (inv=1) == exact heads") {
    import spark.implicits._
    val docs = Stats.readDocuments(spark, "/root/testdata/sf0.01")
    val cfg = SparkEntry.testConfig
    val ts = Stats.termStats(Stats.tfRows(docs))
    val exactHeads = IndexBuild.headTerms(spark, ts, cfg)
    assert(IndexBuild.sampledHeadTerms(spark, docs, cfg) == exactHeads)

    // the fused pre-pass's corpus scalars == the Catalyst agg they replaced
    val scan = IndexBuild.corpusScanWithHeads(spark, docs, cfg)
    val row = docs.agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.max($"doc_id"),
      org.apache.spark.sql.functions.min($"doc_id")).head()
    assert((scan.n_docs, scan.max_doc_id, scan.min_doc_id) ==
      (row.getLong(0), row.getLong(1), row.getLong(2)))
    assert(scan.heads == exactHeads)

    def norm(rows: Seq[PostingRow]) =
      rows.sortBy(r => (r.term, r.bucket))
        .map(r => (r.part_id, r.term, r.bucket, r.n, r.cf, r.min_doc,
          r.blocks.map(b => (b.max_doc, b.n, b.max_tf, b.min_dl, b.bytes.toSeq))))
    val viaTf = IndexBuild.postingsPipeline(spark, Stats.tfRows(docs), exactHeads, cfg)
    val viaDocs = IndexBuild.shuffleMerge(
      IndexBuild.partialPostingsFromDocs(spark, docs, exactHeads, cfg), cfg)
    assert(norm(viaDocs.collect().toSeq) == norm(viaTf.collect().toSeq))

    // stats derived from segments == tokenize-and-count stats
    val derived = viaDocs.groupBy($"term")
      .agg(org.apache.spark.sql.functions.sum($"n").as("df"),
        org.apache.spark.sql.functions.sum($"cf").as("cf"))
      .as[(String, Long, Long)].collect().toSeq.sorted
    val direct = ts.select($"term", $"df", $"cf")
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(derived == direct)
  }

  test("sampled heads (inv>1, mixed ASCII/non-ASCII) == Catalyst sample mirror") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // repeated terms per doc (doc-distinct df must not double-count),
    // non-ASCII docs (String-fallback path), null text, and an inv that
    // actually drops docs
    val docs = (0L until 120L).map { d =>
      val text =
        if (d % 7 == 3) null
        else if (d % 5 == 0) s"héad héad wörd$d straße" // non-ASCII fallback
        else s"head head w$d common common tail"
      (d, text)
    }.toDF("doc_id", "text")
    val cfg = IndexBuild.Config(headDf = 10, headSampleInv = 3)
    val inv = cfg.headSampleInv
    val mirror = docs.where(pmod($"doc_id", lit(inv)) === 0)
      .select(explode(array_distinct(Tokenize.tokensCol($"text"))).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("df"))
      .where($"df" * inv > cfg.headDf)
      .select($"term").as[String].collect().toSet
    val scan = IndexBuild.corpusScanWithHeads(spark, docs, cfg)
    assert(scan.heads == mirror)
    assert((scan.n_docs, scan.max_doc_id, scan.min_doc_id) == (120L, 119L, 0L))
    // the filtered heads-only scan (what writeIndex actually runs) agrees
    // with both the fused scan and the Catalyst mirror
    assert(IndexBuild.headsSampled(spark, docs, cfg) == mirror)
  }
}

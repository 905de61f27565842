package graft

/** The fixed reference query set (analog of the reference's `query.fvecs`
  * batch, nq=1000 at `tests/test_ivfpq_sift1m_baseline.cpp:14-15`; ours is
  * nq=20 literal queries over the driver corpus vocabulary, FIXTURES.md §3).
  *
  * Frozen literals so the Spark side and the DuckDB oracle (VALUES list in
  * [[OracleSql.queriesCte]]) are provably the same batch. Mix per the
  * fixture spec: head terms (df≈0.8N), the rare term `dup` (df≈0.05N),
  * single-term, repeated-term, and unknown-term queries.
  */
object QuerySet {
  val K = 10 // top-k, reference k=10 (`tests/test_ivfpq_sift1m_baseline.cpp:60`)

  val queries: Seq[Query] = Seq(
    Query(1,  "fast sort merge"),
    Query(2,  "hash join"),
    Query(3,  "dup"),
    Query(4,  "dup window stream"),
    Query(5,  "the a"),
    Query(6,  "spark query plan"),          // 'plan' absent from corpus
    Query(7,  "customer order"),
    Query(8,  "big data table scan"),
    Query(9,  "vector column batch"),
    Query(10, "slow query"),
    Query(11, "group agg key value"),
    Query(12, "window"),
    Query(13, "stream batch window merge sort"),
    Query(14, "dup customer"),
    Query(15, "line part small"),
    Query(16, "filter scan row"),
    Query(17, "zzznotfound"),               // zero-result query
    Query(18, "the"),
    Query(19, "dup dup fast"),              // repeated term → distinct
    Query(20, "key value store")            // 'store' absent
  )

  /** query_id -> distinct query terms (tokenizer applied, dedup'd). */
  def queryTerms: Seq[(Int, Seq[String])] =
    queries.map(q => q.query_id -> Tokenize.tokenize(q.qtext).distinct)
}

package graft

/** DuckDB SQL mirrors of every SQL-expressible operator, for the driver's
  * `Verify`/`oracleSql` correctness gate (the cross-engine analog of the
  * reference's golden `gt.ivecs` fixtures, SURVEY.md §5).
  *
  * PARITY RULES (must hold vs the Spark side):
  *  - tokenizer: `regexp_split_to_array(lower(text), '[^\pL\pN]+')` (RE2)
  *    ≡ Spark `split(lower(text), "[^\p{L}\p{N}]+")`, empties dropped.
  *  - all floats quantized with `CAST(floor(x*1e6 + 0.5) AS BIGINT)`
  *    ≡ Scala `math.floor(x*1e6 + 0.5).toLong` (identical on negatives,
  *    unlike round()'s half-away-from-zero).
  *  - BM25 contribution expression mirrors [[Bm25.contribMicroCol]]
  *    token-for-token (same association order ⇒ same double bits).
  *  - every aggregate/computed column aliased identically on both sides.
  */
object OracleSql {

  /** Shared CTE prefix: tokens, per-doc lengths, tf, df, corpus scalars. */
  val corpusCtes: String =
    """toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^\pL\pN]+')) AS term
      |  FROM documents
      |), tok AS (
      |  SELECT doc_id, term FROM toks WHERE term <> ''
      |), dl AS (
      |  SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
      |), tf AS (
      |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
      |), dfs AS (
      |  SELECT term, count(*) AS df, sum(tf) AS cf FROM tf GROUP BY term
      |), meta AS (
      |  SELECT (SELECT count(*) FROM documents) AS n_docs,
      |         (SELECT coalesce(sum(dl), 0) FROM dl) AS n_tokens,
      |         CAST((SELECT coalesce(sum(dl), 0) FROM dl) AS DOUBLE)
      |           / (SELECT count(*) FROM documents) AS avgdl
      |)""".stripMargin

  /** VALUES CTE of the frozen query batch (mirrors [[QuerySet.queries]]). */
  def queriesCte: String = {
    val rows = QuerySet.queries
      .map(q => s"(${q.query_id}, '${q.qtext}')")
      .mkString(", ")
    s"""queries(query_id, qtext) AS (VALUES $rows),
       |qtok AS (
       |  SELECT query_id, unnest(regexp_split_to_array(lower(qtext), '[^\\pL\\pN]+')) AS term
       |  FROM queries
       |), qterms AS (
       |  SELECT DISTINCT query_id, term FROM qtok WHERE term <> ''
       |)""".stripMargin
  }

  /** The BM25 micro-contribution expression (mirror of Bm25.contribMicroCol)
    * over caller-chosen df/tf/dl column references. */
  def contribExprFor(df: String, tf: String, dl: String): String =
    s"""CAST(floor(1e6 * (ln(1 + ((SELECT n_docs FROM meta) - $df + 0.5) / ($df + 0.5))
       | * $tf * 2.2
       | / ($tf + 1.2 * (0.25 + 0.75 * $dl / (SELECT avgdl FROM meta)))) + 0.5) AS BIGINT)""".stripMargin

  /** The per-term instance used by the top-k mirrors. */
  val contribExpr: String = contribExprFor("dfs.df", "tf.tf", "dl.dl")

  /** Exact full-scan BM25 top-k (oracle for ALL top-k query paths). */
  def topkSql(k: Int = QuerySet.K): String =
    s"""WITH $corpusCtes, $queriesCte,
       |contrib AS (
       |  SELECT q.query_id, tf.doc_id, $contribExpr AS c
       |  FROM qterms q
       |  JOIN tf ON q.term = tf.term
       |  JOIN dfs ON q.term = dfs.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |), scores AS (
       |  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro
       |  FROM contrib GROUP BY query_id, doc_id
       |), ranked AS (
       |  SELECT query_id,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank,
       |         doc_id, score_micro
       |  FROM scores
       |)
       |SELECT query_id, rank, doc_id, score_micro FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Attribute-filtered BM25 top-k mirror: candidates restricted to docs
    * whose `attr` is IN `values`; df/avgdl stay CORPUS-global (a filter
    * changes candidacy, not scoring — the engine side scores with the
    * same global stats and masks candidates per bucket, [[Attrs]]). */
  def topkFilteredSql(attr: String, values: Seq[String],
                      k: Int = QuerySet.K): String = {
    // SQL string literal: double any embedded single quote
    val inList = values.map(v => s"'${v.replace("'", "''")}'").mkString(", ")
    s"""WITH $corpusCtes, $queriesCte,
       |contrib AS (
       |  SELECT q.query_id, tf.doc_id, $contribExpr AS c
       |  FROM qterms q
       |  JOIN tf ON q.term = tf.term
       |  JOIN dfs ON q.term = dfs.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  JOIN documents d ON tf.doc_id = d.doc_id
       |  WHERE d.$attr IN ($inList)
       |), scores AS (
       |  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro
       |  FROM contrib GROUP BY query_id, doc_id
       |), ranked AS (
       |  SELECT query_id,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank,
       |         doc_id, score_micro
       |  FROM scores
       |)
       |SELECT query_id, rank, doc_id, score_micro FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Range-filtered BM25 top-k mirror: candidates restricted to docs with
    * `attr BETWEEN lo AND hi` (numeric); df/avgdl stay corpus-global, the
    * same contract as [[topkFilteredSql]] — the engine side compiles the
    * range to the attr's in-range virtual posting lists ([[Attrs]]). */
  def topkFilteredRangeSql(attr: String, lo: Double, hi: Double,
                           k: Int = QuerySet.K): String = {
    // Locale.ROOT: a comma-decimal JVM locale would render 120,0
    val loS = "%s".formatLocal(java.util.Locale.ROOT, lo)
    val hiS = "%s".formatLocal(java.util.Locale.ROOT, hi)
    s"""WITH $corpusCtes, $queriesCte,
       |contrib AS (
       |  SELECT q.query_id, tf.doc_id, $contribExpr AS c
       |  FROM qterms q
       |  JOIN tf ON q.term = tf.term
       |  JOIN dfs ON q.term = dfs.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  JOIN documents d ON tf.doc_id = d.doc_id
       |  WHERE CAST(d.$attr AS DOUBLE) BETWEEN $loS AND $hiS
       |), scores AS (
       |  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro
       |  FROM contrib GROUP BY query_id, doc_id
       |), ranked AS (
       |  SELECT query_id,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank,
       |         doc_id, score_micro
       |  FROM scores
       |)
       |SELECT query_id, rank, doc_id, score_micro FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Conjunctive (AND) BM25 top-k: docs matched by EVERY distinct query
    * term, scored by the same BM25 sum. `matched` counts the (query, doc)
    * contrib rows — one per query term present in the doc — and must equal
    * the query's full distinct-term count (corpus-absent terms never join
    * `tf`, so a query containing one matches nothing). */
  def topkConjSql(k: Int = QuerySet.K): String =
    s"""WITH $corpusCtes, $queriesCte,
       |qcount AS (
       |  SELECT query_id, count(*) AS m FROM qterms GROUP BY query_id
       |), contrib AS (
       |  SELECT q.query_id, tf.doc_id, $contribExpr AS c
       |  FROM qterms q
       |  JOIN tf ON q.term = tf.term
       |  JOIN dfs ON q.term = dfs.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |), scores AS (
       |  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro,
       |         count(*) AS matched
       |  FROM contrib GROUP BY query_id, doc_id
       |), ranked AS (
       |  SELECT s.query_id,
       |         CAST(row_number() OVER (PARTITION BY s.query_id
       |                                 ORDER BY s.score_micro DESC, s.doc_id ASC) AS INT) AS rank,
       |         s.doc_id, s.score_micro
       |  FROM scores s JOIN qcount qc ON s.query_id = qc.query_id
       |  WHERE s.matched = qc.m
       |)
       |SELECT query_id, rank, doc_id, score_micro FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Exact phrase top-k mirror: token positions via zipped
    * unnest/generate_subscripts (re-ranked after the empty-token filter so
    * positions index the SAME filtered sequence the Spark tokenizer
    * emits), phrase tf per doc via a fixed-length positional chain join
    * (overlapping starts count), df = docs with tf > 0, scored with the
    * shared BM25 micro expression, ranked under the frozen
    * (score DESC, doc_id ASC) order. One UNION ALL branch per phrase of
    * the frozen [[PhraseSet]] (chain length is per-phrase static SQL). */
  def phraseTopkSql(k: Int = PhraseSet.K): String = {
    val perPhrase = PhraseSet.phrases.map { case (pid, terms) =>
      val joins = (1 until terms.size).map(i =>
        s"JOIN tokp a$i ON a$i.doc_id = a0.doc_id AND a$i.pos = a0.pos + $i")
        .mkString(" ")
      val conds = terms.zipWithIndex.map { case (t, i) => s"a$i.term = '$t'" }
        .mkString(" AND ")
      s"  SELECT $pid AS phrase_id, a0.doc_id, count(*) AS tf " +
        s"FROM tokp a0 $joins WHERE $conds GROUP BY a0.doc_id"
    }.mkString("\n  UNION ALL\n")
    s"""WITH $corpusCtes, toksp AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^\\pL\\pN]+')) AS term,
       |         generate_subscripts(regexp_split_to_array(lower(text), '[^\\pL\\pN]+'), 1) AS rawpos
       |  FROM documents
       |), tokp AS (
       |  SELECT doc_id, term, row_number() OVER (PARTITION BY doc_id ORDER BY rawpos) AS pos
       |  FROM toksp WHERE term <> ''
       |), ph0 AS (
       |$perPhrase
       |), phdf AS (
       |  SELECT phrase_id, count(*) AS df FROM ph0 GROUP BY phrase_id
       |), scored AS (
       |  SELECT ph.phrase_id, ph.doc_id,
       |         ${contribExprFor("ph.df", "ph.tf", "ph.dl")} AS score_micro
       |  FROM (SELECT p.phrase_id, p.doc_id, p.tf, f.df, l.dl
       |        FROM ph0 p
       |        JOIN phdf f ON p.phrase_id = f.phrase_id
       |        JOIN dl l ON p.doc_id = l.doc_id) ph
       |), ranked AS (
       |  SELECT phrase_id,
       |         CAST(row_number() OVER (PARTITION BY phrase_id
       |                                 ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank,
       |         doc_id, score_micro
       |  FROM scored
       |)
       |SELECT phrase_id, rank, doc_id, score_micro FROM ranked
       |WHERE rank <= $k ORDER BY phrase_id, rank""".stripMargin
  }

  /** Ordered-proximity top-k mirror: tf counts position pairs (pa, pb)
    * with pb BETWEEN pa+1 AND pa+1+slop — slop 0 is exactly the bigram
    * phrase chain join. Same positional CTEs and scoring as the phrase
    * mirror. */
  def proximityTopkSql(k: Int = PhraseSet.K): String = {
    val perPair = PhraseSet.proximityPairs.map { case (pid, t1, t2, slop) =>
      s"  SELECT $pid AS pair_id, a.doc_id, count(*) AS tf FROM tokp a " +
        s"JOIN tokp b ON b.doc_id = a.doc_id " +
        s"AND b.pos BETWEEN a.pos + 1 AND a.pos + ${slop + 1} " +
        s"WHERE a.term = '$t1' AND b.term = '$t2' GROUP BY a.doc_id"
    }.mkString("\n  UNION ALL\n")
    s"""WITH $corpusCtes, toksp AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^\\pL\\pN]+')) AS term,
       |         generate_subscripts(regexp_split_to_array(lower(text), '[^\\pL\\pN]+'), 1) AS rawpos
       |  FROM documents
       |), tokp AS (
       |  SELECT doc_id, term, row_number() OVER (PARTITION BY doc_id ORDER BY rawpos) AS pos
       |  FROM toksp WHERE term <> ''
       |), ph0 AS (
       |$perPair
       |), phdf AS (
       |  SELECT pair_id, count(*) AS df FROM ph0 GROUP BY pair_id
       |), scored AS (
       |  SELECT ph.pair_id, ph.doc_id,
       |         ${contribExprFor("ph.df", "ph.tf", "ph.dl")} AS score_micro
       |  FROM (SELECT p.pair_id, p.doc_id, p.tf, f.df, l.dl
       |        FROM ph0 p
       |        JOIN phdf f ON p.pair_id = f.pair_id
       |        JOIN dl l ON p.doc_id = l.doc_id) ph
       |), ranked AS (
       |  SELECT pair_id,
       |         CAST(row_number() OVER (PARTITION BY pair_id
       |                                 ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank,
       |         doc_id, score_micro
       |  FROM scored
       |)
       |SELECT pair_id, rank, doc_id, score_micro FROM ranked
       |WHERE rank <= $k ORDER BY pair_id, rank""".stripMargin
  }

  /** Corpus scalar stats. */
  val corpusStatsSql: String =
    s"""WITH $corpusCtes
       |SELECT CAST(n_docs AS BIGINT) AS n_docs,
       |       CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST(floor(avgdl * 1e6 + 0.5) AS BIGINT) AS avgdl_micro
       |FROM meta""".stripMargin

  /** Per-term (term, df, cf). */
  val termStatsSql: String =
    s"""WITH $corpusCtes
       |SELECT term, CAST(df AS BIGINT) AS df, CAST(cf AS BIGINT) AS cf
       |FROM dfs ORDER BY term""".stripMargin

  /** Per-doc length (doc_id, dl) — zero-token docs get dl=0. */
  val docLenSql: String =
    s"""WITH $corpusCtes
       |SELECT d.doc_id, CAST(coalesce(l.dl, 0) AS BIGINT) AS dl
       |FROM documents d LEFT JOIN dl l ON d.doc_id = l.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Full decoded index content: every posting (term, doc_id, tf, dl) —
    * proves the built index stores exactly the corpus postings. */
  val postingsSql: String =
    s"""WITH $corpusCtes
       |SELECT tf.term, tf.doc_id, CAST(tf.tf AS BIGINT) AS tf,
       |       CAST(dl.dl AS BIGINT) AS dl
       |FROM tf JOIN dl ON tf.doc_id = dl.doc_id
       |ORDER BY tf.term, tf.doc_id""".stripMargin
}

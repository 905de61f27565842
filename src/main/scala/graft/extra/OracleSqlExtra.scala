package graft.extra

import graft.OracleSql

/** DuckDB mirrors for the training-data-pipeline operators (same parity
  * rules as [[graft.OracleSql]]). Float folds use list_reduce /
  * list_transform with explicit DOUBLE casts — sequential left-to-right,
  * matching Spark's `aggregate(..., 0.0, _+_)` bit-for-bit.
  * NOTE: this DuckDB's list_zip yields unnamed structs → x[1]/x[2]. */
object OracleSqlExtra {

  val dedupExactSql: String =
    """SELECT md5(text) AS text_md5, count(*) AS n_docs, min(doc_id) AS min_doc_id
      |FROM documents GROUP BY md5(text) HAVING count(*) > 1
      |ORDER BY text_md5""".stripMargin

  /** 3-token shingle CTEs (distinct per doc). */
  val shingleCtes: String =
    """toksarr AS (
      |  SELECT doc_id,
      |         list_filter(regexp_split_to_array(lower(text), '[^\pL\pN]+'),
      |                     t -> t <> '') AS toks
      |  FROM documents
      |), sh0 AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
      |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
      |  FROM toksarr WHERE len(toks) >= 3
      |), sh AS (SELECT DISTINCT doc_id, shingle FROM sh0)""".stripMargin

  def ngramJaccardSql(threshold: Double = 0.5): String =
    s"""WITH $shingleCtes,
       |cnt AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |)
       |SELECT doc_a, doc_b,
       |       CAST(floor(CAST(i AS DOUBLE) / (ca.c + cb.c - i) * 1e6 + 0.5) AS BIGINT)
       |         AS jaccard_micro
       |FROM inter
       |JOIN cnt ca ON doc_a = ca.doc_id
       |JOIN cnt cb ON doc_b = cb.doc_id
       |WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Sequential-fold cosine between two FLOAT[] expressions. */
  def cosExpr(a: String, b: String): String =
    s"""(list_reduce(list_transform(list_zip($a, $b),
       |    x -> CAST(x[1] AS DOUBLE) * x[2]), (p, q) -> p + q)
       | / (sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE) * x), (p, q) -> p + q))
       |  * sqrt(list_reduce(list_transform($b, x -> CAST(x AS DOUBLE) * x), (p, q) -> p + q))))""".stripMargin

  def annBruteSql(k: Int = Ann.K, nq: Int = Ann.NumQueryVecs): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_vec_id, embedding AS qe FROM embeddings
       |  WHERE vec_id < $nq
       |), pairs AS (
       |  SELECT q.query_vec_id, e.vec_id,
       |         ${cosExpr("q.qe", "e.embedding")} AS cos
       |  FROM q JOIN embeddings e ON e.vec_id <> q.query_vec_id
       |), ranked AS (
       |  SELECT query_vec_id,
       |         CAST(row_number() OVER (PARTITION BY query_vec_id
       |                                 ORDER BY cos DESC, vec_id ASC) AS INT) AS rank,
       |         vec_id,
       |         CAST(floor(cos * 1e6 + 0.5) AS BIGINT) AS cos_micro
       |  FROM pairs
       |)
       |SELECT query_vec_id, rank, vec_id, cos_micro FROM ranked
       |WHERE rank <= $k ORDER BY query_vec_id, rank""".stripMargin

  def embeddingDupSql(threshold: Double = 0.4): String =
    s"""WITH p AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         ${cosExpr("a.embedding", "b.embedding")} AS cos
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |)
       |SELECT vec_a, vec_b, CAST(floor(cos * 1e6 + 0.5) AS BIGINT) AS cos_micro
       |FROM p WHERE cos >= $threshold ORDER BY vec_a, vec_b""".stripMargin

  val tokenCountSql: String =
    s"""SELECT doc_id,
       |  CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS BIGINT) AS n_ws,
       |  CAST(len(regexp_extract_all(text, '${TextMetrics.BpeishRegex}')) AS BIGINT) AS n_bpe
       |FROM documents ORDER BY doc_id""".stripMargin

  val qualitySql: String = {
    val stops = TextMetrics.Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, length(text) AS n_chars,
       |         list_filter(regexp_split_to_array(lower(text), '[^\\pL\\pN]+'),
       |                     x -> x <> '') AS toks
       |  FROM documents
       |), m AS (
       |  SELECT doc_id, n_chars,
       |         CAST(len(toks) AS BIGINT) AS n_tokens,
       |         CAST(len(list_filter(toks, x -> x IN ($stops))) AS BIGINT) AS n_stop,
       |         CAST(coalesce(list_reduce(list_transform(toks,
       |             x -> CAST(length(x) AS BIGINT)), (p, q) -> p + q), 0) AS BIGINT) AS sum_len
       |  FROM t
       |)
       |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, n_tokens,
       |  CASE WHEN n_tokens > 0
       |    THEN CAST(floor(CAST(n_stop AS DOUBLE) / n_tokens * 1e6 + 0.5) AS BIGINT)
       |    ELSE 0 END AS stop_ratio_micro,
       |  CASE WHEN n_tokens > 0
       |    THEN CAST(floor(CAST(sum_len AS DOUBLE) / n_tokens * 1e6 + 0.5) AS BIGINT)
       |    ELSE 0 END AS avg_wlen_micro,
       |  CASE WHEN n_tokens > 0
       |    THEN CAST(floor((0.5 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
       |         + 0.3 * (1.0 - CAST(n_stop AS DOUBLE) / n_tokens)
       |         + 0.2 * least((CAST(sum_len AS DOUBLE) / n_tokens) / 8.0, 1.0)) * 1e6 + 0.5) AS BIGINT)
       |    ELSE 0 END AS quality_micro
       |FROM m ORDER BY doc_id""".stripMargin
  }

  val pagesExtractSql: String =
    """SELECT 'https://example.org/' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
      |       md5(text) AS text_md5
      |FROM documents ORDER BY url""".stripMargin

  val mediaMetaSql: String =
    """SELECT 'https://example.org/' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
      |       CAST(octet_length(encode('<html><body>' || text || '</body></html>')) AS BIGINT)
      |         AS n_bytes,
      |       'text/html' AS mime
      |FROM documents ORDER BY url""".stripMargin
}

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

  /** Sequential-fold L2² between two FLOAT[] expressions (mirror of
    * [[Pq.l2Col]]). */
  def l2Expr(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       |    x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
       |       * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))), (p, q) -> p + q)""".stripMargin

  /** Exact L2 top-k — the oracle for the PQ/ADC pipeline's lossless
    * verification config (q_ann_pq). */
  def annL2Sql(k: Int = Ann.K, nq: Int = Ann.NumQueryVecs): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_vec_id, embedding AS qe FROM embeddings
       |  WHERE vec_id < $nq
       |), pairs AS (
       |  SELECT q.query_vec_id, e.vec_id,
       |         ${l2Expr("q.qe", "e.embedding")} AS l2
       |  FROM q JOIN embeddings e ON e.vec_id <> q.query_vec_id
       |), ranked AS (
       |  SELECT query_vec_id,
       |         CAST(row_number() OVER (PARTITION BY query_vec_id
       |                                 ORDER BY l2 ASC, vec_id ASC) AS INT) AS rank,
       |         vec_id,
       |         CAST(floor(l2 * 1e6 + 0.5) AS BIGINT) AS l2_micro
       |  FROM pairs
       |)
       |SELECT query_vec_id, rank, vec_id, l2_micro FROM ranked
       |WHERE rank <= $k ORDER BY query_vec_id, rank""".stripMargin

  def embeddingDupSql(threshold: Double = 0.4): String =
    s"""WITH p AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         ${cosExpr("a.embedding", "b.embedding")} AS cos
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |)
       |SELECT vec_a, vec_b, CAST(floor(cos * 1e6 + 0.5) AS BIGINT) AS cos_micro
       |FROM p WHERE cos >= $threshold ORDER BY vec_a, vec_b""".stripMargin

  /** Mirror of [[Dedup.dupClusters]] over the exact embedding near-dup
    * pairs: recursive transitive closure, component id = min reachable
    * vertex (the same canonical-survivor semantics as the min-label
    * propagation fixpoint). */
  def dupClustersSql(threshold: Double = 0.4): String =
    s"""WITH RECURSIVE p AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |         ${cosExpr("a.embedding", "b.embedding")} AS cos
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |), e AS (
       |  SELECT vec_a AS src, vec_b AS dst FROM p WHERE cos >= $threshold
       |  UNION ALL
       |  SELECT vec_b AS src, vec_a AS dst FROM p WHERE cos >= $threshold
       |), reach(id, r) AS (
       |  SELECT src, src FROM e
       |  UNION
       |  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id
       |)
       |SELECT id AS vec_id, MIN(r) AS cluster_id FROM reach
       |GROUP BY id ORDER BY vec_id""".stripMargin

  /** Mirror of [[Dedup.embeddingDupLsh]] (banded SRP): the hyperplanes
    * are FROZEN data ([[Dedup.dupPlanes]], seeded) — they embed as
    * literals with band = p / r and bit = p % r, the dot folds
    * left-to-right like [[cosExpr]], candidate pairs form only within an
    * equal (band, signature) bucket, survivors verify on exact cosine. */
  def embeddingDupLshSql(threshold: Double = 0.4): String = {
    val planeRows = Dedup.dupPlanes.zipWithIndex.map { case (pl, p) =>
      s"($p, [${pl.mkString(", ")}])"
    }.mkString(",\n       ")
    val r = Dedup.DupBandSize
    s"""WITH planes(p, pv) AS (VALUES
       |       $planeRows),
       |dots AS (
       |  SELECT e.vec_id, pl.p,
       |         list_reduce(list_transform(list_zip(e.embedding, pl.pv),
       |             x -> CAST(x[1] AS DOUBLE) * x[2]), (a, b) -> a + b) AS dot
       |  FROM embeddings e, planes pl
       |),
       |sigs AS (
       |  SELECT vec_id, CAST(p // $r AS INT) AS band,
       |         CAST(SUM(CASE WHEN dot >= 0 THEN (1 << (p % $r)) ELSE 0 END) AS INT)
       |           AS bandsig
       |  FROM dots GROUP BY vec_id, p // $r
       |),
       |cands AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM sigs a JOIN sigs b
       |    ON a.band = b.band AND a.bandsig = b.bandsig AND a.vec_id < b.vec_id
       |),
       |pairs AS (
       |  SELECT vec_a, vec_b,
       |         ${cosExpr("ea.embedding", "eb.embedding")} AS cos
       |  FROM cands
       |  JOIN embeddings ea ON vec_a = ea.vec_id
       |  JOIN embeddings eb ON vec_b = eb.vec_id
       |)
       |SELECT vec_a, vec_b, CAST(floor(cos * 1e6 + 0.5) AS BIGINT) AS cos_micro
       |FROM pairs WHERE cos >= $threshold ORDER BY vec_a, vec_b""".stripMargin
  }

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

  // ---- portable-hash mirrors -------------------------------------------
  /** SQL mirror of [[PortableHash.md5_60]]: top 60 bits (15 hex chars) of
    * md5 as BIGINT — parity is what makes every sketch below
    * cross-engine checkable. */
  def md5_60Sql(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  private val P61 = "2305843009213693951" // 2^61 - 1 (Dedup.MinhashP)

  /** Language-ID mirror, generated from the SAME profile literals as
    * [[TextMetrics.LangProfiles]]: per-language stopword hit counts →
    * unique argmax (ties or zero → 'und'). */
  val langIdSql: String = {
    val langs = TextMetrics.LangProfiles.toSeq.sortBy(_._1)
    val hitCols = langs.map { case (l, words) =>
      val set = words.toSeq.sorted.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(toks, x -> x IN ($set))) AS BIGINT) AS hits_$l"
    }.mkString(",\n       ")
    val names = langs.map(_._1)
    val g = s"greatest(${names.map(l => s"hits_$l").mkString(", ")})"
    val ties = names.map(l => s"CAST(hits_$l = g AS INT)").mkString(" + ")
    val pick = names.init.map(l => s"WHEN hits_$l = g THEN '$l'").mkString("\n         ")
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |         list_filter(regexp_split_to_array(lower(text), '[^\\pL\\pN]+'),
       |                     x -> x <> '') AS toks
       |  FROM documents
       |), h AS (
       |  SELECT doc_id, lang,
       |       $hitCols
       |  FROM t
       |), m AS (SELECT doc_id, lang, $g AS g, * FROM h)
       |SELECT doc_id, lang,
       |  CASE WHEN g = 0 OR ($ties) > 1 THEN 'und'
       |         $pick
       |         ELSE '${names.last}' END AS pred_lang
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** Rabin-Karp rolling-hash fingerprint mirror of
    * [[TextMetrics.fingerprint64]]: acc = (acc*31 + md5_60(tok)) mod
    * 2^61−1, folded left-to-right over the token stream (HUGEINT keeps
    * the 66-bit intermediate exact). */
  val fingerprintSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(text), '[^\\pL\\pN]+'),
       |                     x -> x <> '') AS toks
       |  FROM documents
       |)
       |SELECT doc_id,
       |  CAST(list_reduce(
       |         list_prepend(CAST(0 AS HUGEINT),
       |           list_transform(toks, tk -> CAST(${md5_60Sql("tk")} AS HUGEINT))),
       |         (acc, x) -> (acc * 31 + x) % $P61) AS BIGINT) AS fingerprint
       |FROM t ORDER BY doc_id""".stripMargin

  /** SimHash mirror of [[Dedup.simhash64]]: per (doc, term) the 64-bit
    * sketch hash is h = (md5_60(t) << 4) XOR md5_60('simhash2:'+t); each
    * bit accumulates ±tf; sign vector → 64-bit word. Bits are extracted
    * WITHOUT constructing h (bit b = bit(b−4) of h1 ⊕ bit b of h2) so no
    * 64-bit overflow is needed; bit 63 re-enters as BIGINT min. */
  val simhashSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(text), '[^\\pL\\pN]+'),
       |                     x -> x <> '') AS toks
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS term FROM t)
       |  GROUP BY doc_id, term
       |), th AS (
       |  SELECT doc_id, tf,
       |         ${md5_60Sql("term")} AS h1,
       |         ${md5_60Sql("'simhash2:' || term")} AS h2
       |  FROM tf
       |), bits AS (
       |  SELECT doc_id, b,
       |    SUM(CASE WHEN (xor(CASE WHEN b >= 4 THEN h1 >> (b - 4) ELSE 0 END,
       |                       h2 >> b) & 1) = 1
       |             THEN tf ELSE -tf END) AS acc
       |  FROM th, generate_series(0, 63) g(b)
       |  GROUP BY doc_id, b
       |), sim AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN acc > 0 THEN
       |      CASE WHEN b = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
       |           ELSE CAST(CAST(1 AS BIGINT) << CAST(b AS INT) AS HUGEINT) END
       |      ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id
       |)
       |SELECT t.doc_id, coalesce(sim.simhash, 0) AS simhash
       |FROM t LEFT JOIN sim ON t.doc_id = sim.doc_id
       |ORDER BY t.doc_id""".stripMargin

  /** MinHash+LSH mirror of [[Dedup.minhashLsh]], generated from the SAME
    * frozen permutation table [[Dedup.perms]]: per-perm min over shingle
    * hashes (HUGEINT (a·x+b) mod 2^61−1), band on ${Dedup.BandSize}-wide
    * signature slices, candidate pairs within equal bands, estimate =
    * fraction of equal signature positions. */
  val minhashLshSql: String = {
    val permRows = Dedup.perms.zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(",\n       ")
    val nBands = Dedup.NumPerms / Dedup.BandSize
    val w = Dedup.BandSize
    s"""WITH $shingleCtes,
       |xs AS (SELECT doc_id, ${md5_60Sql("shingle")} AS x FROM sh),
       |perms(i, pa, pb) AS (VALUES
       |       $permRows),
       |sigrows AS (
       |  SELECT doc_id, i,
       |         min(CAST((CAST(pa AS HUGEINT) * x + pb) % $P61 AS BIGINT)) AS m
       |  FROM xs, perms GROUP BY doc_id, i
       |),
       |sigs AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM sigrows GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, b, sig[b*$w + 1 : b*$w + $w] AS bandsig
       |  FROM sigs, generate_series(0, ${nBands - 1}) g(b)
       |),
       |cands AS (
       |  SELECT DISTINCT ba.doc_id AS doc_a, bb.doc_id AS doc_b
       |  FROM bands ba JOIN bands bb
       |    ON ba.b = bb.b AND ba.bandsig = bb.bandsig AND ba.doc_id < bb.doc_id
       |)
       |SELECT doc_a, doc_b,
       |  CAST(floor(CAST(len(list_filter(list_zip(sa.sig, sb.sig),
       |         v -> v[1] = v[2])) AS DOUBLE) / ${Dedup.NumPerms} * 1e6 + 0.5) AS BIGINT)
       |    AS est_jaccard_micro
       |FROM cands JOIN sigs sa ON doc_a = sa.doc_id JOIN sigs sb ON doc_b = sb.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Mirror of [[Pages.mediaFeaturesStub]]: the stub's fake features are
    * a pure function of the html bytes (md5_60 of the page string), so
    * even the stub is hash-checkable cross-engine. */
  val mediaFeaturesSql: String =
    s"""WITH h AS (
       |  SELECT 'https://example.org/' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
       |         CAST(octet_length(encode('<html><body>' || text || '</body></html>')) AS BIGINT)
       |           AS n_bytes,
       |         ${md5_60Sql("'<html><body>' || text || '</body></html>'")} AS hv
       |  FROM documents
       |)
       |SELECT url, n_bytes,
       |  CAST(640 + hv % 640 AS INT) AS fake_width,
       |  CAST(360 + (hv >> 16) % 360 AS INT) AS fake_height,
       |  hv AS fake_hash
       |FROM h ORDER BY url""".stripMargin

  /** Mirror of the composed ingest (q_pages_ingest): dense url-ranked doc
    * ids + md5 of the text DuckDB reads directly from `documents` (the
    * Spark side extracts it from the html binary — a hash match proves
    * byte-identical extraction THROUGH the ingest path). */
  val pagesIngestSql: String =
    """WITH p AS (
      |  SELECT 'https://example.org/' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
      |         text
      |  FROM documents
      |)
      |SELECT CAST(row_number() OVER (ORDER BY url) - 1 AS BIGINT) AS doc_id,
      |       url, md5(text) AS text_md5
      |FROM p ORDER BY doc_id""".stripMargin

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

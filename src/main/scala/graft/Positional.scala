package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Positional sidecar index + exact phrase top-k.
  *
  * Beyond-reference capability (the reference engine has no notion of
  * token order; this is the classic fulltext feature its ANN shape cannot
  * express): a doc-bucketed positions table — per (term, docId-bucket),
  * every (doc, dl, token positions of the term) — and an exact
  * phrase-match query over it, scored like a single BM25 term whose tf is
  * the phrase's occurrence count (overlapping starts count, the positional
  * chain-join semantics) and whose df is the number of docs containing
  * the phrase at least once.
  *
  * Layout choice (scale): positions live OUTSIDE the main posting blocks —
  * the main index pays zero bytes for them (Lucene's .pos sidecar shape),
  * and only phrase queries read them. Rows are bucketed by docId range
  * like the serving layout, so phrase evaluation is a LOCAL per-bucket
  * intersection: a doc's positions for all phrase terms are in the same
  * bucket row group, and per-task memory is bounded by one bucket's token
  * mass (width · avgdl), the same bound the TAAT scorer rides. The encode
  * is one shuffle of the exploded tokens; no driver-side state.
  */
object Positional {

  /** All positions of `term` for the docs of one docId bucket.
    * `bytes`: VByte stream, per doc in ascending docId order:
    *   gap(docId) [first absolute], dl, npos, gap(pos)... [first absolute]
    * npos = the term's tf in the doc; positions are 0-based token indexes
    * (post-tokenizer, empties dropped) and strictly increasing. */
  final case class PosRow(term: String, bucket: Int, n: Long, min_doc: Long,
                          bytes: Array[Byte])

  /** One decoded doc entry of a [[PosRow]]. */
  final case class DocPositions(doc_id: Long, dl: Int, positions: Array[Int])

  def encodeRow(term: String, bucket: Int,
                docs: Seq[(Long, Int, Array[Int])]): PosRow = {
    val sink = new Codec.ByteSink()
    var prevDoc = -1L
    docs.foreach { case (doc, dl, pos) =>
      require(doc > prevDoc, s"docs must be strictly increasing: $doc after $prevDoc")
      Codec.putVLong(sink, if (prevDoc < 0) doc else doc - prevDoc)
      prevDoc = doc
      Codec.putVLong(sink, dl.toLong)
      Codec.putVLong(sink, pos.length.toLong)
      var prev = -1
      pos.foreach { p =>
        require(p > prev, s"positions must be strictly increasing: $p after $prev")
        Codec.putVLong(sink, if (prev < 0) p.toLong else (p - prev).toLong)
        prev = p
      }
    }
    PosRow(term, bucket, docs.size.toLong, docs.head._1, sink.toArray)
  }

  def decodeRow(r: PosRow): Seq[DocPositions] = {
    val rd = new Codec.Reader(r.bytes)
    val out = Vector.newBuilder[DocPositions]
    var doc = -1L
    var i = 0L
    while (i < r.n) {
      val g = rd.readVLong()
      doc = if (doc < 0) g else doc + g
      val dl = rd.readVLong().toInt
      val npos = rd.readVLong().toInt
      val pos = new Array[Int](npos)
      var p = -1
      var j = 0
      while (j < npos) {
        val pg = rd.readVLong().toInt
        p = if (p < 0) pg else p + pg
        pos(j) = p
        j += 1
      }
      out += DocPositions(doc, dl, pos)
      i += 1
    }
    out.result()
  }

  /** Build the positions table: one shuffle of the exploded tokens, keyed
    * (term, bucket), sorted within partitions so each (term, bucket) run
    * encodes streaming (no per-group materialization beyond one run). */
  def build(spark: SparkSession, docs: DataFrame, width: Long,
            numPartitions: Int = 32): Dataset[PosRow] = {
    import spark.implicits._
    docs
      .select($"doc_id", Tokenize.tokensCol($"text").as("toks"))
      .select($"doc_id", size($"toks").as("dl"), posexplode($"toks").as(Seq("pos", "term")))
      .select($"term", ($"doc_id" / width).cast("int").as("bucket"),
        $"doc_id", $"dl".cast("int").as("dl"), $"pos".cast("int").as("pos"))
      .repartition(numPartitions, $"term", $"bucket")
      .sortWithinPartitions($"term", $"bucket", $"doc_id", $"pos")
      .as[(String, Int, Long, Int, Int)]
      .mapPartitions { it =>
        new Iterator[PosRow] {
          private var pending: Option[(String, Int, Long, Int, Int)] = None
          private def nextInput(): Option[(String, Int, Long, Int, Int)] = {
            if (pending.isEmpty && it.hasNext) pending = Some(it.next())
            pending // stashed: hasNext must not consume-and-drop
          }
          override def hasNext: Boolean = nextInput().isDefined
          override def next(): PosRow = {
            val first = nextInput().get
            pending = None
            val (term, bucket) = (first._1, first._2)
            val docsBuf = Vector.newBuilder[(Long, Int, Array[Int])]
            var curDoc = first._3
            var curDl = first._4
            var posBuf = new scala.collection.mutable.ArrayBuffer[Int]
            posBuf += first._5
            var run = true
            while (run) {
              val n = if (it.hasNext) Some(it.next()) else None
              n match {
                case Some(r) if r._1 == term && r._2 == bucket =>
                  if (r._3 != curDoc) {
                    docsBuf += ((curDoc, curDl, posBuf.toArray))
                    curDoc = r._3; curDl = r._4; posBuf = new scala.collection.mutable.ArrayBuffer[Int]
                  }
                  posBuf += r._5
                case other =>
                  pending = other; run = false
              }
            }
            docsBuf += ((curDoc, curDl, posBuf.toArray))
            encodeRow(term, bucket, docsBuf.result())
          }
        }
      }
  }

  /** Persist / reopen (bytes column + term-sorted row groups: a phrase
    * query's `term isin` pushes down to row-group skipping). */
  def write(pos: Dataset[PosRow], dir: String): Unit =
    pos.write.mode("overwrite").parquet(dir)
  def read(spark: SparkSession, dir: String): Dataset[PosRow] = {
    import spark.implicits._
    spark.read.parquet(dir).as[PosRow]
  }

  /** Exact phrase hits: (phrase_id, doc_id, tf, dl) for every doc
    * containing the phrase (tf = number of starting positions; overlapping
    * occurrences count — "table table table" contains "table table"
    * twice). One job for the whole phrase batch: each bucket group decodes
    * its term positions once and evaluates every phrase against them. */
  def phraseHits(spark: SparkSession, pos: Dataset[PosRow],
                 phrases: Seq[(Int, Seq[String])]): DataFrame = {
    import spark.implicits._
    val allTerms = phrases.flatMap(_._2).distinct
    val bc = spark.sparkContext.broadcast(phrases)
    pos.where($"term".isin(allTerms: _*))
      .groupByKey(_.bucket)
      .flatMapGroups { (_, it) =>
        // term -> (docId -> positions, dl); one bucket's phrase-term mass
        val byTerm = scala.collection.mutable.HashMap
          .empty[String, scala.collection.mutable.ArrayBuffer[DocPositions]]
        it.foreach { r =>
          byTerm.getOrElseUpdate(r.term,
            scala.collection.mutable.ArrayBuffer.empty) ++= decodeRow(r)
        }
        // merged inputs may deliver several rows per term — docs stay
        // disjoint across rows but order needs restoring
        val sorted: Map[String, Array[DocPositions]] = byTerm.iterator.map {
          case (t, b) => t -> b.sortBy(_.doc_id).toArray
        }.toMap
        bc.value.iterator.flatMap { case (pid, terms) =>
          if (!terms.forall(sorted.contains)) Iterator.empty
          else {
            val lists = terms.map(sorted).toArray
            // intersect by doc over the phrase's term lists (docId-sorted)
            val cursors = new Array[Int](lists.length)
            val first = lists(0)
            Iterator.range(0, first.length).flatMap { i0 =>
              val d = first(i0)
              var ok = true
              var li = 1
              while (ok && li < lists.length) {
                val l = lists(li)
                var c = cursors(li)
                while (c < l.length && l(c).doc_id < d.doc_id) c += 1
                cursors(li) = c
                ok = c < l.length && l(c).doc_id == d.doc_id
                li += 1
              }
              if (!ok) Iterator.empty
              else {
                // count starts p with positions(term_i) ∋ p+i for all i
                val posArrays = Array.tabulate(lists.length) { li =>
                  if (li == 0) d.positions else lists(li)(cursors(li)).positions
                }
                var tf = 0
                posArrays(0).foreach { p =>
                  var all = true
                  var li = 1
                  while (all && li < posArrays.length) {
                    all = java.util.Arrays.binarySearch(posArrays(li), p + li) >= 0
                    li += 1
                  }
                  if (all) tf += 1
                }
                if (tf > 0) Iterator.single((pid, d.doc_id, tf.toLong, d.dl.toLong))
                else Iterator.empty
              }
            }
          }
        }
      }
      .toDF("phrase_id", "doc_id", "tf", "dl")
  }

  /** Phrase top-k: each phrase scored as one BM25 "term" with
    * tf = occurrence count and df = |{docs: tf > 0}|, ranked under the
    * frozen (score DESC, doc_id ASC) order. The hit set is the phrase's
    * df — small by nature — so the df aggregate + window rank run over a
    * tiny intermediate. */
  def phraseTopK(spark: SparkSession, pos: Dataset[PosRow],
                 phrases: Seq[(Int, Seq[String])], k: Int,
                 nDocs: Long, avgdl: Double): DataFrame = {
    import spark.implicits._
    val hits = phraseHits(spark, pos, phrases)
    val dfs = hits.groupBy($"phrase_id").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"phrase_id")
      .orderBy($"score_micro".desc, $"doc_id".asc)
    hits.join(broadcast(dfs), "phrase_id")
      .select($"phrase_id", $"doc_id",
        Bm25.contribMicroCol(nDocs, avgdl, $"df", $"tf", $"dl").as("score_micro"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where($"rank" <= k)
      .select($"phrase_id", $"rank", $"doc_id", $"score_micro")
      .orderBy($"phrase_id", $"rank")
  }
}

/** Frozen phrase batch (sibling of [[QuerySet]]): common bigrams, a rare
  * repeated-word bigram, a trigram with repeats, and absent-term phrases
  * (must match nothing). Literals frozen so the Spark side and the DuckDB
  * chain-join mirror are provably the same batch. */
object PhraseSet {
  val K = 10

  val phrases: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("table", "hash"),
    2 -> Seq("merge", "group"),
    3 -> Seq("dup", "dup"),              // self-adjacency
    4 -> Seq("table", "table", "table"), // trigram, overlapping starts
    5 -> Seq("slow", "key"),
    6 -> Seq("plan", "cache"),           // 'plan' absent from corpus
    7 -> Seq("customer", "join"),
    8 -> Seq("the", "window")
  )
}

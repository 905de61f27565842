package graft

/** Block-max WAND top-k scorer — the graft of the reference's pruned query
  * (`TopWId` coarse pruning + `ADist` scan + partial_sort top-k,
  * `src/index_ivfpq.cpp:199-295` / `351-410`, SURVEY.md §2.10 Q2-Q4) onto
  * document-at-a-time posting-list intersection:
  *
  *  - term upper bounds (max over block headers) drive WAND pivoting —
  *    docs that provably cannot reach the current heap threshold are
  *    never scored (analog of top-W cluster pruning);
  *  - docId skipping advances over whole compressed blocks using the
  *    `max_doc` header WITHOUT decoding them (analog of never loading
  *    unprobed cluster segments);
  *  - a bounded k-heap under the frozen total order (score_micro DESC,
  *    doc_id ASC) yields the unique top-k — rank-identical to the exact
  *    full-scan oracle by construction (pruning uses strict `<` against
  *    the threshold, so threshold ties — which can still win on doc_id —
  *    are always fully scored).
  *
  * Pure Scala over decoded arrays, invoked from `mapGroups`/
  * `flatMapGroups` (SURVEY.md §7.5: plain-Scala kernel first; promote to
  * codegen Expression only if the bench demands).
  */
object Wand {

  /** Memoizing block decoder: in batched (multi-query) execution the same
    * block is visited by every query whose terms hit it — decode once per
    * task/bucket, share the arrays read-only (identity-keyed: blocks are
    * deserialized object instances within one task). */
  final class BlockCache {
    private val m = new java.util.IdentityHashMap[Block, (Array[Long], Array[Int], Array[Int])]()
    def decode(b: Block): (Array[Long], Array[Int], Array[Int]) = {
      val got = m.get(b)
      if (got != null) got
      else { val d = Codec.decodeBlock(b); m.put(b, d); d }
    }
  }

  /** Per-query-term cursor over the term's posting blocks (possibly many
    * [[PostingRow]] bucket sub-lists, concatenated in docId order). */
  final class TermCursor(val term: String, val idf: Double, avgdl: Double,
                         rows: Seq[PostingRow],
                         decoder: Block => (Array[Long], Array[Int], Array[Int]) = Codec.decodeBlock) {
    // Bucket sub-lists are disjoint docId ranges; min_doc order ⇒ global order.
    private val blocks: Array[Block] =
      rows.sortBy(_.min_doc).iterator.flatMap(_.blocks).toArray
    require(blocks.nonEmpty, s"empty posting list for $term")
    // Defensive: concatenated blocks must be globally docId-ordered.
    // (Cheap: header-only check, no decode.)
    locally {
      var i = 1
      while (i < blocks.length) {
        require(blocks(i).max_doc > blocks(i - 1).max_doc,
          s"unordered blocks for term $term"); i += 1
      }
    }
    val blockUb: Array[Long] =
      blocks.map(b => Bm25.blockUpperMicro(idf, b.max_tf, b.min_dl, avgdl))
    /** Term-level upper bound for WAND pivoting. */
    val termUb: Long = blockUb.max

    var exhausted = false
    var curDoc: Long = -1L
    private var curTf = 0
    private var curDl = 0
    private var bi = 0
    private var pi = -1
    private var docIds: Array[Long] = null
    private var tfs: Array[Int] = null
    private var dls: Array[Int] = null
    var blocksDecoded = 0L // metrics (reference: num_searched_cluster analog)

    private def decode(): Unit = {
      val t = decoder(blocks(bi))
      docIds = t._1; tfs = t._2; dls = t._3
      blocksDecoded += 1
    }
    private def setPos(p: Int): Unit = {
      pi = p; curDoc = docIds(p); curTf = tfs(p); curDl = dls(p)
    }

    /** Contribution of the current posting, in micros. */
    def contrib: Long = Bm25.contribMicro(idf, curTf.toLong, curDl.toLong, avgdl)
    /** Upper bound of the block the cursor currently sits in. */
    def curBlockUb: Long = blockUb(bi)
    /** max_doc of the current block (skip target for block-max moves). */
    def curBlockMaxDoc: Long = blocks(bi).max_doc

    def next(): Unit = {
      if (docIds != null && pi + 1 < docIds.length) setPos(pi + 1)
      else {
        bi += (if (docIds == null) 0 else 1)
        docIds = null; pi = -1
        if (bi >= blocks.length) { exhausted = true; curDoc = Long.MaxValue }
        else { decode(); setPos(0) }
      }
    }

    /** Advance to the first posting with docId ≥ target. Whole blocks with
      * max_doc < target are skipped WITHOUT decoding. */
    def advanceTo(target: Long): Unit = {
      if (exhausted || curDoc >= target) return
      if (docIds != null && docIds(docIds.length - 1) >= target) {
        // target is inside the already-decoded block: binary search forward
        var lo = pi + 1; var hi = docIds.length - 1
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (docIds(mid) < target) lo = mid + 1 else hi = mid
        }
        setPos(lo)
      } else {
        if (docIds != null) { bi += 1; docIds = null; pi = -1 }
        while (bi < blocks.length && blocks(bi).max_doc < target) bi += 1
        if (bi >= blocks.length) { exhausted = true; curDoc = Long.MaxValue }
        else {
          decode()
          var lo = 0; var hi = docIds.length - 1
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (docIds(mid) < target) lo = mid + 1 else hi = mid
          }
          setPos(lo)
        }
      }
    }
  }

  /** Pruning-effort counters for one topk call (reference analog:
    * `avg_searched_cnt` / `num_searched_cluster`,
    * `src/index_ivfpq.cpp:257-294`). */
  final case class Effort(blocksTotal: Long, blocksDecoded: Long, docsScored: Long)

  /** Run WAND for one query. `lists`: term -> its PostingRows (only terms
    * present in the index). Returns hits best-first with 1-based ranks.
    * `decoder`: pass a shared [[BlockCache]].decode when many queries
    * visit the same blocks (batched doc-partitioned serving).
    * `effortOut`: optional per-call effort sink (metrics). */
  def topk(queryId: Int, lists: Map[String, (Double, Seq[PostingRow])],
           avgdl: Double, k: Int,
           decoder: Block => (Array[Long], Array[Int], Array[Int]) = Codec.decodeBlock,
           effortOut: Effort => Unit = _ => ()): Seq[Hit] = {
    var docsScored = 0L
    var cursors: Array[TermCursor] = lists.iterator.map { case (term, (idf, rows)) =>
      new TermCursor(term, idf, avgdl, rows, decoder)
    }.toArray
    val allCursors = cursors
    val blocksTotal = lists.valuesIterator.map(_._2.iterator.map(_.blocks.size.toLong).sum).sum
    def emitEffort(): Unit =
      effortOut(Effort(blocksTotal, allCursors.iterator.map(_.blocksDecoded).sum, docsScored))
    cursors.foreach(_.next())
    cursors = cursors.filterNot(_.exhausted)

    var heap: Seq[TopK.Cand] = Vector.empty // sorted best-first, ≤ k
    def threshold: Long = if (heap.length >= k) heap.last.score_micro else Long.MinValue

    while (cursors.nonEmpty) {
      // sort by current docId (ties by term for determinism)
      java.util.Arrays.sort(cursors, (a: TermCursor, b: TermCursor) =>
        if (a.curDoc != b.curDoc) java.lang.Long.compare(a.curDoc, b.curDoc)
        else a.term.compareTo(b.term))
      // pivot: first prefix whose Σ termUb could reach the threshold
      val th = threshold
      var acc = 0L
      var p = -1
      var i = 0
      while (p < 0 && i < cursors.length) {
        acc += cursors(i).termUb
        if (acc >= th) p = i
        i += 1
      }
      if (p < 0) { emitEffort(); return finish(queryId, heap) } // nothing can reach top-k
      val pivotDoc = cursors(p).curDoc
      if (cursors(0).curDoc == pivotDoc) {
        // Block-max check: Σ current-block UBs over cursors at pivotDoc —
        // if even the block bounds can't reach the threshold, skip the
        // whole doc without computing contributions.
        var bub = 0L
        var j = 0
        while (j < cursors.length && cursors(j).curDoc == pivotDoc) {
          bub += cursors(j).curBlockUb; j += 1
        }
        if (bub >= th) {
          var s = 0L
          var m = 0
          while (m < j) { s += cursors(m).contrib; m += 1 }
          heap = TopK.insert(heap, TopK.Cand(pivotDoc, s), k)
          docsScored += 1
        }
        var m = 0
        while (m < j) { cursors(m).next(); m += 1 }
      } else {
        // advance the highest-ub cursor that is strictly before the pivot
        // (cursors are sorted, so those form a non-empty prefix; picking
        // one already AT pivotDoc would no-op and loop forever)
        var best = 0
        var j = 1
        while (j < cursors.length && cursors(j).curDoc < pivotDoc) {
          if (cursors(j).termUb > cursors(best).termUb) best = j
          j += 1
        }
        cursors(best).advanceTo(pivotDoc)
      }
      cursors = cursors.filterNot(_.exhausted)
    }
    emitEffort()
    finish(queryId, heap)
  }

  private def finish(queryId: Int, heap: Seq[TopK.Cand]): Seq[Hit] =
    heap.zipWithIndex.map { case (c, i) => Hit(queryId, i + 1, c.doc_id, c.score_micro) }

  /** Exhaustive (no-pruning) scorer over the same cursors — the in-task
    * oracle used by property tests (WAND ≡ naive on every input). */
  def naiveTopk(queryId: Int, lists: Map[String, (Double, Seq[PostingRow])],
                avgdl: Double, k: Int): Seq[Hit] = {
    val acc = scala.collection.mutable.LongMap.empty[Long]
    lists.foreach { case (_, (idf, rows)) =>
      rows.foreach { row =>
        Codec.decodeAll(row).foreach { p =>
          acc(p.doc_id) = acc.getOrElse(p.doc_id, 0L) +
            Bm25.contribMicro(idf, p.tf, p.dl, avgdl)
        }
      }
    }
    var heap: Seq[TopK.Cand] = Vector.empty
    acc.foreach { case (d, s) => heap = TopK.insert(heap, TopK.Cand(d, s), k) }
    finish(queryId, heap)
  }
}

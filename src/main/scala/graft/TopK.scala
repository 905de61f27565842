package graft

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k under the frozen total order (score_micro DESC, doc_id
  * ASC) — the graft of the reference's `partial_sort` top-k
  * (`src/index_ivf.cpp:220-234`, SURVEY.md §2.6 T2) as a Spark
  * `Aggregator`: per-partition bounded buffers merged associatively
  * (treeReduce-shaped), so per-group state is O(k) regardless of group
  * size — no full sort, no window shuffle of all candidates.
  *
  * Because the order is TOTAL (integer score, then doc_id) the merged
  * top-k set is unique — partial-aggregation order cannot change results.
  */
object TopK {
  final case class Cand(doc_id: Long, score_micro: Long)

  /** true iff a is strictly better than b under (score DESC, doc_id ASC). */
  @inline def better(a: Cand, b: Cand): Boolean =
    a.score_micro > b.score_micro ||
      (a.score_micro == b.score_micro && a.doc_id < b.doc_id)

  /** Merge two sorted-best-first lists, keep k (classic merge step). */
  def mergeTopK(a: Seq[Cand], b: Seq[Cand], k: Int): Seq[Cand] = {
    val out = Vector.newBuilder[Cand]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && better(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  /** Insert into a sorted-best-first bounded list. O(k) per insert — fine
    * for k=10; swap for a binary heap if k grows. */
  def insert(buf: Seq[Cand], c: Cand, k: Int): Seq[Cand] = {
    if (buf.length >= k && !better(c, buf.last)) buf
    else {
      val idx = buf.indexWhere(x => better(c, x)) match {
        case -1 => buf.length
        case i  => i
      }
      (buf.take(idx) :+ c) ++ buf.drop(idx).take(k - idx - 1)
    }
  }

  final class Agg[K](k: Int) extends Aggregator[(K, Cand), Seq[Cand], Seq[Cand]] {
    def zero: Seq[Cand] = Vector.empty
    def reduce(buf: Seq[Cand], in: (K, Cand)): Seq[Cand] = insert(buf, in._2, k)
    def merge(a: Seq[Cand], b: Seq[Cand]): Seq[Cand] = mergeTopK(a, b, k)
    def finish(r: Seq[Cand]): Seq[Cand] = r
    def bufferEncoder: Encoder[Seq[Cand]] = ExpressionEncoder[Seq[Cand]]()
    def outputEncoder: Encoder[Seq[Cand]] = ExpressionEncoder[Seq[Cand]]()
  }

  /** Order-preserving bijection Double ↔ Long (the classic IEEE-754 sign
    * trick): signed-long comparison of the encoding == double comparison,
    * so a DOUBLE-scored candidate set can ride the integer-keyed [[Cand]]
    * heap with zero loss — encode before, decode after. */
  @inline def sortableBits(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & Long.MaxValue)
  }
  @inline def fromSortableBits(l: Long): Double =
    java.lang.Double.longBitsToDouble(l ^ ((l >> 63) & Long.MaxValue))
}

package graft

import scala.collection.mutable.ArrayBuffer

/** Posting-list compression: delta-gap + variable-byte (VByte), cut into
  * self-contained block-max blocks of [[Codec.BlockSize]] postings.
  *
  * Capability analog of the reference's PQ compression (D floats → mp
  * bytes, `src/quantizer.cpp:133-188`) except LOSSLESS, per the north rule.
  * Block layout (all VByte-encoded unsigned longs):
  *
  *   docId₀, tf₀, dl₀, gap₁, tf₁, dl₁, ... gapᵢ = docIdᵢ - docIdᵢ₋₁ ≥ 1
  *
  * The first docId is absolute, so blocks concatenate freely across
  * segment merges (SURVEY.md §7.6 item 5 — no seam re-anchoring needed).
  * Headers (max_doc, n, max_tf, min_dl) live in [[Block]]; max_doc powers
  * docId skipping, (max_tf, min_dl) powers score upper bounds
  * ([[Bm25.blockUpperMicro]]) — the analog of the reference's per-cluster
  * pruning bound (TopWId, `src/index_ivfpq.cpp:199-237`).
  */
object Codec {
  val BlockSize = 128

  // ---- VByte primitives ------------------------------------------------
  def putVLong(out: ArrayBuffer[Byte], value: Long): Unit = {
    require(value >= 0, s"VByte requires non-negative, got $value")
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    out += v.toByte
  }

  /** Growable PRIMITIVE byte sink for the hot encode path. Scala's
    * `ArrayBuffer[Byte]` is unspecialized — it stores each byte as an
    * 8-byte boxed reference (8× the memory traffic of the data) — and the
    * build encodes the entire index through it twice (map emit + reduce
    * merge). Reusable across blocks via [[clear]]: one sink per task, one
    * exact-size `toArray` per block (the block bytes themselves). */
  final class ByteSink(initial: Int = 4096) {
    private var buf = new Array[Byte](initial)
    private var nn = 0
    @inline def add(b: Byte): Unit = {
      if (nn == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length << 1)
      buf(nn) = b
      nn += 1
    }
    def clear(): Unit = nn = 0
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, nn)
  }

  def putVLong(out: ByteSink, value: Long): Unit = {
    require(value >= 0, s"VByte requires non-negative, got $value")
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.add(((v & 0x7f) | 0x80).toByte)
      v >>>= 7
    }
    out.add(v.toByte)
  }

  /** Mutable read position wrapper (avoids tuple allocation per value). */
  final class Reader(val bytes: Array[Byte]) {
    var pos: Int = 0
    def hasNext: Boolean = pos < bytes.length
    def readVLong(): Long = {
      var v = 0L; var shift = 0; var b = 0
      do {
        b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
  }

  // ---- Block encode/decode --------------------------------------------
  /** Encode one block of postings (docIds strictly increasing). */
  def encodeBlock(docIds: Array[Long], tfs: Array[Int], dls: Array[Int]): Block = {
    require(docIds.length > 0 && tfs.length == docIds.length && dls.length == docIds.length)
    encodeBlockRange(docIds, tfs, dls, 0, docIds.length, new ByteSink(docIds.length * 4))
  }

  /** [[encodeBlock]] over the range [from, until) of the parallel arrays,
    * writing through a reusable sink — the hot-path shape: the build's
    * emit and merge loops encode straight out of their posting buffers
    * with zero intermediate array copies (the `copyOfRange`+`slice`
    * variant copied every posting ~4× — gigabytes of young-gen garbage
    * per build whose collection pauses idle ALL pinned cores, the
    * measured 4→16-core scaling loss). Byte output is bit-identical to
    * the whole-array path. */
  def encodeBlockRange(docIds: Array[Long], tfs: Array[Int], dls: Array[Int],
                       from: Int, until: Int, sink: ByteSink): Block = {
    sink.clear()
    var prev = -1L
    var maxTf = 0
    var minDl = Int.MaxValue
    var i = from
    while (i < until) {
      val d = docIds(i)
      require(d > prev, s"docIds must be strictly increasing: $d after $prev")
      putVLong(sink, if (i == from) d else d - prev)
      putVLong(sink, tfs(i).toLong)
      putVLong(sink, dls(i).toLong)
      if (tfs(i) > maxTf) maxTf = tfs(i)
      if (dls(i) < minDl) minDl = dls(i)
      prev = d
      i += 1
    }
    Block(docIds(until - 1), until - from, maxTf, minDl, sink.toArray)
  }

  /** Decode a block into parallel arrays (docIds, tfs, dls). */
  def decodeBlock(b: Block): (Array[Long], Array[Int], Array[Int]) = {
    val docIds = new Array[Long](b.n)
    val tfs = new Array[Int](b.n)
    val dls = new Array[Int](b.n)
    val r = new Reader(b.bytes)
    var prev = 0L
    var i = 0
    while (i < b.n) {
      val g = r.readVLong()
      prev = if (i == 0) g else prev + g
      docIds(i) = prev
      tfs(i) = r.readVLong().toInt
      dls(i) = r.readVLong().toInt
      i += 1
    }
    (docIds, tfs, dls)
  }

  /** Cut a full posting list into blocks of [[BlockSize]]. */
  def encodeBlocks(docIds: Array[Long], tfs: Array[Int], dls: Array[Int],
                   blockSize: Int = BlockSize): Seq[Block] =
    encodeBlocksRange(docIds, tfs, dls, 0, docIds.length, blockSize,
      new ByteSink())

  /** [[encodeBlocks]] over [from, until) with a reusable sink — no array
    * slices, no per-block copies; bit-identical output. */
  def encodeBlocksRange(docIds: Array[Long], tfs: Array[Int], dls: Array[Int],
                        from: Int, until: Int, blockSize: Int,
                        sink: ByteSink): Seq[Block] = {
    val out = Vector.newBuilder[Block]
    var off = from
    while (off < until) {
      val len = math.min(blockSize, until - off)
      out += encodeBlockRange(docIds, tfs, dls, off, off + len, sink)
      off += len
    }
    out.result()
  }

  /** Decode all blocks of a posting row (verification path). */
  def decodeAll(row: PostingRow): Seq[Posting] =
    row.blocks.flatMap { b =>
      val (ds, ts, ls) = decodeBlock(b)
      ds.indices.map(i => Posting(row.term, ds(i), ts(i).toLong, ls(i).toLong))
    }
}

package graft.codec

import scala.collection.mutable.ArrayBuffer

/** One compressed run of a posting list: at most [[PostingsCodec.BlockSize]]
  * (docId, tf) entries plus impact metadata for block-max WAND.
  *
  * Layout (cf. the reference's Lucene 10.4 postings format — 128-entry
  * doc blocks, delta-encoded docIDs, per-block impact (maxTf, norm) pairs in
  * skip data; SURVEY.md §4.2). We use varint rather than bit-packed FOR:
  * same asymptotics, simpler, and parquet page compression closes most of
  * the remaining gap.
  *
  * @param first_doc absolute docId of the first entry
  * @param last_doc  absolute docId of the last entry (enables block skipping
  *                  without decoding — the skip-list role)
  * @param count     number of entries (1..128)
  * @param gaps      varint-encoded docId deltas for entries 1..count-1
  * @param tfs       varint-encoded term frequencies for entries 0..count-1
  * @param max_tf    max term frequency in the block (impact upper bound)
  * @param min_norm  quantized norm byte of the shortest document in the block
  *                  (SmallFloat-monotone, so unsigned-min byte = min length)
  * @param poss      varint-encoded token positions: entry i contributes
  *                  tf_i deltas (first absolute, then gaps) — Lucene's .prx
  *                  role, consumed by the exact-phrase path. Empty when the
  *                  index was built without positions.
  */
case class Block(
    first_doc: Long,
    last_doc: Long,
    count: Int,
    gaps: Array[Byte],
    tfs: Array[Byte],
    max_tf: Int,
    min_norm: Byte,
    poss: Array[Byte] = Array.empty)

/** Decoded postings for one term within one segment. */
final case class DecodedPostings(docs: Array[Long], tfs: Array[Int], norms: Array[Byte]) {
  def length: Int = docs.length
}

/** Delta + varint block codec for posting lists, pure Scala (no Spark). */
object PostingsCodec {

  val BlockSize = 128

  // ---- varint ----------------------------------------------------------

  def writeVLong(v0: Long, out: ArrayBuffer[Byte]): Unit = {
    var v = v0
    require(v >= 0, s"varint requires non-negative: $v")
    while ((v & ~0x7fL) != 0) {
      out += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    out += v.toByte
  }

  /** Reads one varint starting at `pos`; returns (value, nextPos). */
  def readVLong(bytes: Array[Byte], pos: Int): (Long, Int) = {
    var p = pos
    var shift = 0
    var result = 0L
    var b = bytes(p)
    while ((b & 0x80) != 0) {
      result |= (b & 0x7fL) << shift
      shift += 7
      p += 1
      b = bytes(p)
    }
    result |= (b & 0x7fL) << shift
    (result, p + 1)
  }

  /** Decode `n` varints from `bytes` into `out` starting at offset 0. */
  def readVLongs(bytes: Array[Byte], n: Int, out: Array[Long]): Unit = {
    var p = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var result = 0L
      var b = bytes(p); p += 1
      while ((b & 0x80) != 0) {
        result |= (b & 0x7fL) << shift
        shift += 7
        b = bytes(p); p += 1
      }
      result |= (b & 0x7fL) << shift
      out(i) = result
      i += 1
    }
  }

  // ---- block encode/decode ---------------------------------------------

  /** Encode one term's postings (docIds strictly ascending) into blocks.
    * `poss(i)` holds entry i's strictly-ascending token positions (length
    * tf_i); pass null for an index without positions (norms sidecar). */
  def encode(docs: Array[Long], tfs: Array[Int], norms: Array[Byte],
      poss: Array[Array[Int]] = null): Array[Block] = {
    val n = docs.length
    require(tfs.length == n && norms.length == n)
    if (n == 0) return Array.empty
    val blocks = ArrayBuffer.empty[Block]
    var start = 0
    while (start < n) {
      val end = math.min(start + BlockSize, n)
      val gapBuf = new ArrayBuffer[Byte]((end - start) * 2)
      val tfBuf = new ArrayBuffer[Byte](end - start)
      val posBuf = new ArrayBuffer[Byte](if (poss == null) 0 else (end - start) * 2)
      var maxTf = 0
      var minNorm = 0xff
      var i = start
      while (i < end) {
        if (i > start) {
          val gap = docs(i) - docs(i - 1)
          require(gap > 0, s"docIds must be strictly ascending at $i")
          writeVLong(gap, gapBuf)
        }
        writeVLong(tfs(i).toLong, tfBuf)
        if (poss != null) {
          val ps = poss(i)
          require(ps.length == tfs(i), s"positions/tf mismatch at $i")
          var j = 0
          while (j < ps.length) {
            writeVLong(if (j == 0) ps(0).toLong else (ps(j) - ps(j - 1)).toLong, posBuf)
            j += 1
          }
        }
        if (tfs(i) > maxTf) maxTf = tfs(i)
        val u = java.lang.Byte.toUnsignedInt(norms(i))
        if (u < minNorm) minNorm = u
        i += 1
      }
      blocks += Block(docs(start), docs(end - 1), end - start,
        gapBuf.toArray, tfBuf.toArray, maxTf, minNorm.toByte, posBuf.toArray)
      start = end
    }
    blocks.toArray
  }

  /** Flat-positions encode: entry i's positions are the next `tfs(i)` values
    * of `flatPos` (concatenated in entry order; extra capacity beyond the
    * sum of tfs is ignored). Pass null for an index without positions.
    *
    * This is the indexing hot path: the builder's per-term accumulation
    * keeps positions in ONE primitive array per term instead of one small
    * Array[Int] per posting entry — millions of tiny heap objects per task
    * otherwise put G1 into multi-second evacuation pauses at high
    * parallelism (measured: 813s GC / 689s CPU on the postings stage at
    * local[16] with the per-entry layout). */
  def encodeFlat(docs: Array[Long], tfs: Array[Int], norms: Array[Byte],
      flatPos: Array[Int]): Array[Block] = {
    val n = docs.length
    require(tfs.length == n && norms.length == n)
    if (n == 0) return Array.empty
    val blocks = ArrayBuffer.empty[Block]
    var start = 0
    var p = 0 // running cursor into flatPos
    while (start < n) {
      val end = math.min(start + BlockSize, n)
      val gapBuf = new ArrayBuffer[Byte]((end - start) * 2)
      val tfBuf = new ArrayBuffer[Byte](end - start)
      val posBuf = new ArrayBuffer[Byte](if (flatPos == null) 0 else (end - start) * 2)
      var maxTf = 0
      var minNorm = 0xff
      var i = start
      while (i < end) {
        if (i > start) {
          val gap = docs(i) - docs(i - 1)
          require(gap > 0, s"docIds must be strictly ascending at $i")
          writeVLong(gap, gapBuf)
        }
        writeVLong(tfs(i).toLong, tfBuf)
        if (flatPos != null) {
          var j = 0
          while (j < tfs(i)) {
            writeVLong(if (j == 0) flatPos(p).toLong
              else (flatPos(p) - flatPos(p - 1)).toLong, posBuf)
            j += 1
            p += 1
          }
        }
        if (tfs(i) > maxTf) maxTf = tfs(i)
        val u = java.lang.Byte.toUnsignedInt(norms(i))
        if (u < minNorm) minNorm = u
        i += 1
      }
      blocks += Block(docs(start), docs(end - 1), end - start,
        gapBuf.toArray, tfBuf.toArray, maxTf, minNorm.toByte, posBuf.toArray)
      start = end
    }
    blocks.toArray
  }

  /** Decode a block's per-entry token positions (empty outer array if the
    * block carries none). Requires the block's tfs. */
  def decodePositions(b: Block): Array[Array[Int]] = {
    if (b.poss == null || b.poss.isEmpty) return Array.empty
    val tl = new Array[Long](b.count)
    readVLongs(b.tfs, b.count, tl)
    val out = new Array[Array[Int]](b.count)
    var p = 0
    var i = 0
    while (i < b.count) {
      val tf = tl(i).toInt
      val ps = new Array[Int](tf)
      var prev = 0
      var j = 0
      while (j < tf) {
        val (v, np) = readVLong(b.poss, p)
        p = np
        prev = if (j == 0) v.toInt else prev + v.toInt
        ps(j) = prev
        j += 1
      }
      out(i) = ps
      i += 1
    }
    out
  }

  /** Decode a single block into preallocated arrays at offset `off`.
    * Norms are NOT stored per posting — callers resolve them from the
    * segment norms sidecar; this returns docs+tfs only. */
  def decodeBlock(b: Block, docs: Array[Long], tfs: Array[Int], off: Int): Unit = {
    docs(off) = b.first_doc
    if (b.count > 1) {
      val gaps = new Array[Long](b.count - 1)
      readVLongs(b.gaps, b.count - 1, gaps)
      var i = 1
      var cur = b.first_doc
      while (i < b.count) {
        cur += gaps(i - 1)
        docs(off + i) = cur
        i += 1
      }
    }
    val tl = new Array[Long](b.count)
    readVLongs(b.tfs, b.count, tl)
    var i = 0
    while (i < b.count) { tfs(off + i) = tl(i).toInt; i += 1 }
  }

  /** Full decode of a block list (tests / merge path). */
  def decode(blocks: Array[Block]): (Array[Long], Array[Int]) = {
    val n = blocks.map(_.count).sum
    val docs = new Array[Long](n)
    val tfs = new Array[Int](n)
    var off = 0
    blocks.foreach { b => decodeBlock(b, docs, tfs, off); off += b.count }
    (docs, tfs)
  }

  /** Sort-merge union of two block lists over DISJOINT docId sets, re-blocked
    * so that merge(index(A), index(B)) == index(A ∪ B) byte-for-byte
    * (the segment-merge operator; cf. Lucene's TieredMergePolicy semantics —
    * the reference configures it at
    * `solr/core/src/java/org/apache/solr/update/SolrIndexConfig.java:66-107`).
    * Norms for re-computing per-block min_norm come from the segment norms
    * lookup passed in. */
  def merge(a: Array[Block], b: Array[Block], normOf: Long => Byte): Array[Block] = {
    val (da, ta) = decode(a)
    val (db, tb) = decode(b)
    // positions survive the merge only when EVERY input block carries them:
    // a mixed positional/position-less merge would misalign the per-entry
    // position arrays (decodePositions returns empty for a bare block), so
    // the merged output drops positions instead — same contract as Lucene's
    // FieldInfos downgrade when segments disagree on IndexOptions
    def allPos(xs: Array[Block]): Boolean =
      xs.forall(x => x.poss != null && x.poss.nonEmpty)
    val hasPos = (a.nonEmpty || b.nonEmpty) && allPos(a) && allPos(b)
    val pa = if (hasPos) a.flatMap(decodePositions) else null
    val pb = if (hasPos) b.flatMap(decodePositions) else null
    val n = da.length + db.length
    val docs = new Array[Long](n)
    val tfs = new Array[Int](n)
    val poss = if (hasPos) new Array[Array[Int]](n) else null
    var i = 0; var j = 0; var k = 0
    while (i < da.length && j < db.length) {
      if (da(i) < db(j)) {
        docs(k) = da(i); tfs(k) = ta(i); if (hasPos) poss(k) = pa(i); i += 1
      } else {
        docs(k) = db(j); tfs(k) = tb(j); if (hasPos) poss(k) = pb(j); j += 1
      }
      k += 1
    }
    while (i < da.length) { docs(k) = da(i); tfs(k) = ta(i); if (hasPos) poss(k) = pa(i); i += 1; k += 1 }
    while (j < db.length) { docs(k) = db(j); tfs(k) = tb(j); if (hasPos) poss(k) = pb(j); j += 1; k += 1 }
    val norms = new Array[Byte](n)
    var m = 0
    while (m < n) { norms(m) = normOf(docs(m)); m += 1 }
    encode(docs, tfs, norms, poss)
  }
}

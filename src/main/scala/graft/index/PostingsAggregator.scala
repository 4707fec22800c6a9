package graft.index

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.codec.PostingsCodec

/** Growable primitive int buffer (no boxing — the per-token position
  * accumulation sits on the indexing hot path). */
final class IntBuf(var a: Array[Int] = new Array[Int](4), var n: Int = 0) {
  def add(v: Int): Unit = {
    if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
    a(n) = v
    n += 1
  }
  def toArray: Array[Int] = java.util.Arrays.copyOf(a, n)
  def clear(): Unit = n = 0
}

/** Mutable accumulation buffer for one (segment, term) posting list.
  * Kryo-encoded (opaque) — it only ever lives inside the aggregation.
  *
  * Positions are stored FLAT: entry i owns the next tfs(i) values of `pos`,
  * in entry order. One primitive array per term instead of one small
  * Array[Int] per posting entry — with ~10^7 posting entries per segment
  * task, the per-entry layout put ~10^8 tiny live objects on the heap at
  * local[16] and drove G1 into 3-18s evacuation pauses (measured 813s GC vs
  * 689s CPU on the postings stage); flat storage removes the object count
  * entirely. Either every entry of a buf carries positions or none does
  * (the norms sidecar and the TokenRow aggregation path carry none). */
final class PostingsBuf(
    var docs: Array[Long],
    var tfs: Array[Int],
    var norms: Array[Byte],
    var pos: Array[Int], // flat concatenated positions (posN valid ints)
    var posN: Int,
    var size: Int,
    var sorted: Boolean,
    var isLenRow: Boolean,
    var hasPos: Boolean) extends Serializable {

  def this() = this(new Array[Long](8), new Array[Int](8), new Array[Byte](8),
    new Array[Int](0), 0, 0, true, false, false)

  def add(doc: Long, tf: Int, norm: Byte): Unit = {
    require(!hasPos, "mixing position-less entries into a positional buf")
    if (size == docs.length) grow(size * 2)
    if (sorted && size > 0 && docs(size - 1) > doc) sorted = false
    docs(size) = doc; tfs(size) = tf; norms(size) = norm
    size += 1
  }

  /** Append one entry whose positions are `positions.a[0, positions.n)`
    * (tf = positions.n) — reads the caller's scratch IntBuf directly, no
    * per-entry array materialization. */
  def addPos(doc: Long, norm: Byte, positions: IntBuf): Unit = {
    require(size == 0 || hasPos, "mixing positional entries into a position-less buf")
    hasPos = true
    if (size == docs.length) grow(size * 2)
    if (sorted && size > 0 && docs(size - 1) > doc) sorted = false
    docs(size) = doc; tfs(size) = positions.n; norms(size) = norm
    size += 1
    if (posN + positions.n > pos.length)
      pos = java.util.Arrays.copyOf(pos, math.max(posN + positions.n, math.max(16, pos.length * 2)))
    System.arraycopy(positions.a, 0, pos, posN, positions.n)
    posN += positions.n
  }

  /** Append ONE token occurrence: if `doc` is already the last entry, bump
    * its tf and append the position; otherwise open a new entry. The
    * segment-build pass feeds each doc's occurrences consecutively in
    * ascending position order, so this accumulates exactly what
    * [[addPos]] built from a per-(doc, term) scratch buffer — without
    * allocating that buffer per (doc, term) pair (~10 per doc; the
    * allocation-rate driver of the postings stage's GC share at 16 slots). */
  def addOcc(doc: Long, norm: Byte, position: Int): Unit = {
    require(size == 0 || hasPos, "mixing positional entries into a position-less buf")
    hasPos = true
    if (size > 0 && docs(size - 1) == doc) tfs(size - 1) += 1
    else {
      if (size == docs.length) grow(size * 2)
      if (sorted && size > 0 && docs(size - 1) > doc) sorted = false
      docs(size) = doc; tfs(size) = 1; norms(size) = norm
      size += 1
    }
    if (posN == pos.length)
      pos = java.util.Arrays.copyOf(pos, math.max(16, pos.length * 2))
    pos(posN) = position
    posN += 1
  }

  private def grow(cap: Int): Unit = {
    docs = java.util.Arrays.copyOf(docs, cap)
    tfs = java.util.Arrays.copyOf(tfs, cap)
    norms = java.util.Arrays.copyOf(norms, cap)
  }

  def absorb(o: PostingsBuf): PostingsBuf = {
    if (o.size > 0) {
      require(size == 0 || hasPos == o.hasPos,
        "cannot merge a positional buf with a position-less one")
      if (size + o.size > docs.length) grow(math.max(size + o.size, size * 2))
      System.arraycopy(o.docs, 0, docs, size, o.size)
      System.arraycopy(o.tfs, 0, tfs, size, o.size)
      System.arraycopy(o.norms, 0, norms, size, o.size)
      if (size > 0 && (!o.sorted || docs(size) < docs(size - 1))) sorted = false
      else if (!o.sorted) sorted = false
      size += o.size
      if (o.hasPos) {
        hasPos = true
        if (posN + o.posN > pos.length)
          pos = java.util.Arrays.copyOf(pos, posN + o.posN)
        System.arraycopy(o.pos, 0, pos, posN, o.posN)
        posN += o.posN
      }
    }
    this
  }

  /** Sort by docId if out-of-order partials were merged (argsort, stable). */
  def ensureSorted(): Unit = {
    if (!sorted) {
      val idx = Array.range(0, size).sortBy(docs(_))
      val d = new Array[Long](size); val t = new Array[Int](size)
      val n = new Array[Byte](size)
      // per-entry offsets into the flat positions (prefix sums of tfs)
      val off = if (hasPos) new Array[Int](size) else null
      if (hasPos) {
        var acc = 0
        var i = 0
        while (i < size) { off(i) = acc; acc += tfs(i); i += 1 }
      }
      val p = if (hasPos) new Array[Int](posN) else pos
      var pn = 0
      var i = 0
      while (i < size) {
        val j = idx(i); d(i) = docs(j); t(i) = tfs(j); n(i) = norms(j)
        if (hasPos) {
          System.arraycopy(pos, off(j), p, pn, tfs(j))
          pn += tfs(j)
        }
        i += 1
      }
      docs = d; tfs = t; norms = n; pos = p; sorted = true
    }
  }
}

/** Typed Catalyst aggregation building one compressed posting list per
  * (segment, term) key — the Spark-native rendering of Lucene's in-RAM
  * postings build + flush (SURVEY.md §7.2: mirrors the reference's
  * mergeable-partials SlotAcc pattern,
  * `solr/core/src/java/org/apache/solr/search/facet/SlotAcc.java`).
  *
  * Scale note: because a segment IS a Spark partition of the doc table, each
  * (segment, term) key is completed map-side (partial aggregation), so the
  * shuffle moves finished buffers ≈ the index itself, and a hot term's
  * posting list is bounded by segment size — skew is capped by construction;
  * no global per-term reduce ever materializes a 10^12-entry list. */
object PostingsAggregator
    extends Aggregator[TokenRow, PostingsBuf, PostingRow] {

  override def zero: PostingsBuf = new PostingsBuf()

  override def reduce(b: PostingsBuf, r: TokenRow): PostingsBuf = {
    if (r.term.isEmpty) b.isLenRow = true
    b.add(r.doc_id, r.tf, r.norm); b
  }

  override def merge(a: PostingsBuf, b: PostingsBuf): PostingsBuf = {
    a.isLenRow |= b.isLenRow
    a.absorb(b)
  }

  override def finish(b: PostingsBuf): PostingRow = {
    b.ensureSorted()
    val docs = java.util.Arrays.copyOf(b.docs, b.size)
    val tfs = java.util.Arrays.copyOf(b.tfs, b.size)
    val norms = java.util.Arrays.copyOf(b.norms, b.size)
    var ttf = 0L
    var i = 0
    while (i < b.size) { ttf += tfs(i); i += 1 }
    val firstDoc = if (b.size > 0) docs(0) else -1L
    // term/segment_id are filled by the caller from the grouping key (withKey)
    if (b.isLenRow)
      PostingRow("", -1, b.size, ttf, firstDoc, Array.empty, norms)
    else
      PostingRow("", -1, b.size, ttf, firstDoc,
        PostingsCodec.encodeFlat(docs, tfs, norms, if (b.hasPos) b.pos else null), null)
  }

  override def bufferEncoder: Encoder[PostingsBuf] = Encoders.kryo[PostingsBuf]
  override def outputEncoder: Encoder[PostingRow] = Encoders.product[PostingRow]
}

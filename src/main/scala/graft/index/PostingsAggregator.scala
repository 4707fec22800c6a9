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
  * Kryo-encoded (opaque) — it only ever lives inside the aggregation. */
final class PostingsBuf(
    var docs: Array[Long],
    var tfs: Array[Int],
    var norms: Array[Byte],
    var poss: Array[Array[Int]], // per-entry token positions (null entries ok)
    var size: Int,
    var sorted: Boolean,
    var isLenRow: Boolean) extends Serializable {

  def this() = this(new Array[Long](8), new Array[Int](8), new Array[Byte](8),
    new Array[Array[Int]](8), 0, true, false)

  def add(doc: Long, tf: Int, norm: Byte, positions: Array[Int] = null): Unit = {
    if (size == docs.length) grow(size * 2)
    if (sorted && size > 0 && docs(size - 1) > doc) sorted = false
    docs(size) = doc; tfs(size) = tf; norms(size) = norm; poss(size) = positions
    size += 1
  }

  private def grow(cap: Int): Unit = {
    docs = java.util.Arrays.copyOf(docs, cap)
    tfs = java.util.Arrays.copyOf(tfs, cap)
    norms = java.util.Arrays.copyOf(norms, cap)
    poss = java.util.Arrays.copyOf(poss, cap)
  }

  def absorb(o: PostingsBuf): PostingsBuf = {
    if (o.size > 0) {
      if (size + o.size > docs.length) grow(math.max(size + o.size, size * 2))
      System.arraycopy(o.docs, 0, docs, size, o.size)
      System.arraycopy(o.tfs, 0, tfs, size, o.size)
      System.arraycopy(o.norms, 0, norms, size, o.size)
      System.arraycopy(o.poss, 0, poss, size, o.size)
      if (size > 0 && (!o.sorted || docs(size) < docs(size - 1))) sorted = false
      else if (!o.sorted) sorted = false
      size += o.size
    }
    this
  }

  /** Sort by docId if out-of-order partials were merged (argsort, stable). */
  def ensureSorted(): Unit = {
    if (!sorted) {
      val idx = Array.range(0, size).sortBy(docs(_))
      val d = new Array[Long](size); val t = new Array[Int](size)
      val n = new Array[Byte](size); val p = new Array[Array[Int]](size)
      var i = 0
      while (i < size) {
        val j = idx(i); d(i) = docs(j); t(i) = tfs(j); n(i) = norms(j); p(i) = poss(j)
        i += 1
      }
      docs = d; tfs = t; norms = n; poss = p; sorted = true
    }
  }

  /** Per-entry positions trimmed to size; null if NO entry carries any. */
  def positionsOrNull: Array[Array[Int]] = {
    var any = false
    var i = 0
    while (i < size && !any) { if (poss(i) != null) any = true; i += 1 }
    if (!any) null
    else Array.tabulate(size)(k => if (poss(k) != null) poss(k) else Array.empty[Int])
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
        PostingsCodec.encode(docs, tfs, norms, b.positionsOrNull), null)
  }

  override def bufferEncoder: Encoder[PostingsBuf] = Encoders.kryo[PostingsBuf]
  override def outputEncoder: Encoder[PostingRow] = Encoders.product[PostingRow]
}

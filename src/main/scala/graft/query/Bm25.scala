package graft.query

import graft.codec.SmallFloat

/** BM25 scoring math, shared verbatim by the block-max WAND engine and the
  * brute-force DataFrame oracle so the two agree bit-for-bit.
  *
  * Formula and defaults per the reference
  * (`solr/core/src/java/org/apache/solr/search/similarities/BM25SimilarityFactory.java:47-50`,
  * default similarity since 8.0 — `SchemaSimilarityFactory.java:38,104-106`;
  * SURVEY.md §4.2): k1=1.2, b=0.75,
  *   idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))       N = docCount
  *   score(t,d)  = idf · tf / (tf + k1·(1 − b + b·dl/avgdl))
  *   avgdl       = sumTotalTermFreq / docCount  (float division)
  * with dl the SmallFloat-quantized document length and the doc score a
  * float32 sum over query terms in query order (accumulation order fixed
  * for bit-exactness).
  */
final case class Bm25(k1: Float = 1.2f, b: Float = 0.75f) extends Serializable {

  def idf(docCount: Long, docFreq: Long): Float =
    math.log(1.0 + (docCount - docFreq + 0.5) / (docFreq + 0.5)).toFloat

  def avgdl(sumTotalTermFreq: Long, docCount: Long): Float =
    (sumTotalTermFreq / docCount.toDouble).toFloat

  /** Per-(term,doc) partial score with quantized length norm. */
  def score(tf: Int, normByte: Byte, idf: Float, avgdl: Float): Float = {
    val dl = SmallFloat.byte4ToInt(normByte).toFloat
    idf * (tf / (tf + k1 * (1f - b + b * dl / avgdl)))
  }

  /** 256-entry norm→(k1·(1−b+b·dl/avgdl)) cache, one per query term set
    * (the reference's per-similarity norm cache; dl takes only 256 values). */
  def normCache(avgdl: Float): Array[Float] =
    Array.tabulate(256) { i =>
      val dl = SmallFloat.lengthTable(i).toFloat
      k1 * (1f - b + b * dl / avgdl)
    }

  /** Partial score via the cache: idf · tf / (tf + cache[norm]). */
  def scoreCached(tf: Int, normByte: Byte, idf: Float, cache: Array[Float]): Float =
    idf * (tf / (tf + cache(java.lang.Byte.toUnsignedInt(normByte))))

  /** Upper bound of any member score of a block: monotone increasing in tf,
    * decreasing in dl, so (max_tf, min_norm) bounds every (tf_i, dl_i). */
  def blockMaxScore(maxTf: Int, minNorm: Byte, idf: Float, cache: Array[Float]): Float =
    scoreCached(maxTf, minNorm, idf, cache)

  /** Accumulate per-term partials in FIXED (query) order, float32 adds. */
  def sum(partials: Array[Float]): Float = {
    var acc = 0f
    var i = 0
    while (i < partials.length) { acc += partials(i); i += 1 }
    acc
  }
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** t-digest quantile sketch — the ALGORITHM CLASS of the reference's
  * percentile aggregation (`solr/core/src/java/org/apache/solr/search/facet/
  * PercentileAgg.java:19,138-155` builds an `AVLTreeDigest(100)` and merges
  * per-shard digests). Implemented from scratch from the published paper
  * (Dunning & Ertl, "Computing Extremely Accurate Quantiles Using
  * t-Digests", arXiv:1902.04023) — the MergingDigest variant (§2.2 there):
  * points buffer up, and a compress pass sorts centroids by mean and merges
  * neighbours while the k-scale size bound allows, so centroid resolution
  * is finest at the distribution tails. Compression delta = 100, matching
  * the reference's default.
  *
  * Digests are MERGEABLE (centroid lists concatenate and re-compress),
  * which is exactly the distributed shape Spark needs: per-partition
  * partial digests, one merge at the final aggregate — same
  * partial+refine-free topology as the reference's per-shard
  * digest merge. Buffers serialize through the product encoder as plain
  * double arrays (no kryo, no opaque binary).
  *
  * Like every t-digest (and the reference's), the estimate depends mildly
  * on input order/partitioning; accuracy is gated by rank-window tests in
  * OpsSpec, not value-hash oracles.
  */
final case class TDigestBuf(
    means: Array[Double],    // merged centroids, ascending by mean
    weights: Array[Double],  // parallel to means
    bufMeans: Array[Double], // unmerged points
    bufWeights: Array[Double],
    bufLen: Int)

object TDigest {

  val Delta = 100.0
  val BufCap = 512

  def empty: TDigestBuf =
    TDigestBuf(Array.emptyDoubleArray, Array.emptyDoubleArray,
      new Array[Double](BufCap), new Array[Double](BufCap), 0)

  /** k1 scale function of the paper: k(q) = δ/(2π)·asin(2q−1). Centroid
    * capacity shrinks toward q=0/1 — tail accuracy. */
  private def kScale(q: Double): Double =
    Delta / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

  private def kInverse(k: Double): Double =
    (math.sin(k * 2 * math.Pi / Delta) + 1) / 2

  def add(b: TDigestBuf, x: Double): TDigestBuf = {
    val bb = if (b.bufLen == b.bufMeans.length) compress(b) else b
    bb.bufMeans(bb.bufLen) = x
    bb.bufWeights(bb.bufLen) = 1.0
    bb.copy(bufLen = bb.bufLen + 1)
  }

  def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf = {
    val ca = compress(a)
    val cb = compress(b)
    // concatenate centroid lists into a's buffer domain and re-compress
    val n = ca.means.length + cb.means.length
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(ca.means, 0, ms, 0, ca.means.length)
    System.arraycopy(cb.means, 0, ms, ca.means.length, cb.means.length)
    System.arraycopy(ca.weights, 0, ws, 0, ca.weights.length)
    System.arraycopy(cb.weights, 0, ws, ca.weights.length, cb.weights.length)
    compress(TDigestBuf(Array.emptyDoubleArray, Array.emptyDoubleArray, ms, ws, n))
  }

  /** Merge the point buffer into the centroid list (paper §2.2: sort all
    * (mean, weight) pairs, then one pass accumulating while the cumulative
    * quantile stays under the k-scale limit). */
  def compress(b: TDigestBuf): TDigestBuf = {
    if (b.bufLen == 0) {
      // always hand back full-capacity point buffers: a digest built by
      // merge() carries the concatenated centroid list as its buffer, and
      // an empty merge would otherwise return zero-capacity arrays that a
      // later add() writes past
      return if (b.bufMeans.length == BufCap) b
        else b.copy(bufMeans = new Array[Double](BufCap),
          bufWeights = new Array[Double](BufCap))
    }
    val n = b.means.length + b.bufLen
    val pairs = new Array[(Double, Double)](n)
    var i = 0
    while (i < b.means.length) { pairs(i) = (b.means(i), b.weights(i)); i += 1 }
    var j = 0
    while (j < b.bufLen) { pairs(i + j) = (b.bufMeans(j), b.bufWeights(j)); j += 1 }
    java.util.Arrays.sort(pairs, Ordering.by((p: (Double, Double)) => p._1))
    var total = 0.0
    pairs.foreach(total += _._2)
    val outM = Array.newBuilder[Double]
    val outW = Array.newBuilder[Double]
    var accM = pairs(0)._1 * pairs(0)._2
    var accW = pairs(0)._2
    var cumBefore = 0.0 // weight strictly before the accumulating centroid
    var qLimit = kInverse(kScale(0.0) + 1.0)
    i = 1
    while (i < n) {
      val (m, w) = pairs(i)
      if ((cumBefore + accW + w) / total <= qLimit) {
        accM += m * w
        accW += w
      } else {
        outM += accM / accW
        outW += accW
        cumBefore += accW
        qLimit = kInverse(kScale(cumBefore / total) + 1.0)
        accM = m * w
        accW = w
      }
      i += 1
    }
    outM += accM / accW
    outW += accW
    TDigestBuf(outM.result(), outW.result(),
      new Array[Double](BufCap), new Array[Double](BufCap), 0)
  }

  /** Quantile estimate: linear interpolation between adjacent centroid
    * means, each centroid's mass centered at its mean (paper §2.9). */
  def quantile(b0: TDigestBuf, q: Double): Double = {
    val b = compress(b0)
    val n = b.means.length
    if (n == 0) return Double.NaN
    if (n == 1) return b.means(0)
    var total = 0.0
    b.weights.foreach(total += _)
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < n) {
      val center = cum + b.weights(i) / 2
      if (target < center) {
        if (i == 0) return b.means(0)
        val prevCenter = cum - b.weights(i - 1) / 2
        val frac = (target - prevCenter) / (center - prevCenter)
        return b.means(i - 1) + frac * (b.means(i) - b.means(i - 1))
      }
      cum += b.weights(i)
      i += 1
    }
    b.means(n - 1)
  }
}

/** Typed `Aggregator` exposing the digest as a UDAF column function — the
  * §2.9 extension-surface path (same registration shape a library user
  * would write). One instance per requested quantile. */
class TDigestPercentile(q: Double) extends Aggregator[Double, TDigestBuf, Double] {
  override def zero: TDigestBuf = TDigest.empty
  override def reduce(b: TDigestBuf, x: Double): TDigestBuf = TDigest.add(b, x)
  override def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf = TDigest.merge(a, b)
  override def finish(b: TDigestBuf): Double = TDigest.quantile(b, q)
  override def bufferEncoder: Encoder[TDigestBuf] = Encoders.product[TDigestBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

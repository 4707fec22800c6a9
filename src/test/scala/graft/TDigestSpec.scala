package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TDigest, TDigestBuf}

/** Unit laws of the t-digest itself (no Spark): accuracy on known
  * distributions, mergeability, and the empty/degenerate edges the
  * Aggregator lifecycle can produce. */
class TDigestSpec extends AnyFunSuite {

  private def digestOf(xs: Seq[Double]): TDigestBuf =
    xs.foldLeft(TDigest.empty)(TDigest.add)

  test("quantiles of uniform 1..10000 land within 1% rank error") {
    val xs = (1 to 10000).map(_.toDouble)
    // adversarial order: interleave from both ends
    val shuffled = xs.indices.map(i => if (i % 2 == 0) xs(i / 2) else xs(xs.length - 1 - i / 2))
    val d = digestOf(shuffled)
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = TDigest.quantile(d, q)
      val exact = q * 10000
      assert(math.abs(est - exact) <= 100, s"q=$q est=$est exact=$exact")
    }
  }

  test("merge(a, b) agrees with a single digest over the union") {
    val a = digestOf((1 to 5000).map(_.toDouble))
    val b = digestOf((5001 to 10000).map(_.toDouble))
    val m = TDigest.merge(a, b)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = TDigest.quantile(m, q)
      assert(math.abs(est - q * 10000) <= 150, s"q=$q est=$est")
    }
  }

  test("tail quantiles are sharper than the middle (k-scale property)") {
    val d = digestOf((1 to 100000).map(_.toDouble))
    val p001 = TDigest.quantile(d, 0.001)
    assert(math.abs(p001 - 100.0) <= 30, s"p0.1%=$p001 (exact 100)")
    val p999 = TDigest.quantile(d, 0.999)
    assert(math.abs(p999 - 99900.0) <= 30, s"p99.9%=$p999 (exact 99900)")
  }

  test("empty and degenerate digests: NaN on empty, add after empty merge works") {
    assert(TDigest.quantile(TDigest.empty, 0.5).isNaN)
    // merge(empty, empty) must hand back a digest that still accepts points
    val m = TDigest.merge(TDigest.empty, TDigest.empty)
    val d = (1 to 100).map(_.toDouble).foldLeft(m)(TDigest.add)
    assert(math.abs(TDigest.quantile(d, 0.5) - 50.5) <= 2)
    // single point
    assert(TDigest.quantile(TDigest.add(TDigest.empty, 7.0), 0.9) == 7.0)
  }

  test("centroid count stays bounded by the delta compression") {
    val d = TDigest.compress(digestOf((1 to 50000).map(i => (i % 997).toDouble)))
    // MergingDigest bound is ~2*delta centroids
    assert(d.means.length <= 2 * TDigest.Delta.toInt + 10,
      s"${d.means.length} centroids for delta=${TDigest.Delta}")
  }
}

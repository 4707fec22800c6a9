package graft.index

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic transcript corpus (FIXTURES.md §1): seeded,
  * generated distributively (one conversation per input row of
  * `spark.range`, every value derived from conv_id alone, so the corpus is
  * identical under any partitioning / parallelism — required by the
  * control-vs-distributed tests and the two-parallelism scaling bench).
  *
  * Skew by design: Zipfian term draw (hot-term skew), a mixture of
  * conversation lengths with a 1% long tail (long-conversation skew), hot
  * `role`/`tool` values, mixed-case forms, punctuation, unicode, and ~0.1%
  * empty texts (analyzer edge cases).
  */
object TranscriptGen {

  private val zipfS = 1.1

  /** Fixed vocabulary: common words, mixed-case forms, unicode, ids. */
  private lazy val vocab: Array[String] = {
    val common = Array(
      "the", "a", "to", "of", "and", "in", "is", "it", "you", "that",
      "run", "test", "build", "query", "index", "spark", "Spark", "scala",
      "data", "model", "token", "merge", "shuffle", "partition", "join",
      "error", "failed", "retry", "timeout", "commit", "branch", "file",
      "read", "write", "plan", "agent", "tool", "call", "result", "score",
      "search", "rank", "term", "block", "segment", "list", "cache", "SQL",
      "json", "parquet", "stream", "batch", "turn", "user", "code", "fix",
      "héllo", "naïve", "東京", "数据", "café", "don't", "it's", "v2.0",
      "x86_64", "U.S.A", "3.14", "1024")
    val tail = Array.tabulate(4936)(i => f"w${i}%04d")
    common ++ tail
  }

  /** Zipf cumulative weights for inverse-CDF sampling. */
  private lazy val zipfCdf: Array[Double] = {
    val w = Array.tabulate(vocab.length)(i => 1.0 / math.pow(i + 1.0, zipfS))
    val total = w.sum
    val cdf = new Array[Double](w.length)
    var acc = 0.0
    var i = 0
    while (i < w.length) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf(w.length - 1) = 1.0
    cdf
  }

  private val roles = Array("user", "assistant", "user", "assistant", "system", "tool")
  private val tools = Array("bash", "read", "write", "edit", "grep", "glob",
    "search", "fetch", "run_tests", "lint", "deploy", "plan", "diff",
    "commit", "browse", "eval", "notebook", "sql", "profile", "trace")

  /** splitmix64 — deterministic, allocation-free PRNG. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def turnsOf(seed: Long, conv: Long): Int = {
    val r = mix(seed ^ conv)
    val bucket = Math.floorMod(r, 100L)
    val r2 = Math.floorMod(mix(r), 1000000L)
    if (bucket < 90) 1 + (r2 % 20).toInt // 90%: short
    else if (bucket < 99) 21 + (r2 % 180).toInt // 9%: medium
    else 201 + (r2 % 4800).toInt // 1%: long tail
  }

  /** `slices` controls the number of generator partitions — written to
    * parquet these become that many range-disjoint, internally-sorted files
    * (spark.range partitions are contiguous conv ranges), the layout the
    * index build's sorted-input fast path verifies and exploits. Every
    * value is derived from conv_id alone, so the corpus content is
    * identical at any slice count. */
  def generate(spark: SparkSession, numConvs: Long, seed: Long = 42L,
      slices: Option[Int] = None): Dataset[Turn] = {
    import spark.implicits._
    val voc = vocab
    val cdf = zipfCdf
    val rolesL = roles
    val toolsL = tools
    val rng = slices match {
      case Some(n) => spark.range(0L, numConvs, 1L, n)
      case None => spark.range(numConvs)
    }
    val s = seed
    rng.as[Long].flatMap(conv => turnsFor(conv, s))
  }

  /** All turns of one conversation — a pure function of (conv, seed), usable
    * without a SparkSession (analyzer tests sample corpus text through it). */
  def turnsFor(conv: Long, seed: Long = 42L): Iterator[Turn] = {
    val voc = vocab
    val cdf = zipfCdf
    val convId = f"conv-${conv}%06d"
    val nTurns = turnsOf(seed, conv)
    val baseTs = 1700000000000L + conv * 3600000L
    (0 until nTurns).iterator.map { t =>
      var r = mix(seed ^ (conv * 1000003L) ^ (t * 7919L))
      def nextDouble(): Double = {
        r = mix(r)
        (r >>> 11) * 1.1102230246251565e-16 // 2^-53
      }
      val role = roles(Math.floorMod(mix(r ^ 0x51L), roles.length.toLong).toInt)
      val tool =
        if (role == "tool" || nextDouble() < 0.2)
          tools(Math.floorMod(mix(r ^ 0x52L), tools.length.toLong).toInt)
        else null
      val text =
        if (nextDouble() < 0.001) "" // empty-text edge case
        else {
          val len = 3 + (nextDouble() * nextDouble() * 77).toInt
          val sb = new StringBuilder
          var i = 0
          while (i < len) {
            val u = nextDouble()
            // inverse-CDF binary search over the Zipf table
            var lo = 0; var hi = cdf.length - 1
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (cdf(mid) < u) lo = mid + 1 else hi = mid
            }
            if (i > 0) sb.append(if (nextDouble() < 0.05) ", " else " ")
            sb.append(voc(lo))
            i += 1
          }
          if (nextDouble() < 0.1) sb.append('.')
          sb.toString
        }
      Turn(convId, t, role, text, tool, new Timestamp(baseTs + t * 1000L))
    }
  }
}

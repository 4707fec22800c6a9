package graft.ops

import org.apache.spark.sql.SparkSession
import graft.query.Searcher

/** Query-latency probe over an existing index — BOTH the dev tool and the
  * bench's fresh-JVM child (Bench spawns it pinned via taskset with a fixed
  * pre-touched heap, the same discipline as the scaling phase's
  * ScalingProbe children; VERDICT r2 task #1).
  *
  * Emits one machine-readable line `QPROBE_JSON {...}` carrying EVERY rep's
  * wall ms and the JVM GC ms attributable to that rep, so a tail outlier in
  * the parent's aggregate is attributable (GC pause vs host storm vs cache
  * eviction) instead of a mystery number.
  *
  * Usage: runMain graft.ops.QueryProbe <indexDir> [reps] */
object QueryProbe {

  val QuerySet: Seq[String] = Seq(
    "the data",                       // hot terms (WAND stress)
    "error failed retry",             // mid-frequency disjunction
    "spark shuffle partition merge",  // 4-term disjunction
    "+commit +branch",                // conjunction
    "timeout -error retry",           // exclusion
    "role:user test build",           // filtered
    "w0042 w1234",                    // rare terms
    "query index score rank",
    "\"error retry\" timeout",        // exact phrase (positional path)
    "par* data")                      // prefix wildcard (expansion path)

  private def gcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  private def jsonEsc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def main(args: Array[String]): Unit = {
    val idx = args.headOption.getOrElse("/dev/shm/graft-bench/qidx-200000")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val localDir = sys.env.getOrElse("GRAFT_LOCAL_DIR",
      System.getProperty("java.io.tmpdir"))
    val s = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val searcher = new Searcher(s, idx)
    // two warmup passes: first materializes the postings cache, second lets
    // whole-stage codegen JIT the scoring stage
    QuerySet.foreach(q => searcher.topKHits(q, 10).collect())
    QuerySet.foreach(q => searcher.topKHits(q, 10).collect())
    // rep-major order (the bench's original interleaving): a transient
    // slowdown smears across queries instead of poisoning one query's reps
    val ms = QuerySet.map(_ => Array.fill(reps)(0.0)).toArray
    val gc = QuerySet.map(_ => Array.fill(reps)(0L)).toArray
    for (r <- 0 until reps; (q, qi) <- QuerySet.zipWithIndex) {
      val g0 = gcMs()
      val t0 = System.nanoTime()
      searcher.topKHits(q, 10).collect()
      ms(qi)(r) = (System.nanoTime() - t0) / 1e6
      gc(qi)(r) = gcMs() - g0
    }
    QuerySet.zipWithIndex.foreach { case (q, qi) =>
      println(f"[qprobe] ${q.replace(' ', '_')}%-32s min=${ms(qi).min}%8.1f ms  all=${ms(qi).map(t => f"$t%.0f").mkString(",")}")
    }
    val perQuery = QuerySet.zipWithIndex.map { case (q, qi) =>
      s""""${jsonEsc(q)}":{"ms":[${ms(qi).map(v => f"$v%.1f").mkString(",")}],"gc_ms":[${gc(qi).mkString(",")}]}"""
    }.mkString(",")
    println(s"""QPROBE_JSON {"reps":$reps,"per_query":{$perQuery}}""")
    searcher.close()
    s.stop()
  }
}

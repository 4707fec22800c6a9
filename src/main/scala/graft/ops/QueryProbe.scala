package graft.ops

import org.apache.spark.sql.SparkSession
import graft.query.Searcher

/** Dev utility: per-query latency over an existing index.
  * Usage: runMain graft.ops.QueryProbe <indexDir> [reps] */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val idx = args.headOption.getOrElse("/dev/shm/graft-bench/qidx-200000")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val s = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val searcher = new Searcher(s, idx)
    val queries = Seq(
      "the data", "error failed retry", "spark shuffle partition merge",
      "+commit +branch", "timeout -error retry", "role:user test build",
      "w0042 w1234", "query index score rank",
      "\"error retry\" timeout", "par* data")
    queries.foreach(q => searcher.topKHits(q, 10).collect())
    queries.foreach { q =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        searcher.topKHits(q, 10).collect()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"[qprobe] ${q.replace(' ', '_')}%-32s min=${times.min}%8.1f ms  all=${times.map(t => f"$t%.0f").mkString(",")}")
    }
    searcher.close()
    s.stop()
  }
}

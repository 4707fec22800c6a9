package graft

import org.apache.spark.sql.SparkSession
import graft.index.{IndexBuilder, TranscriptGen}
import graft.query.Searcher

/** Round benchmark (driver contract: ONE JSON line on stdout).
  *
  * Measures, per BASELINE.md §2 (authoritative targets from BASELINE.json):
  *   - indexing throughput (turns/sec) over the deterministic synthetic
  *     transcript corpus, at local[8] AND local[32] on identical input →
  *     scaling efficiency eff = (thr32 / thr8) / 4 (the sandbox rendering
  *     of the N→4N-executor criterion; no real cluster here);
  *   - top-k BM25 query latency (p50/p95 ms over a mixed query set);
  *   - wall seconds for every registry operator at $SPARK_GRAFT_SF_DIR.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def sec(ns: Long): Double = ns / 1e9

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val numConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "20000").toLong
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALING", "1") == "1"
    val work = s"${System.getProperty("java.io.tmpdir")}/graft-bench"
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val t00 = System.nanoTime()

    // ---- corpus setup (not timed as throughput): deterministic transcripts
    val turnsPath = s"$work/turns-$numConvs"
    var nTurns = 0L
    locally {
      val s = session(32)
      val exists = new java.io.File(s"$turnsPath/_SUCCESS").exists()
      if (!exists)
        TranscriptGen.generate(s, numConvs).toDF()
          .write.mode("overwrite").parquet(turnsPath)
      nTurns = s.read.parquet(turnsPath).count()
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    // ---- indexing throughput at two parallelism levels ------------------
    def buildAt(cores: Int): Double = {
      val s = session(cores)
      val dir = s"$work/idx-$cores"
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(dir), true)
      val turns = s.read.parquet(turnsPath)
      val t0 = System.nanoTime()
      IndexBuilder.build(s, turns, dir, IndexBuilder.Config(numSegments = 64))
      val dt = sec(System.nanoTime() - t0)
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      dt
    }

    if (doScaling) {
      val t8 = buildAt(8)
      results("index_build_8c_sec") = t8
      results("index_turns_per_sec_8c") = nTurns / t8
      val t32 = buildAt(32)
      results("index_build_32c_sec") = t32
      results("index_turns_per_sec_32c") = nTurns / t32
      results("scaling_efficiency_8_to_32") = (t8 / t32) / 4.0
      results("index_turns") = nTurns.toDouble
    }

    // ---- query latency over the built index -----------------------------
    val s = session(32)
    if (doScaling) {
      val searcher = new Searcher(s, s"$work/idx-32")
      val queries = Seq(
        "the data",                       // hot terms (WAND stress)
        "error failed retry",             // mid-frequency disjunction
        "spark shuffle partition merge",  // 4-term disjunction
        "+commit +branch",                // conjunction
        "timeout -error retry",           // exclusion
        "role:user test build",           // filtered
        "w0042 w1234",                    // rare terms
        "query index score rank")
      val lat = scala.collection.mutable.ArrayBuffer.empty[Double]
      // warmup
      queries.foreach(q => searcher.topKHits(q, 10).collect())
      for (_ <- 1 to 5; q <- queries) {
        val t0 = System.nanoTime()
        searcher.topKHits(q, 10).collect()
        lat += sec(System.nanoTime() - t0) * 1000
      }
      val sorted = lat.sorted
      results("query_p50_ms") = sorted(sorted.length / 2)
      results("query_p95_ms") = sorted(math.min(sorted.length - 1, (sorted.length * 0.95).toInt))
      results("query_mean_ms") = sorted.sum / sorted.length
    }

    // ---- registry operator sweep at the driver's SF ---------------------
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(s, sfDir).count() } catch { case _: Throwable => }
      results(name) = sec(System.nanoTime() - t0)
    }
    s.stop()

    val total = sec(System.nanoTime() - t00)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }.mkString("{", ",", "}")
    println(s"""{"metric":"bench_total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}

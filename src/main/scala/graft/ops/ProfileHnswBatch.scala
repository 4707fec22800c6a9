package graft.ops

import org.apache.spark.sql.SparkSession

/** Dev utility: HNSW batch-serving amortization A/B (VERDICT r4 task #7).
  * Times Q independent hnswTopK calls (each builds the per-partition
  * graphs from scratch) against ONE hnswTopKBatch(Q) call (one graph
  * build serving all Q queries) on the same corpus, and prints the
  * amortization factor. Recorded in BASELINE.md.
  */
object ProfileHnswBatch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val q = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[hnsw-ab] $name%-28s $dt%7.2fs  $n rows")
      dt
    }
    // warmup (JIT + codegen caches) — untimed
    VectorOps.hnswTopK(spark, dir, 10, 8, 64, 48).count()
    val tSingle = time(s"$q x single (rebuilds graph)") {
      var rows = 0L
      for (_ <- 1 to q)
        rows += VectorOps.hnswTopK(spark, dir, 10, 8, 64, 48).count()
      rows
    }
    val tBatch = time(s"1 x batch($q) (one build)") {
      VectorOps.hnswTopKBatch(spark, dir, q, 10, 8, 64, 48).count()
    }
    println(f"[hnsw-ab] amortization: ${tSingle / tBatch}%.1fx " +
      f"($q queries; single=${tSingle / q}%.2fs/query, batch=${tBatch / q}%.3fs/query)")
    spark.stop()
  }
}

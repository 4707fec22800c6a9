package graft

import org.apache.spark.sql.SparkSession
import graft.index.IndexBuilder
import graft.query.Searcher

/** spark-submit entry points (north rule: index build + query runnable on
  * a cluster via spark-submit; in this sandbox the same mains run under
  * `sbt runMain` in local mode — master/partitions come from the submit
  * conf, not hardcoded here).
  *
  *   spark-submit --class graft.Main app.jar build <transcriptsParquet> <indexDir> [numSegments] [batches]
  *   spark-submit --class graft.Main app.jar query <indexDir> <k> <query...>
  *   spark-submit --class graft.Main app.jar merge <indexDir> <outDir> <targetSegments>
  *   spark-submit --class graft.Main app.jar compact <indexDir> <outDir> <maxSegments>
  *   spark-submit --class graft.Main app.jar metrics <indexDir>
  *
  * `metrics` prints the per-segment build metrics table with each segment's
  * share of docs/tokens/postings — the skew-inspection surface (an outlier
  * n_postings or sum_dl segment is the salting/repartition trigger).
  *
  * `build` is resumable: re-submitting after a failure skips completed
  * lineage steps (SURVEY.md §2.8).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder()
      .appName("graft-" + args.headOption.getOrElse("help"))
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects spark.master; fall back to local[*] under sbt
    if (!sys.props.contains("spark.master")) b.master("local[*]")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toList match {
      case "build" :: src :: dir :: rest =>
        val segs = rest.headOption.map(_.toInt)
          .getOrElse(spark.sparkContext.defaultParallelism * 2)
        val batches = rest.drop(1).headOption.map(_.toInt).getOrElse(1)
        val r = IndexBuilder.build(spark, spark.read.parquet(src), dir,
          IndexBuilder.Config(numSegments = segs, batches = batches))
        println(s"[graft] indexed ${r.docCount} docs, ${r.numSegments} segments," +
          s" resumed past ${r.resumedSteps} completed steps")
      case "query" :: dir :: k :: qs if qs.nonEmpty =>
        val s = new Searcher(spark, dir)
        s.search(qs.mkString(" "), k.toInt).show(truncate = false)
      case "merge" :: dir :: out :: target :: Nil =>
        graft.index.IndexMerger.mergeSegments(spark, dir, out, target.toInt)
        println(s"[graft] merged $dir -> $out ($target segments)")
      case "compact" :: dir :: out :: maxSegs :: Nil =>
        graft.index.MergePolicy.compact(spark, dir, out, maxSegs.toInt) match {
          case Some(n) => println(s"[graft] compacted $dir -> $out ($n segments)")
          case None =>
            // no-op: NOTHING was written to out — don't name it as usable
            println(s"[graft] $dir already within budget (<= $maxSegs " +
              s"segments); nothing written, keep querying $dir")
        }
      case "metrics" :: dir :: Nil =>
        import org.apache.spark.sql.functions._
        val m = spark.read.parquet(s"$dir/metrics")
        // total via a scalar first (metrics is segment-count-sized), not a
        // global Window — keeps the zero-unpartitioned-Window invariant
        // coalesce: sum over a zero-row metrics table is NULL, and getLong
        // on it would NPE before the max(1) guard ever ran
        val total = math.max(1L,
          m.agg(coalesce(sum(col("n_postings")), lit(0L))).head().getLong(0))
        m.select(col("segment_id"), col("n_docs"), col("sum_dl"),
            col("n_terms"), col("n_postings"),
            round(col("n_postings") * lit(100.0) / lit(total), 2).as("postings_pct"))
          .orderBy(col("segment_id"))
          .show(1000, truncate = false)
      case _ =>
        System.err.println("usage: build <src> <indexDir> [segments] [batches] | " +
          "query <indexDir> <k> <terms...> | merge <indexDir> <outDir> <segments> | " +
          "compact <indexDir> <outDir> <maxSegments> | metrics <indexDir>")
        sys.exit(2)
    }
    spark.stop()
  }
}

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
      case _ =>
        System.err.println("usage: build <src> <indexDir> [segments] [batches] | " +
          "query <indexDir> <k> <terms...> | merge <indexDir> <outDir> <segments>")
        sys.exit(2)
    }
    spark.stop()
  }
}

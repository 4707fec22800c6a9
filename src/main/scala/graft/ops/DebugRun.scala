package graft.ops

import org.apache.spark.sql.SparkSession

/** Dev utility: run one named query (or all) with wall-clock timing.
  * Usage: runMain graft.ops.DebugRun <sfDir> [name ...]  */
object DebugRun {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ops = graft.SparkEntry.allOps.filter(o => names.isEmpty || names.contains(o.name))
    val reps = sys.env.getOrElse("SPARK_GRAFT_DEBUG_REPS", "1").toInt
    for (r <- 1 to reps) ops.foreach { op =>
      val t0 = System.nanoTime()
      val n = op.run(spark, dir).count()
      println(f"[debug] ${op.name}%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  $n rows (rep $r)")
    }
    spark.stop()
  }
}

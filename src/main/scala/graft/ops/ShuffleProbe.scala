package graft.ops

import org.apache.spark.sql.functions._

/** Dev utility: pure-Spark shuffle cost at a given parallelism — reads the
  * transcript parquet, hash-repartitions it (same shape as IndexBuilder's
  * pass B, minus the segment UDF and sort), and counts. Isolates the
  * sandbox/Spark shuffle cost from the graft build logic when chasing
  * scaling anomalies. Args: <turnsPath> <spec> [reduceParts]. */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val turnsPath = args(0)
    val spec = args(1)
    val parts = if (args.length > 2) args(2).toInt else 256
    val (s, _) = ScalingProbe.session(spec)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong()
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) cpuNs.addAndGet(te.taskMetrics.executorCpuTime)
    })
    val turns = s.read.parquet(turnsPath)
    turns.count() // warm page cache + codegen
    val t0 = System.nanoTime()
    val c0 = cpuNs.get()
    // write parquet so column pruning can't empty the shuffled rows — the
    // faithful rendering of the index build's pass-B shape
    val out = s"${sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/dev/shm/graft-probe")}/shufout"
    sys.env.getOrElse("GRAFT_SHUF_MODE", "shuffle") match {
      case "writeonly" => turns.write.mode("overwrite").parquet(out)
      case "shufonly" =>
        // toRdd keeps every column live (no pruning) but skips the sink:
        // isolates exchange write+read cost from parquet-write cost
        turns.repartition(parts, col("conv_id")).queryExecution.toRdd.count()
      case _ => turns.repartition(parts, col("conv_id"))
        .write.mode("overwrite").parquet(out)
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[shuffle] spec=$spec wall=$dt%.2fs cpu=${(cpuNs.get() - c0) / 1e9}%.2fs")
    org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(out), true)
    s.stop()
  }
}

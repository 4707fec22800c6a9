package graft.ops

import org.apache.spark.sql.SparkSession
import graft.index.IndexBuilder

/** Dev utility: index-build wall time per parallelism spec, in order, fresh
  * SparkSession each. Spec forms:
  *   "8"     -> local[8]
  *   "lc2x4" -> local-cluster[2,4,4096] (2 executor JVMs x 4 cores — the
  *              faithful N-executor shape; requires SPARK_HOME=/opt/spark)
  */
object ScalingProbe {

  def session(spec: String): (SparkSession, Int) = {
    val lc = "lc(\\d+)x(\\d+)".r
    val (master, slots) = spec match {
      case lc(n, c) =>
        // worker memory must cover the executor request below (768/core +
        // headroom) — a hardcoded 4096 deadlocks any c >= 6 spec: the
        // standalone Master simply never schedules an executor it can't fit
        val workerMb = 768 * c.toInt + 512
        (s"local-cluster[$n,$c,$workerMb]", n.toInt * c.toInt)
      case n => (s"local[$n]", n.toInt)
    }
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", slots)
      .config("spark.ui.enabled", "false")
      // Bypass-merge shuffle writer for the build's wide-and-short
      // exchanges: the default Tungsten ShuffleExternalSorter copies every
      // record into TaskMemoryManager pages, and that large-allocation
      // path serializes across slots (measured: the corpus repartition
      // burns 3.2x more CPU at 16 slots than at 4 under the sorter, and
      // is CPU-flat under the bypass writer — 176s vs 59s for the same
      // 2.3GB exchange). The bypass writer streams records straight to
      // per-reduce-partition files; with 4*numSegments=256 reduce
      // partitions x 64KB buffers that is ~40MB per task slot.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1024")
      .config("spark.shuffle.file.buffer", "64k")
      // zstd everywhere parquet is written in this session (the index
      // store already pins zstd per-write): snappy's write path burns
      // >2x CPU under 16-way write concurrency on this host
      .config("spark.sql.parquet.compression.codec", "zstd")
      // level 1 (parquet default: 3) — see Bench.session; ~11% off the
      // 16c build's total CPU for ~10% larger store files
      .config("spark.hadoop.parquet.compression.codec.zstd.level", "1")
      // syscall batching for Hadoop local-FS streams (4KB default buffer)
      // and no .crc shadow files; spark.hadoop.* so executors get it too
      .config("spark.hadoop.io.file.buffer.size", (1 << 20).toString)
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      // v2 committer: task-side renames. v1 renames every output file
      // serially on the driver — a fixed ~2-4s per job that Amdahl-caps
      // the fast side of the scaling pair (local FS renames are atomic
      // enough here; lineage rows still gate step completion)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.local.dir",
        sys.env.getOrElse("GRAFT_LOCAL_DIR", System.getProperty("java.io.tmpdir")))
    // ad-hoc conf injection for scaling experiments, e.g.
    // GRAFT_EXTRA_CONF="spark.shuffle.compress=false,spark.buffer.pageSize=4m"
    sys.env.get("GRAFT_EXTRA_CONF").foreach(_.split(',').filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    if (master.startsWith("local-cluster")) {
      // executor classpath: the parent JVM's own classpath (cwd-independent
      // — a relative "target/scala-2.13/classes" breaks when the launcher
      // runs from another directory); spark jars ride along via SPARK_HOME
      val classes = System.getProperty("java.class.path")
      val lc(_, c) = spec: @unchecked
      val execMb = 768 * c.toInt // per-core heap, matching Bench.childBuild
      // (512/core measured GC-bound in the postings stage: 118s GC / 734
      // task-s at 4x4 — each task's live PostingsBuf segment plus parquet
      // write buffers no longer average out across a big shared pool the
      // way they do in the single-JVM bench children)
      b.config("spark.executor.extraClassPath", classes)
        .config("spark.executor.memory", s"${execMb}m")
        // fixed pre-touched ParallelGC heap per executor, matching the
        // single-JVM bench children (see Bench.childBuild scaladoc).
        // GC/JIT thread pools are capped to the executor's CORE allotment:
        // each executor JVM sees the whole taskset affinity mask (17 CPUs
        // for an lc4x4 run) and would size ~13 ParallelGC threads — four
        // executors' concurrent STW collections then run ~52 GC threads
        // over 17 cores, inflating exactly the exec-shape pair's CPU. On a
        // real cluster the container's cpuset does this capping for us.
        .config("spark.executor.extraJavaOptions",
          s"-Xms${execMb}m -XX:+AlwaysPreTouch -XX:+UseParallelGC " +
            s"-XX:ParallelGCThreads=${2 * c.toInt}")
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("GRAFT_SLIM_HADOOP_CONF")) {
      // Experiment: per-write-task deserialization of the full Hadoop conf
      // (~1000 gzip-compressed strings) convoys on the JDK Inflater cleaner
      // lock at high slot counts; Hadoop getters fall back to code defaults,
      // so an (almost) empty conf should behave identically on local FS.
      val hc = s.sparkContext.hadoopConfiguration
      val keep = Set("fs.defaultFS", "fs.file.impl", "io.file.buffer.size")
      import scala.jdk.CollectionConverters._
      val keys = hc.iterator().asScala.map(_.getKey).toList
      keys.foreach(k => if (!keep(k) && !k.startsWith("parquet.")) hc.unset(k))
      println(s"[probe] slim hadoop conf: ${hc.size()} props (was ${keys.size})")
    }
    (s, slots)
  }

  def main(args: Array[String]): Unit = {
    val turnsPath = args.headOption.getOrElse(
      s"${System.getProperty("java.io.tmpdir")}/graft-bench/turns-2000")
    args.drop(1).foreach { spec =>
      val (s, _) = session(spec)
      val base = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/dev/shm/graft-probe")
      val turns = s.read.parquet(turnsPath)
      // untimed warmup build on a small slice (JIT + codegen caches)
      IndexBuilder.build(s, turns.limit(20000), s"$base/warm-$spec-${System.nanoTime()}",
        IndexBuilder.Config(numSegments = 16))
      val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
      // task CPU time per build: the host-noise-robust auxiliary metric
      // (wall is the headline; CPU time shows the compute actually done)
      val cpuNs = new java.util.concurrent.atomic.AtomicLong()
      // per-stage wall/cpu/gc/spill breakdown (GRAFT_PROBE_STAGES=1): pins
      // down WHERE a parallelism level burns extra CPU (gc pressure, spill,
      // shuffle) instead of a single opaque total
      val stageDetail = sys.env.contains("GRAFT_PROBE_STAGES")
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null) cpuNs.addAndGet(te.taskMetrics.executorCpuTime)
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          if (stageDetail && sc.stageInfo.taskMetrics != null) {
            val m = sc.stageInfo.taskMetrics
            val si = sc.stageInfo
            println(f"[stage] t=${si.completionTime.getOrElse(0L) / 1000}%d id=${si.stageId}%-4d tasks=${si.numTasks}%-4d " +
              f"wall=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%8.2fs " +
              f"taskTime=${m.executorRunTime / 1e3}%9.2fs cpu=${m.executorCpuTime / 1e9}%9.2fs " +
              f"gc=${m.jvmGCTime / 1e3}%7.2fs spill=${m.memoryBytesSpilled / 1e6}%.0fMB " +
              f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0fMB " +
              f"  ${si.name.take(60)}")
          }
      })
      // 128 segments (not 64): the postings stage runs one task per
      // docs file; at 64 segments a 16-slot run gets ~47 tasks = 2.9
      // waves with a half-empty tail (~40% idle slots), while ~128
      // segments pack evenly at every bench level. At the 100-TB target
      // the same rule holds: segments >> total cores.
      val numSegments = sys.env.getOrElse("GRAFT_PROBE_SEGMENTS", "128").toInt
      val times = (1 to reps).map { _ =>
        val dir = s"$base/idx-$spec-${System.nanoTime()}"
        val c0 = cpuNs.get()
        val t0 = System.nanoTime()
        IndexBuilder.build(s, turns, dir, IndexBuilder.Config(numSegments = numSegments))
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(dir), true)
        (dt, (cpuNs.get() - c0) / 1e9)
      }
      val best = times.minBy(_._1)
      println(f"[probe] spec=$spec%-6s min=${best._1}%.2fs cpu=${best._2}%.2fs " +
        f"all=${times.map(t => f"${t._1}%.1f").mkString(",")}")
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}

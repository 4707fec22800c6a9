package graft.index

import java.sql.Timestamp
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.codec.SmallFloat

/** Builds the inverted index over a transcript table.
  *
  * Shape (SURVEY.md §3.4 "Spark shape"): range-partition the corpus on the
  * stable key (conv_id, turn_idx) — one partition = one *segment* owning a
  * dense, contiguous docId range (the Lucene segment model,
  * `solr/core/src/java/org/apache/solr/update/SolrIndexWriter.java:57-155`).
  * Posting lists are then built **inside each segment partition** with an
  * in-memory term map flushed as compressed PostingRows — the Spark
  * rendering of Lucene's RAM-buffer indexing path (`ramBufferSizeMB`,
  * `solr/core/src/java/org/apache/solr/update/SolrIndexConfig.java:102`):
  * no shuffle ever moves raw token rows, a hot term's posting list is
  * bounded by segment size by construction (skew capped), and the only
  * shuffled data are the finished per-term stats aggregations.
  *
  * Output layout under `indexDir/`:
  *   docs/      DocRow parquet, sorted by doc_id (stored fields)
  *   postings/  PostingRow parquet; rows with term=="" are the per-segment
  *              norms sidecar (norms blob in `norms`, dl sum in `ttf`)
  *   terms/     TermStats parquet (exact global df/ttf)
  *   corpus/    single CorpusStats row
  *   lineage/   LineageRow parquet — completed steps, for resume
  *
  * Resumability (north rule): the build is decomposed into steps
  * ("docs", "batch-i", "stats"); each step is an idempotent Spark job whose
  * output commits atomically (parquet job commit) before its lineage row is
  * appended. Re-running `build` skips steps already in lineage — the
  * tlog-replay analogue (`solr/core/src/java/org/apache/solr/update/UpdateLog.java:1401-1443`).
  */
object IndexBuilder {

  case class Config(
      numSegments: Int = 32,
      batches: Int = 1,
      stopwords: Set[String] = Set.empty)

  case class BuildResult(docCount: Long, sumDl: Long, numSegments: Int, resumedSteps: Int)

  /** Case-sensitive set of finished lineage steps (empty if no index yet). */
  def completedSteps(spark: SparkSession, dir: String): Set[String] = {
    import spark.implicits._
    if (!exists(spark, s"$dir/lineage")) Set.empty
    else spark.read.parquet(s"$dir/lineage").select("step").as[String].collect().toSet
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** On-disk layout version; bump on PostingRow/Block schema changes. An
    * index without the current marker is STALE (e.g. pre-positions blocks)
    * and gets wiped + rebuilt instead of resumed — resuming across a
    * schema change would poison every reader with FIELD_NOT_FOUND.
    * v3: postings carry single-token FIELD terms (`role:<v>`, `tool:<v>`)
    * so role/tool are scored qf fields, not just filters (the copyField +
    * per-field postings role of DocumentBuilder.java:99-123). */
  val LayoutVersion = 3

  /** Index-store parquet codec. zstd, not the Spark default snappy: the
    * snappy write path collapses under write-task concurrency on this host
    * (measured: the same shuffled corpus written as parquet costs 357
    * CPU-sec at 16 slots under snappy vs 152 under zstd, with matching
    * wall; at 4 slots they tie) — and zstd also compresses the postings
    * blocks ~25% smaller, which matters when scans are page-fault-bound. */
  val Zstd = "zstd"

  def build(spark: SparkSession, turns: DataFrame, dir: String, cfg: Config = Config()): BuildResult = {
    import spark.implicits._
    val fsRoot = new org.apache.hadoop.fs.Path(dir)
    val fs = fsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$dir/layout-v$LayoutVersion")
    if (fs.exists(fsRoot) && !fs.exists(marker)) fs.delete(fsRoot, true)
    fs.mkdirs(fsRoot)
    if (!fs.exists(marker)) fs.create(marker).close()
    val done = completedSteps(spark, dir)
    var skipped = 0


    // ---- step 1: docId assignment (two-pass, no global window, no cache) -
    //
    // Explicit deterministic range partitioning: one fused SKETCH pass over
    // the (conv_id, turn_idx) key columns yields both the exact row count
    // and a deterministic bottom-k sample (the k keys with the smallest
    // murmur3 hashes — a partitioning-independent uniform sample, so cuts
    // don't depend on input layout) -> numSegments-1 cut points; segment =
    // cut-range index. Pass A aggregates EXACT per-segment counts (only
    // counts shuffle); pass B range-shuffles the corpus once on the segment
    // index, sorts within partitions, and assigns doc_id = offset(seg) +
    // local rank per segment. doc_ids are independent of the sampled cuts
    // (the sequence is the global (conv_id, turn_idx) rank for ANY
    // contiguous cut set), so builds are reproducible at any parallelism —
    // asserted by EngineSpec's control-vs-distributed suite.
    def mark(t0: Long, what: String): Long = {
      val t = System.nanoTime()
      if (sys.env.contains("GRAFT_BUILD_TIMING"))
        println(f"[graft-build] $what%-14s ${(t - t0) / 1e9}%7.2fs")
      t
    }

    if (done("docs")) skipped += 1
    else {
      val t0 = System.nanoTime()
      var tm = t0
      val src = turns.select($"conv_id", $"turn_idx", $"role", $"text", $"tool", $"ts")
      // Split the source scan fine enough that pass B's shuffle-map tasks
      // never spill: with default 128MB splits a 16-slot run holds ~430MB
      // of unsafe rows per task against a ~300MB execution-memory budget
      // and spills ~2x the corpus to spark.local.dir — on this
      // virtualized host concurrent tmpfs page allocation degenerates
      // into kernel-contended fault storms (measured: the spilling map
      // stage burns 12x more CPU at 16 slots than at 4, >90% system
      // time; with no spill the stage is linear). Target ~8 map tasks
      // per shuffle slot, clamped to [16MB, 128MB] so huge corpora don't
      // explode into millions of tasks and tiny ones keep one split.
      val prevScanSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
      val srcBytes = turns.inputFiles.headOption.map { _ =>
        turns.inputFiles.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .getFileStatus(p).getLen
        }.sum
      }.getOrElse(0L)
      if (srcBytes > 0) {
        val target = srcBytes / (8L * spark.sparkContext.defaultParallelism)
        val split = math.min(128L << 20, math.max(16L << 20, target))
        spark.conf.set("spark.sql.files.maxPartitionBytes", split.toString)
      }
      try {
      val sketchK = cfg.numSegments * 200
      val sketches: Array[PartitionSketch] =
        src.select($"conv_id", $"turn_idx").as[(String, Int)]
          .mapPartitions { it =>
            var n = 0L
            // bottom-k by hash: max-heap of size k, evict the largest
            val ord = Ordering.by[SketchKey, Int](_.h).reverse
            val pq = new java.util.PriorityQueue[SketchKey](64, ord)
            it.foreach { case (c, t) =>
              n += 1
              val h = scala.util.hashing.MurmurHash3.productHash((c, t))
              if (pq.size < sketchK) pq.add(SketchKey(h, c, t))
              else if (h < pq.peek().h) { pq.poll(); pq.add(SketchKey(h, c, t)) }
            }
            Iterator.single(PartitionSketch(n, pq.toArray(new Array[SketchKey](0))))
          }.collect()
      tm = mark(tm, "sketch")
      val sample: Array[(String, Int)] = sketches.iterator.flatMap(_.keys).toArray
        .sortBy(_.h).take(sketchK).map(x => (x.conv_id, x.turn_idx)).sorted
      val cuts: Array[(String, Int)] =
        if (sample.isEmpty) Array.empty
        else Array.tabulate(cfg.numSegments - 1) { i =>
          sample(((i + 1).toLong * sample.length / cfg.numSegments).toInt
            .min(sample.length - 1))
        }
      val bcCuts = spark.sparkContext.broadcast(cuts)
      def segOf(conv: String, turn: Int, cs: Array[(String, Int)]): Int = {
        // first cut > key, via binary search on the (conv, turn) total order
        var lo = 0
        var hi = cs.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          val c = cs(mid)
          val cmp = {
            val x = conv.compareTo(c._1)
            if (x != 0) x else Integer.compare(turn, c._2)
          }
          if (cmp < 0) hi = mid else lo = mid + 1
        }
        lo
      }
      // pass A: exact per-segment counts (shuffles one count per segment)
      val counts = src.select($"conv_id", $"turn_idx").as[(String, Int)]
        .mapPartitions { it =>
          val cs = bcCuts.value
          val local = new Array[Long](cs.length + 1)
          it.foreach { case (c, t) => local(segOf(c, t, cs)) += 1 }
          Iterator.tabulate(local.length)(i => (i, local(i)))
        }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .collect().toMap
      tm = mark(tm, "passA-counts")
      val offsets = new Array[Long](cfg.numSegments)
      var acc = 0L
      for (p <- 0 until cfg.numSegments) {
        offsets(p) = acc
        acc += counts.getOrElse(p, 0L)
      }
      val bcOffsets = spark.sparkContext.broadcast(offsets)
      // pass B: one corpus shuffle, sort within partitions, assign ids.
      // HASH-repartition on the precomputed segment index, NOT
      // repartitionByRange: a RangePartitioner would run one more full
      // sampling scan of the corpus to learn boundaries we already know.
      // 4x partitions keeps hash collisions (two segments in one partition)
      // rare; a multi-segment partition is still correct everywhere — seg
      // is monotone in (conv_id, turn_idx), so the sort keeps segments
      // contiguous, per-seg rank counters are keyed by seg, and each
      // written file still holds only whole segments.
      // capture the (tiny) cuts array ITSELF in the closure, not the
      // broadcast handle: Broadcast.value is a synchronized method holding
      // a SoftReference, and a per-row .value from N shuffle-map threads
      // serializes on that one monitor — measured as the map stage burning
      // 12x CPU (>90% system time, futex) at 16 slots vs 4. Under GC
      // pressure the SoftReference also clears mid-stage, re-reading and
      // re-decompressing the block arbitrarily often.
      val cutsLocal = cuts
      val segUdf = udf((c: String, t: Int) => segOf(c, t, cutsLocal))
      src.withColumn("seg", segUdf($"conv_id", $"turn_idx"))
        .repartition(4 * cfg.numSegments, $"seg")
        .sortWithinPartitions($"conv_id", $"turn_idx")
        .as[SegTurn]
        .mapPartitions { it =>
          val off = bcOffsets.value
          val next = new java.util.HashMap[Integer, Long]()
          it.map { r =>
            val cur = next.getOrDefault(r.seg, off(r.seg))
            next.put(r.seg, cur + 1)
            DocRow(cur, r.seg, r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts)
          }
        }
        .write.mode("overwrite").option("compression", Zstd).parquet(s"$dir/docs")
      tm = mark(tm, "passB-docs")
      appendLineage(spark, dir, LineageRow("docs", 0, cfg.numSegments, acc, 0L,
        (System.nanoTime() - t0) / 1000000, now()))
      } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prevScanSplit)
    }

    // ---- step 2: postings, one batch of segments at a time --------------
    // Sourced from the committed docs parquet WITHOUT a shuffle: pass B's
    // range partitioning already wrote segment-aligned files (equal `seg`
    // values land in one range partition, so every file holds only whole
    // segments, rows doc_id-ascending). The per-partition posting build
    // keys buffers by (segment, term), so a task holding several whole
    // segments is fine — but a task holding a FRAGMENT of a segment is not
    // (it would emit duplicate (segment, term) rows and a torn norms
    // sidecar). Guard: cap parquet split size at the largest docs file so
    // Spark can never split one file across tasks; one task ≈ one file
    // keeps parallelism = numSegments. (The r1 build re-shuffled the whole
    // corpus here — the dominant non-compute cost in the scaling bench.)
    // NOTE: reusing the in-memory pre-write pass-B plan instead is a
    // measured 5x pessimization — every downstream task closure then drags
    // the cached upstream lineage (with per-relation serialized Hadoop
    // Configurations) through (de)serialization.
    def source: Dataset[DocRow] = spark.read.parquet(s"$dir/docs").as[DocRow]

    val docsPath = new org.apache.hadoop.fs.Path(s"$dir/docs")
    val docsFs = docsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val maxDocsFile = docsFs.listStatus(docsPath)
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen)
      .foldLeft(1L)(math.max)
    val prevSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (maxDocsFile + 1).toString)
    // openCost = split cap: otherwise Spark PACKS 2+ small docs files into
    // one task (measured: 128 segment files -> 64 tasks -> 4 uneven waves
    // at 16 slots, ~28% idle tail on the dominant stage). One file per task
    // keeps postings parallelism = numSegments exactly.
    spark.conf.set("spark.sql.files.openCostInBytes", (maxDocsFile + 1).toString)
    val perBatch = math.max(1, math.ceil(cfg.numSegments.toDouble / cfg.batches).toInt)
    val analyzer = new Analyzer(cfg.stopwords)
    try {
      for (b <- 0 until cfg.batches) {
        val lo = b * perBatch
        val hi = math.min(cfg.numSegments, lo + perBatch)
        if (lo < hi) {
          if (done(s"batch-$b")) skipped += 1
          else {
            val t0 = System.nanoTime()
            buildSegments(spark, source, dir, lo, hi, cfg.batches > 1, analyzer)
            appendLineage(spark, dir, LineageRow(s"batch-$b", lo, hi, 0L, 0L,
              (System.nanoTime() - t0) / 1000000, now()))
          }
        }
      }
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevSplit)
      spark.conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }

    // ---- step 3: exact global stats --------------------------------------
    if (done("stats")) skipped += 1
    else {
      val t0 = System.nanoTime()
      val postings = spark.read.parquet(s"$dir/postings")
        .select($"term", $"doc_count", $"ttf").persist()
      postings.where($"term" =!= "")
        .groupBy($"term")
        .agg(sum($"doc_count").cast("long").as("df"), sum($"ttf").as("ttf"))
        .as[TermStats]
        .sortWithinPartitions($"term") // tight row-group stats for point reads
        .write.mode("overwrite").option("compression", Zstd).parquet(s"$dir/terms")
      val c = postings.where($"term" === "")
        .agg(sum($"doc_count").cast("long"), sum($"ttf").cast("long"))
        .as[(Long, Long)].head()
      postings.unpersist()
      // num_segments records the segment ID SPACE (cfg.numSegments), not the
      // count of non-empty segments — streaming appends allocate the next
      // segment id as corpus.num_segments, which must never collide
      Seq(CorpusStats(c._1, c._2, cfg.numSegments)).toDS()
        .write.mode("overwrite").parquet(s"$dir/corpus")
      appendLineage(spark, dir, LineageRow("stats", 0, cfg.numSegments, c._1, 0L,
        (System.nanoTime() - t0) / 1000000, now()))
    }

    val c = spark.read.parquet(s"$dir/corpus").as[CorpusStats].head()
    BuildResult(c.doc_count, c.sum_dl, c.num_segments, skipped)
  }

  /** One analysis + in-segment posting-build pass over segments [lo, hi):
    * a per-partition term -> PostingsBuf map (plus the "" norms-sidecar
    * entry per segment) flushed as compressed PostingRows. Equivalent to
    * the typed [[PostingsAggregator]] aggregation but without the exchange —
    * every (segment, term) key is complete inside its partition. */
  private def buildSegments(spark: SparkSession, docs: Dataset[DocRow], dir: String,
      lo: Int, hi: Int, filterBatch: Boolean, analyzer: Analyzer): Unit = {
    import spark.implicits._
    val in = if (filterBatch) docs.where($"segment_id" >= lo && $"segment_id" < hi) else docs
    val rows: Dataset[PostingRow] = in
      .select($"doc_id", $"segment_id", $"text", $"role", $"tool")
      .as[(Long, Int, String, String, String)]
      .mapPartitions { it =>
        val bufs = new java.util.HashMap[(Int, String), PostingsBuf]()
        def buf(seg: Int, term: String): PostingsBuf = {
          val k = (seg, term)
          var b = bufs.get(k)
          if (b == null) { b = new PostingsBuf(); bufs.put(k, b) }
          b
        }
        val one = SmallFloat.intToByte4(1) // field norm: single-token dl
        val tp = new java.util.HashMap[String, IntBuf]()
        it.foreach { case (docId, seg, text, role, tool) =>
          val (terms, tposs) = analyzer.analyzeWithPositions(text)
          val dl = terms.length
          val norm = SmallFloat.intToByte4(dl)
          val lenBuf = buf(seg, "")
          lenBuf.isLenRow = true
          lenBuf.add(docId, dl, norm)
          // single-token field postings (`role:user` keying): tf = 1,
          // norm = dl 1 — scored with the field's own stats, filtered
          // structurally; positions are not needed (no phrases on fields)
          if (role != null && role.nonEmpty) buf(seg, "role:" + role).add(docId, 1, one)
          if (tool != null && tool.nonEmpty) buf(seg, "tool:" + tool).add(docId, 1, one)
          tp.clear()
          var i = 0
          while (i < terms.length) {
            val t = terms(i)
            var l = tp.get(t)
            if (l == null) { l = new IntBuf(); tp.put(t, l) }
            l.add(tposs(i))
            i += 1
          }
          val ts = tp.entrySet().iterator()
          while (ts.hasNext) {
            val e = ts.next()
            buf(seg, e.getKey).addPos(docId, norm, e.getValue)
          }
        }
        // emit in (term, segment) order SORTED IN-TASK: rows flow straight to
        // the parquet writer with tight row-group stats for term pushdown,
        // WITHOUT a sortWithinPartitions — Spark's sorter would buffer a
        // second, full copy of the compressed segment per task (measured as
        // half the postings stage's live heap at local[16]). Each buf is
        // dropped from the map as it is consumed, so peak memory is the raw
        // accumulation map alone.
        val keys = bufs.keySet().toArray(new Array[(Int, String)](0))
        java.util.Arrays.sort(keys, Ordering.by((k: (Int, String)) => (k._2, k._1)))
        new Iterator[PostingRow] {
          var i = 0
          def hasNext = i < keys.length
          def next() = {
            val k = keys(i)
            i += 1
            val b = bufs.remove(k)
            PostingsAggregator.finish(b).withKey(k._1, k._2)
          }
        }
      }
    rows.write.mode("append").option("compression", Zstd).parquet(s"$dir/postings")
  }

  private def now() = new Timestamp(System.currentTimeMillis())

  private def appendLineage(spark: SparkSession, dir: String, row: LineageRow): Unit = {
    import spark.implicits._
    Seq(row).toDS().write.mode("append").parquet(s"$dir/lineage")
  }
}

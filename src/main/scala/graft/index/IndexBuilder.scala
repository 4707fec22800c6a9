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
  * `solr/core/src/java/org/apache/solr/update/SolrIndexWriter.java:57-155`) —
  * then one analysis pass per segment feeding a typed Catalyst aggregation
  * that completes every (segment, term) posting list map-side. The shuffle
  * moves finished compressed lists, never raw tokens of a hot term, so
  * hot-term skew is capped at segment size by construction.
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

  def build(spark: SparkSession, turns: DataFrame, dir: String, cfg: Config = Config()): BuildResult = {
    import spark.implicits._
    val done = completedSteps(spark, dir)
    var skipped = 0

    // ---- step 1: docId assignment (two-pass, no global window) ----------
    if (done("docs")) skipped += 1
    else {
      val t0 = System.nanoTime()
      val sorted = turns
        .select($"conv_id", $"turn_idx", $"role", $"text", $"tool", $"ts")
        .repartitionByRange(cfg.numSegments, $"conv_id", $"turn_idx")
        .sortWithinPartitions($"conv_id", $"turn_idx")
        .persist()
      try {
        // pass 1: per-partition counts -> exclusive prefix sums (tiny collect:
        // one long per segment; scales to any corpus)
        val counts = sorted.groupBy(spark_partition_id().as("pid")).count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val offsets = new Array[Long](cfg.numSegments)
        var acc = 0L
        for (p <- 0 until cfg.numSegments) {
          offsets(p) = acc
          acc += counts.getOrElse(p, 0L)
        }
        val bc = spark.sparkContext.broadcast(offsets)
        // pass 2: assign doc_id = partition offset + local rank
        val docs: Dataset[DocRow] = sorted.as[Turn].mapPartitions { it =>
          val pid = TaskContext.getPartitionId()
          var next = bc.value(pid)
          it.map { t =>
            val d = DocRow(next, pid, t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts)
            next += 1
            d
          }
        }
        docs.write.mode("overwrite").parquet(s"$dir/docs")
        appendLineage(spark, dir, LineageRow("docs", 0, cfg.numSegments, acc, 0L,
          (System.nanoTime() - t0) / 1000000, now()))
      } finally sorted.unpersist()
    }

    val docs = spark.read.parquet(s"$dir/docs")

    // ---- step 2: postings, one batch of segments at a time --------------
    val perBatch = math.max(1, math.ceil(cfg.numSegments.toDouble / cfg.batches).toInt)
    val analyzer = new Analyzer(cfg.stopwords)
    for (b <- 0 until cfg.batches) {
      val lo = b * perBatch
      val hi = math.min(cfg.numSegments, lo + perBatch)
      if (lo < hi) {
        if (done(s"batch-$b")) skipped += 1
        else {
          val t0 = System.nanoTime()
          val n = buildSegments(spark, docs, dir, lo, hi, analyzer)
          appendLineage(spark, dir, LineageRow(s"batch-$b", lo, hi, 0L, n,
            (System.nanoTime() - t0) / 1000000, now()))
        }
      }
    }

    // ---- step 3: exact global stats --------------------------------------
    if (done("stats")) skipped += 1
    else {
      val t0 = System.nanoTime()
      val postings = spark.read.parquet(s"$dir/postings")
      postings.where($"term" =!= "")
        .groupBy($"term")
        .agg(sum($"doc_count").cast("long").as("df"), sum($"ttf").as("ttf"))
        .as[TermStats]
        .write.mode("overwrite").parquet(s"$dir/terms")
      val c = postings.where($"term" === "")
        .agg(sum($"doc_count").cast("long"), sum($"ttf").cast("long"), count(lit(1)).cast("int"))
        .as[(Long, Long, Int)].head()
      Seq(CorpusStats(c._1, c._2, c._3)).toDS()
        .write.mode("overwrite").parquet(s"$dir/corpus")
      appendLineage(spark, dir, LineageRow("stats", 0, cfg.numSegments, c._1, 0L,
        (System.nanoTime() - t0) / 1000000, now()))
    }

    val c = spark.read.parquet(s"$dir/corpus").as[CorpusStats].head()
    BuildResult(c.doc_count, c.sum_dl, c.num_segments, skipped)
  }

  /** One analysis pass + one typed aggregation over segments [lo, hi). */
  private def buildSegments(spark: SparkSession, docs: DataFrame, dir: String,
      lo: Int, hi: Int, analyzer: Analyzer): Long = {
    import spark.implicits._
    val rows: Dataset[TokenRow] = docs
      .where($"segment_id" >= lo && $"segment_id" < hi)
      .select($"doc_id", $"segment_id", $"text")
      .as[(Long, Int, String)]
      .mapPartitions { it =>
        it.flatMap { case (docId, seg, text) =>
          val terms = analyzer.analyze(text)
          val dl = terms.length
          val norm = SmallFloat.intToByte4(dl)
          val tf = new java.util.HashMap[String, Integer]()
          var i = 0
          while (i < terms.length) {
            val t = terms(i)
            val prev = tf.get(t)
            tf.put(t, if (prev == null) Integer.valueOf(1) else Integer.valueOf(prev.intValue + 1))
            i += 1
          }
          val len = Iterator.single(TokenRow(seg, "", docId, dl, norm))
          val ts = tf.entrySet().iterator()
          len ++ new Iterator[TokenRow] {
            def hasNext = ts.hasNext
            def next() = { val e = ts.next(); TokenRow(seg, e.getKey, docId, e.getValue, norm) }
          }
        }
      }
    val agged = rows
      .groupByKey(r => (r.segment_id, r.term))
      .agg(PostingsAggregator.toColumn.name("pl"))
      .map { case ((seg, term), pr) => pr.withKey(seg, term) }
    agged
      .sortWithinPartitions($"term", $"segment_id") // tight row-group stats for term pushdown
      .write.mode("append").parquet(s"$dir/postings")
    0L
  }

  private def now() = new Timestamp(System.currentTimeMillis())

  private def appendLineage(spark: SparkSession, dir: String, row: LineageRow): Unit = {
    import spark.implicits._
    Seq(row).toDS().write.mode("append").parquet(s"$dir/lineage")
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row
import graft.analysis.Analyzer
import graft.codec.SmallFloat
import graft.index._

/** Incremental index maintenance over a transcript stream — the engine's
  * rendering of the reference's update path (SURVEY.md §2.8):
  *
  *   - each micro-batch becomes one (or more) NEW immutable segments
  *     appended to the index — Lucene's RAM-buffer flush / soft-commit
  *     model (`solr/server/solr/configsets/_default/conf/solrconfig.xml:240-252`:
  *     commit visibility = here, the parquet append of a batch);
  *   - docIds continue densely from the current corpus count in arrival
  *     order — matching Lucene/Solr append semantics (arrival order, not
  *     key order; the offline build's (conv_id, turn_idx) sort is a
  *     stricter determinism choice available only offline);
  *   - exact global term stats are refreshed per batch by merging the
  *     delta aggregation into the terms table (ExactStatsCache semantics);
  *   - resume/recovery is Structured Streaming's checkpointLocation — the
  *     tlog-replay analogue (`solr/core/src/java/org/apache/solr/update/UpdateLog.java:1401-1443`).
  */
object StreamingIndexer {

  /** Index one micro-batch as a new segment (idempotent per batchId via
    * lineage: replayed batches are skipped — exactly-once append). */
  def appendBatch(spark: SparkSession, batch: DataFrame, indexDir: String,
      batchId: Long, analyzer: Analyzer = Analyzer.default): Unit = {
    import spark.implicits._
    val step = s"stream-batch-$batchId"
    if (IndexBuilder.completedSteps(spark, indexDir).contains(step)) return
    val t0 = System.nanoTime()

    val hasIndex = {
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/corpus")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val (baseDoc, baseSeg) =
      if (!hasIndex) (0L, 0)
      else {
        val c = spark.read.parquet(s"$indexDir/corpus").as[CorpusStats].head()
        val maxSeg = spark.read.parquet(s"$indexDir/postings")
          .agg(max($"segment_id")).as[Int].head()
        (c.doc_count, maxSeg + 1)
      }

    // one segment per micro-batch (coalesce: a batch is small by
    // construction; a large backfill batch arrives pre-partitioned and
    // could map partitions->segments instead)
    val rows = batch.select($"conv_id", $"turn_idx", $"role", $"text", $"tool", $"ts")
      .coalesce(1).as[Turn]
      .mapPartitions { it =>
        var next = baseDoc
        it.map { t =>
          val d = DocRow(next, baseSeg, t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts)
          next += 1
          d
        }
      }
    rows.write.mode("append").parquet(s"$indexDir/docs")

    val docs = spark.read.parquet(s"$indexDir/docs")
      .where($"segment_id" === baseSeg)
      .select($"doc_id", $"segment_id", $"text").as[(Long, Int, String)]
    val newPostings = docs.mapPartitions { it =>
      val bufs = new java.util.HashMap[String, PostingsBuf]()
      def buf(term: String): PostingsBuf = {
        var b = bufs.get(term)
        if (b == null) { b = new PostingsBuf(); bufs.put(term, b) }
        b
      }
      val tf = new java.util.HashMap[String, Integer]()
      it.foreach { case (docId, _, text) =>
        val terms = analyzer.analyze(text)
        val dl = terms.length
        val norm = SmallFloat.intToByte4(dl)
        val lenBuf = buf("")
        lenBuf.isLenRow = true
        lenBuf.add(docId, dl, norm)
        tf.clear()
        var i = 0
        while (i < terms.length) {
          val t = terms(i)
          val prev = tf.get(t)
          tf.put(t, if (prev == null) Integer.valueOf(1) else Integer.valueOf(prev.intValue + 1))
          i += 1
        }
        val ts = tf.entrySet().iterator()
        while (ts.hasNext) {
          val e = ts.next()
          buf(e.getKey).add(docId, e.getValue.intValue, norm)
        }
      }
      val out = bufs.entrySet().iterator()
      new Iterator[PostingRow] {
        def hasNext = out.hasNext
        def next() = {
          val e = out.next()
          PostingsAggregator.finish(e.getValue).withKey(baseSeg, e.getKey)
        }
      }
    }
    newPostings.write.mode("append").parquet(s"$indexDir/postings")

    // refresh exact global stats from all postings (terms table is small —
    // proportional to vocabulary, not corpus)
    val postings = spark.read.parquet(s"$indexDir/postings")
    postings.where($"term" =!= "")
      .groupBy($"term")
      .agg(sum($"doc_count").cast("long").as("df"), sum($"ttf").as("ttf"))
      .as[TermStats]
      .write.mode("overwrite").parquet(s"$indexDir/terms.tmp")
    swap(spark, s"$indexDir/terms.tmp", s"$indexDir/terms")
    val c = postings.where($"term" === "")
      .agg(sum($"doc_count").cast("long"), sum($"ttf").cast("long"), count(lit(1)).cast("int"))
      .as[(Long, Long, Int)].head()
    Seq(CorpusStats(c._1, c._2, c._3)).toDS()
      .write.mode("overwrite").parquet(s"$indexDir/corpus.tmp")
    swap(spark, s"$indexDir/corpus.tmp", s"$indexDir/corpus")

    Seq(LineageRow(step, baseSeg, baseSeg + 1, c._1, 0L,
      (System.nanoTime() - t0) / 1000000,
      new java.sql.Timestamp(System.currentTimeMillis())))
      .toDS().write.mode("append").parquet(s"$indexDir/lineage")
  }

  private def swap(spark: SparkSession, tmp: String, dst: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dst), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(dst))
  }

  /** Continuous indexing query: transcript stream -> index appends with
    * checkpointed exactly-once batches (TopicStream/DaemonStream analogue,
    * `solrj-streaming .../io/stream/TopicStream.java:75-103`,
    * `DaemonStream.java:304-367`). */
  def indexStream(stream: DataFrame, indexDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("3 seconds")): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, id: Long) =>
        appendBatch(df.sparkSession, df, indexDir, id)
      }
}

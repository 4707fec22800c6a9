package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.index.{IndexBuilder, IndexMerger, TranscriptGen, Turn}
import graft.query.{Oracle, QueryParser, Searcher}
import graft.streaming.{EventStreams, StreamingIndexer}

/** Segment merge (sort-merge posting-list union) and incremental streaming
  * index maintenance: merged / streamed indexes must answer queries
  * identically to batch-built ones. */
class MergeStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("merge-stream-spec")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft-ms").toString

  override def afterAll(): Unit = spark.stop()

  private val queries = Seq("the data", "error retry", "+test build", "spark -data query")

  private def topK(s: Searcher, q: String, k: Int = 10) =
    s.topKHits(q, k).collect().toSeq

  test("merge 8 segments -> 2: identical top-k ranks and scores") {
    val turns = TranscriptGen.generate(spark, 60)
    val d8 = tmp()
    IndexBuilder.build(spark, turns.toDF(), d8, IndexBuilder.Config(numSegments = 8))
    val d2 = tmp()
    IndexMerger.mergeSegments(spark, d8, d2, targetSegments = 2)
    val s8 = new Searcher(spark, d8)
    val s2 = new Searcher(spark, d2)
    assert(s2.corpus.doc_count == s8.corpus.doc_count)
    assert(s2.corpus.sum_dl == s8.corpus.sum_dl)
    assert(s2.corpus.num_segments == 2) // merged id space
    queries.foreach { q =>
      assert(topK(s2, q) == topK(s8, q), s"query '$q' diverged after merge")
    }
    // docs segment ids must follow the same remap as postings — fq-filtered
    // queries join docs-derived bitmaps against the merged norms sidecar
    // by segment_id (r1 bug: stale doc segments silently dropped matches)
    import spark.implicits._
    val docSegs = spark.read.parquet(s"$d2/docs")
      .select($"segment_id").distinct().as[Int].collect().toSet
    assert(docSegs.subsetOf(Set(0, 1)), s"docs segments not remapped: $docSegs")
    val filtered = Seq("role:user the data", "role:assistant error retry")
    filtered.foreach { q =>
      assert(topK(s2, q) == topK(s8, q), s"filtered query '$q' diverged after merge")
    }
    // merged metrics table follows the remap and still reconciles exactly
    val m2 = spark.read.parquet(s"$d2/metrics")
      .select($"segment_id", $"n_docs", $"sum_dl").as[(Int, Long, Long)]
      .collect()
    assert(m2.map(_._1).toSet == docSegs, s"metrics segments: ${m2.map(_._1).toSet}")
    assert(m2.map(_._2).sum == s2.corpus.doc_count)
    assert(m2.map(_._3).sum == s2.corpus.sum_dl)
    s8.close(); s2.close()
  }

  test("append after merge: new segment ids don't collide, queries cover all docs") {
    import spark.implicits._
    val all = TranscriptGen.generate(spark, 60).collect().toSeq
    val (offline, streamed) = all.splitAt(all.length * 2 / 3)
    val d8 = tmp()
    IndexBuilder.build(spark, offline.toDF(), d8, IndexBuilder.Config(numSegments = 8))
    val d2 = tmp()
    IndexMerger.mergeSegments(spark, d8, d2, targetSegments = 2)
    StreamingIndexer.appendBatch(spark, streamed.toDF(), d2, batchId = 0)
    val s = new Searcher(spark, d2)
    assert(s.corpus.doc_count == all.length)
    assert(s.corpus.num_segments == 3)
    // appended segment must be disjoint from merged ones in docs AND postings
    val segDocs = spark.read.parquet(s"$d2/docs")
      .groupBy($"segment_id").count().as[(Int, Long)].collect().toMap
    assert(segDocs.keySet == Set(0, 1, 2), s"unexpected segments: ${segDocs.keySet}")
    assert(segDocs(2) == streamed.length.toLong)
    // streamed append adds its own metrics row alongside the merged ones
    val mSegs = spark.read.parquet(s"$d2/metrics")
      .select($"segment_id", $"n_docs").as[(Int, Long)].collect().toMap
    assert(mSegs.keySet == Set(0, 1, 2), s"metrics segments: ${mSegs.keySet}")
    assert(mSegs(2) == streamed.length.toLong)
    assert(mSegs.values.sum == all.length.toLong)
    // queries (incl. fq-filtered) match the batch oracle over ALL docs
    (queries ++ Seq("role:user the data")).foreach { q =>
      val parsed = QueryParser.parse(q)
      val engine = s.topKHits(parsed, 10).collect().toSeq
      val oracle = Oracle.topK(spark, s.docs, parsed, 10).collect().toSeq
      assert(engine == oracle, s"query '$q' diverged after append-after-merge")
    }
    s.close()
  }

  test("merge to 1 segment: decoded postings equal full concatenation") {
    import spark.implicits._
    val turns = TranscriptGen.generate(spark, 20)
    val d4 = tmp()
    IndexBuilder.build(spark, turns.toDF(), d4, IndexBuilder.Config(numSegments = 4))
    val d1 = tmp()
    IndexMerger.mergeSegments(spark, d4, d1, targetSegments = 1)
    val merged = spark.read.parquet(s"$d1/postings").as[graft.index.PostingRow]
      .collect().filter(_.term != "")
    assert(merged.map(_.segment_id).distinct.toSeq == Seq(0))
    // decoded merged content == union of per-segment decodes, docId-sorted
    val orig = spark.read.parquet(s"$d4/postings").as[graft.index.PostingRow]
      .collect().filter(_.term != "").groupBy(_.term)
    merged.foreach { m =>
      val parts = orig(m.term).sortBy(_.first_doc)
      val origDocs = parts.flatMap(p => decodeDocs(p))
      assert(decodeDocs(m).toSeq == origDocs.toSeq, s"term ${m.term}")
    }
  }

  test("merge policy plan: smallest adjacent pairs merge first, map stays dense and monotone") {
    import graft.index.MergePolicy
    // sizes: a big head segment then a tail of small streamed ones
    val sizes = Seq(0 -> 1000L, 1 -> 10L, 2 -> 12L, 3 -> 900L, 4 -> 8L, 5 -> 9L)
    val m4 = MergePolicy.plan(sizes, maxSegments = 4)
    // dense 0..3, monotone in old id (adjacency preserved)
    assert(m4.values.toSet == Set(0, 1, 2, 3))
    assert((0 to 4).forall(i => m4(i) <= m4(i + 1)))
    // the two smallest adjacent runs collapse: (1,2) and (4,5); the giants
    // stay alone — TieredMergePolicy's similar-size preference
    assert(m4(0) != m4(1) && m4(1) == m4(2) && m4(2) != m4(3))
    assert(m4(3) != m4(4) && m4(4) == m4(5))
    // tighter budget: the (4,5) run absorbs its giant neighbor before any
    // giant-giant merge forms
    val m3 = MergePolicy.plan(sizes, maxSegments = 3)
    assert(m3.values.toSet == Set(0, 1, 2))
    assert(m3(0) != m3(1) && m3(1) == m3(2) && m3(2) != m3(3))
    assert(m3(3) == m3(4) && m3(4) == m3(5))
    // within budget: identity-shaped, no merging
    val id = MergePolicy.plan(sizes, maxSegments = 6)
    assert((0 to 5).forall(i => id(i) == i))
  }

  test("compact: streamed segment pileup merges under policy, queries stay oracle-identical") {
    import spark.implicits._
    import graft.index.MergePolicy
    val all = TranscriptGen.generate(spark, 60).collect().toSeq
    val (offline, streamed) = all.splitAt(all.length / 2)
    val dir = tmp()
    IndexBuilder.build(spark, offline.toDF(), dir, IndexBuilder.Config(numSegments = 2))
    // 2 batch segments + 4 micro-batch segments = 6
    streamed.grouped(math.max(1, streamed.length / 4 + 1)).zipWithIndex.foreach {
      case (b, i) => StreamingIndexer.appendBatch(spark, b.toDF(), dir, batchId = i)
    }
    val before = spark.read.parquet(s"$dir/metrics").count()
    assert(before >= 5, s"expected a segment pileup, got $before")
    val out = tmp()
    val n = MergePolicy.compact(spark, dir, out, maxSegments = 3)
    assert(n == Some(3))
    val s = new Searcher(spark, out)
    assert(s.corpus.doc_count == all.length)
    assert(s.corpus.num_segments == 3)
    (queries ++ Seq("role:user the data")).foreach { q =>
      val parsed = QueryParser.parse(q)
      val engine = s.topKHits(parsed, 10).collect().toSeq
      val oracle = Oracle.topK(spark, s.docs, parsed, 10).collect().toSeq
      assert(engine == oracle, s"query '$q' diverged after compaction")
    }
    // metrics rewritten for the compacted layout and still exact
    val m = spark.read.parquet(s"$out/metrics")
      .select($"segment_id", $"n_docs").as[(Int, Long)].collect().toMap
    assert(m.keySet == Set(0, 1, 2))
    assert(m.values.sum == all.length.toLong)
    // a later append keeps working on the compacted index (baseSeg = 3)
    StreamingIndexer.appendBatch(spark, Seq(all.head.copy(conv_id = "c-new")).toDF(), out, batchId = 99)
    val s2 = new Searcher(spark, out)
    assert(s2.corpus.doc_count == all.length + 1)
    assert(s2.corpus.num_segments == 4)
    s.close(); s2.close()
  }

  test("compacted index: phrase/slop/wildcard/filter queries stay rank-identical to the oracle") {
    import spark.implicits._
    import graft.index.MergePolicy
    val all = TranscriptGen.generate(spark, 80).collect().toSeq
    val (offline, streamed) = all.splitAt(all.length / 2)
    val dir = tmp()
    IndexBuilder.build(spark, offline.toDF(), dir, IndexBuilder.Config(numSegments = 3))
    streamed.grouped(math.max(1, streamed.length / 3 + 1)).zipWithIndex.foreach {
      case (b, i) => StreamingIndexer.appendBatch(spark, b.toDF(), dir, batchId = i)
    }
    val out = tmp()
    assert(MergePolicy.compact(spark, dir, out, maxSegments = 2) == Some(2))
    val s = new Searcher(spark, out)
    // positions, slop, expansion, filters, boosts, nested groups — the
    // shapes that stress stitched posting blocks and concatenated norms
    val hard = Seq(
      "\"the data\"", "+\"error retry\" timeout", "\"error retry\"~2 timeout",
      "par* data", "errer~1 data", "data -\"merge shuffle\"",
      "role:user spark index", "data -role:system",
      "error OR (data AND query)", "data^2 query the")
    hard.foreach { q =>
      val parsed = s.expand(QueryParser.parse(q))
      val engine = s.topKHits(parsed, 10).collect().toSeq
      val oracle = Oracle.topK(spark,
        s.docs.select($"doc_id", $"text", $"role", $"tool"), parsed, 10).collect().toSeq
      assert(engine == oracle, s"query '$q' diverged on the compacted index")
    }
    s.close()
  }

  private def decodeDocs(p: graft.index.PostingRow): Array[Long] = {
    val docs = new Array[Long](graft.codec.PostingsCodec.BlockSize)
    val tfs = new Array[Int](graft.codec.PostingsCodec.BlockSize)
    p.blocks.flatMap { b =>
      graft.codec.PostingsCodec.decodeBlock(b, docs, tfs, 0)
      docs.take(b.count)
    }
  }

  test("streaming appends == batch oracle on the same documents") {
    import spark.implicits._
    val all = TranscriptGen.generate(spark, 40).collect().toSeq
    val (b1, b2) = all.splitAt(all.length / 2)
    val dir = tmp()
    StreamingIndexer.appendBatch(spark, b1.toDF(), dir, batchId = 0)
    StreamingIndexer.appendBatch(spark, b2.toDF(), dir, batchId = 1)
    // replay of an already-applied batch must be a no-op (exactly-once)
    StreamingIndexer.appendBatch(spark, b2.toDF(), dir, batchId = 1)

    val s = new Searcher(spark, dir)
    assert(s.corpus.doc_count == all.length)
    val docs = s.docs
    queries.foreach { q =>
      val parsed = QueryParser.parse(q)
      val engine = s.topKHits(parsed, 10).collect().toSeq
      val oracle = Oracle.topK(spark, docs, parsed, 10).collect().toSeq
      assert(engine == oracle, s"query '$q' diverged on streamed index")
    }
    s.close()
  }

  test("replay of a crashed batch restores pre-batch state exactly") {
    import spark.implicits._
    val all = TranscriptGen.generate(spark, 30).collect().toSeq
    val (b1, b2) = all.splitAt(all.length / 2)
    val dir = tmp()
    StreamingIndexer.appendBatch(spark, b1.toDF(), dir, batchId = 0)

    // simulate a crash mid-batch-1: after file promote and the terms
    // snapshot, before the lineage commit
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$dir/$s")
    // a promoted-but-uncommitted docs file (content irrelevant: cleanup
    // deletes by prefix before anything reads it)
    val someDoc = fs.listStatus(p("docs")).filter(_.getPath.getName.endsWith(".parquet")).head
    org.apache.hadoop.fs.FileUtil.copy(fs, someDoc.getPath, fs,
      new org.apache.hadoop.fs.Path(p("docs"), "b1-part-zzz.parquet"),
      false, spark.sparkContext.hadoopConfiguration)
    // terms snapshot taken, live terms corrupted (half-merged state)
    fs.mkdirs(p("terms.base.1"))
    fs.listStatus(p("terms")).foreach { st =>
      org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
        new org.apache.hadoop.fs.Path(p("terms.base.1"), st.getPath.getName),
        false, spark.sparkContext.hadoopConfiguration)
    }
    spark.read.parquet(s"$dir/terms")
      .unionByName(spark.read.parquet(s"$dir/terms.base.1"))
      .write.mode("overwrite").parquet(s"$dir/terms.tmp")
    fs.delete(p("terms"), true)
    fs.rename(p("terms.tmp"), p("terms"))

    // replay batch 1 for real: must first restore pre-batch state
    StreamingIndexer.appendBatch(spark, b2.toDF(), dir, batchId = 1)

    val s = new Searcher(spark, dir)
    assert(s.corpus.doc_count == all.length)
    // terms table must equal a from-scratch aggregation of the postings
    val got = spark.read.parquet(s"$dir/terms")
      .as[graft.index.TermStats].collect().map(t => (t.term, t.df, t.ttf)).toSet
    val want = spark.read.parquet(s"$dir/postings").where($"term" =!= "")
      .groupBy($"term").agg(sum($"doc_count").cast("long").as("df"), sum($"ttf").as("ttf"))
      .as[graft.index.TermStats].collect().map(t => (t.term, t.df, t.ttf)).toSet
    assert(got == want, "terms table diverged from postings after crash replay")
    queries.foreach { q =>
      val parsed = QueryParser.parse(q)
      assert(s.topKHits(parsed, 10).collect().toSeq ==
        Oracle.topK(spark, s.docs, parsed, 10).collect().toSeq, s"'$q' diverged")
    }
    s.close()
  }

  test("appendBatch reads O(batch + vocab), not O(index)") {
    import spark.implicits._
    val dir = tmp()
    IndexBuilder.build(spark, TranscriptGen.generate(spark, 400).toDF(), dir,
      IndexBuilder.Config(numSegments = 8))
    val postingRows = spark.read.parquet(s"$dir/postings").count()
    val batch = TranscriptGen.generate(spark, 2).collect().toSeq

    val recs = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) recs.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      StreamingIndexer.appendBatch(spark, batch.toDF(), dir, batchId = 0)
      // let the listener bus drain
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      var last = -1L
      while (System.nanoTime() < deadline && recs.get() != last) {
        last = recs.get(); Thread.sleep(300)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // the r1 implementation re-aggregated ALL posting rows per batch; the
    // incremental merge reads the batch + the vocab-sized terms table only
    assert(recs.get() < postingRows / 2,
      s"appendBatch read ${recs.get()} records; full postings = $postingRows (not incremental?)")
  }

  test("foreachBatch streaming query indexes a MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Turn]
    val dir = tmp()
    val ck = tmp()
    val rows = TranscriptGen.generate(spark, 10).collect().toSeq
    mem.addData(rows: _*)
    val q = StreamingIndexer.indexStream(mem.toDF(), dir, ck,
      org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val s = new Searcher(spark, dir)
    assert(s.corpus.doc_count == rows.length)
    s.close()
  }

  test("watermarked windowed rollup matches batch groupBy on events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    case class Ev(ts: java.sql.Timestamp, event_type: String)
    val evs = (0 until 500).map { i =>
      (new java.sql.Timestamp(1700000000000L + i * 97000L), if (i % 3 == 0) "a" else "b")
    }
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val streamed = EventStreams.windowedRollup(
      mem.toDF().toDF("ts", "event_type"))
    val q = streamed.writeStream.format("memory").queryName("wr")
      .outputMode("complete").start()
    mem.addData(evs: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wr").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = EventStreams.windowedRollup(evs.toDF("ts", "event_type")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("streaming dedup drops duplicate (conv_id, turn_idx) rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = TranscriptGen.generate(spark, 5).collect().toSeq
    val mem = MemoryStream[Turn]
    val q = EventStreams.dedupTurns(mem.toDF()).writeStream
      .format("memory").queryName("dd").outputMode("append").start()
    mem.addData(rows ++ rows.take(3): _*)
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dd").count() == rows.length)
  }
}

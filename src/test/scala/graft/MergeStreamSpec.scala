package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
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
    assert(s2.corpus == s8.corpus)
    queries.foreach { q =>
      assert(topK(s2, q) == topK(s8, q), s"query '$q' diverged after merge")
    }
    s8.close(); s2.close()
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

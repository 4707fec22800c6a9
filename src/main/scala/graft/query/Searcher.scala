package graft.query

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.roaringbitmap.RoaringBitmap
import graft.analysis.Analyzer
import graft.index.{CorpusStats, PostingRow}

/** Distributed top-k query engine over a built index (SURVEY.md §3.1 "Spark
  * shape"): driver parses the query and looks up exact global term stats
  * (the ExactStatsCache analogue), executors run block-max WAND per segment
  * (segment = partition = the shard-local search of
  * `solr/core/src/java/org/apache/spark/../SolrIndexSearcher.java` — see SURVEY §3.1),
  * and the per-segment top-k heaps are merged exactly like Solr's
  * distributed priority-queue merge
  * (`solr/core/src/java/org/apache/solr/handler/component/QueryComponent.java:971-1060`)
  * via `orderBy(score desc, doc_id asc).limit(k)` — Spark's
  * TakeOrderedAndProject IS a per-partition heap + driver PQ merge.
  * A second stage joins the k winners back to the stored-fields table
  * (Solr's PURPOSE_GET_FIELDS round-trip).
  */
final class Searcher(
    val spark: SparkSession,
    indexDir: String,
    bm25: Bm25 = Bm25(),
    analyzer: Analyzer = Analyzer.default,
    cache: Boolean = true) extends Serializable {

  import spark.implicits._

  val corpus: CorpusStats =
    spark.read.parquet(s"$indexDir/corpus").as[CorpusStats].head()
  val avgdl: Float = bm25.avgdl(corpus.sum_dl, corpus.doc_count)

  // With cache=true the postings and terms tables persist across queries —
  // the searcher-epoch caching role of the reference's filter/queryResult
  // caches (`solr/core/src/java/org/apache/solr/search/SolrIndexSearcher.java:164-165`).
  // At 10^12-doc scale set cache=false: term-predicate pushdown on the
  // term-sorted parquet keeps each query an index-like point read instead.
  private val postingsDF: DataFrame = {
    val df = spark.read.parquet(s"$indexDir/postings")
    if (cache) df.persist() else df
  }
  private val termsDF: DataFrame = {
    val df = spark.read.parquet(s"$indexDir/terms")
    if (cache) df.persist() else df
  }

  private def postings = postingsDF
  def docs: DataFrame = spark.read.parquet(s"$indexDir/docs")

  // fq DocSet cache: computed per-segment filter bitmaps persist across
  // queries keyed by the filter clause set — the reference's filterCache
  // (`solr/core/src/java/org/apache/solr/search/SolrIndexSearcher.java:164-165,443-450`,
  // CaffeineCache). Entries live for the searcher epoch; close() drops them.
  private val cacheEnabled = cache
  private val fqCache =
    new java.util.concurrent.ConcurrentHashMap[Vector[String], Dataset[Searcher.SegmentCtx]]()

  /** Drop this searcher's cached tables (end of searcher epoch). */
  def close(): Unit = if (cache) {
    postingsDF.unpersist()
    termsDF.unpersist()
    fqCache.values().forEach(df => df.unpersist())
    fqCache.clear()
  }

  import Searcher.SegmentCtx

  // per-seen-term df memo (bounded by distinct queried terms — the cached
  // term statistics of the reference's stats cache, SolrCore.java:1645-1658)
  private val dfMemo = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** df lookup for the query's terms (tiny collect — filter pushdown on the
    * sorted terms table keeps this an index-like point read at scale). */
  def termStats(terms: Seq[String]): Map[String, Long] = {
    if (terms.isEmpty) return Map.empty
    val missing = if (cacheEnabled) terms.filterNot(dfMemo.containsKey) else terms
    val fetched: Map[String, Long] =
      if (missing.isEmpty) Map.empty
      else termsDF
        .where($"term".isin(missing: _*))
        .select($"term", $"df").as[(String, Long)]
        .collect().toMap
    if (cacheEnabled) {
      // a term absent from the index memoizes as df=0
      missing.foreach(t => dfMemo.put(t, java.lang.Long.valueOf(fetched.getOrElse(t, 0L))))
      terms.map(t => t -> dfMemo.get(t).longValue).toMap.filter(_._2 > 0)
    } else fetched
  }

  /** Top-k (doc_id, score) for a raw query string. */
  def topKHits(q: String, k: Int): Dataset[Hit] = topKHits(QueryParser.parse(q, analyzer), k)

  /** Resolve multi-term clauses (prefix wildcard, fuzzy) against the terms
    * table — Lucene's MultiTermQuery rewrite, using the documented
    * SCORING_BOOLEAN_REWRITE (each concrete term scores normally), capped
    * at MaxExpansions like the reference's BooleanQuery limit. Prefix
    * expansion is an index-range read (term-sorted parquet + pushdown);
    * fuzzy runs a distributed edit-distance filter over the vocabulary. */
  def expand(parsed: ParsedQuery): ParsedQuery = {
    if (parsed.multiTerms.isEmpty) return parsed
    var p = parsed
    p.multiTerms.foreach { mt =>
      val expanded: Vector[String] = (mt.kind match {
        case 0 =>
          termsDF.where($"term".startsWith(mt.body))
            .orderBy($"term").limit(Searcher.MaxExpansions)
            .select($"term").as[String].collect()
        case _ =>
          val (body, maxE) = (mt.body, mt.maxEdits)
          termsDF.select($"term").as[String]
            .filter(t => Searcher.editDistanceAtMost(t, body, maxE))
            .collect().sorted.take(Searcher.MaxExpansions)
      }).toVector
      val withBoost =
        if (mt.boost != 1f) p.boosts ++ expanded.map(_ -> mt.boost)
        else p.boosts
      p = mt.occur match {
        case 0 => p.copy(groups = p.groups :+ Group(expanded), boosts = withBoost)
        case 1 => p.copy(should = (p.should ++ expanded).distinct, boosts = withBoost)
        case _ => p.copy(mustNot = (p.mustNot ++ expanded).distinct, boosts = withBoost)
      }
    }
    p.copy(multiTerms = Vector.empty)
  }

  /** @param segmentDocBudget max docs scored per segment before early
    *                         termination with best-so-far (the reference's
    *                         query-limit surface, QueryLimits.java /
    *                         EarlyTerminatingCollector.java — a doc budget
    *                         is the deterministic rendering of timeAllowed) */
  def topKHits(parsed0: ParsedQuery, k: Int, segmentDocBudget: Int = Int.MaxValue): Dataset[Hit] = {
    val empty = spark.emptyDataset[Hit]
    val parsed = expand(parsed0)
    if (parsed.isEmpty || k <= 0) return empty
    val dfs = termStats(parsed.allTerms)
    val must = parsed.must.filter(t => dfs.getOrElse(t, 0L) > 0)
    if (must.length != parsed.must.length) return empty // a MUST term is absent from the corpus
    val should = parsed.should.filter(t => dfs.getOrElse(t, 0L) > 0)
    val mustNot = parsed.mustNot.filter(t => dfs.getOrElse(t, 0L) > 0)
    // a MUST phrase with a corpus-absent member can never match; SHOULD /
    // MUST_NOT phrases with dead members drop out
    val phrasesAlive = parsed.phrases
      .filter(_.terms.forall(t => dfs.getOrElse(t, 0L) > 0))
    if (parsed.phrases.exists(p => p.occur == 0 && !phrasesAlive.contains(p))) return empty
    // a MUST group (grouped disjunction) needs at least one live member
    val groupsAlive = parsed.groups
      .map(g => Group(g.terms.filter(t => dfs.getOrElse(t, 0L) > 0)))
    if (groupsAlive.exists(_.terms.isEmpty)) return empty
    if (must.isEmpty && should.isEmpty && groupsAlive.isEmpty &&
      phrasesAlive.forall(_.occur == 2)) return empty

    // scoring order = MUST terms, SHOULD terms, then phrases, then groups,
    // each in query order (fixed accumulation order for bit-exact sums)
    val scoring = must ++ should
    val meta: Map[String, (Int, Int)] = // term -> (queryPos, occur 0=must 1=should 2=not)
      (must.zipWithIndex.map { case (t, i) => t -> (i, 0) } ++
        should.zipWithIndex.map { case (t, i) => t -> (must.length + i, 1) } ++
        mustNot.zipWithIndex.map { case (t, i) =>
          t -> (scoring.length + phrasesAlive.length + groupsAlive.length + i, 2) }).toMap
    // (phrase terms, occur, queryPos) — idf resolved executor-side
    val phraseMeta: Vector[(Vector[String], Int, Int)] =
      phrasesAlive.zipWithIndex.map { case (p, i) =>
        (p.terms, p.occur, scoring.length + i)
      }
    val groupMeta: Vector[(Vector[String], Int)] =
      groupsAlive.zipWithIndex.map { case (g, i) =>
        (g.terms, scoring.length + phrasesAlive.length + i)
      }
    val idfs: Map[String, Float] =
      dfs.map { case (t, df) => t -> bm25.idf(corpus.doc_count, df) }
    val cache = bm25.normCache(avgdl)
    val boosts = parsed.boosts
    val bcMeta = spark.sparkContext.broadcast((meta, phraseMeta, groupMeta, idfs, boosts, cache))

    val queried = (meta.keys ++ phraseMeta.flatMap(_._1) ++ groupMeta.flatMap(_._1)).toSeq.distinct
    val rows = postings
      .where($"term".isin(queried: _*))
      .as[PostingRow]
    val ctx =
      if (!cacheEnabled) segmentCtx(parsed.filters, parsed.rangeFilters)
      else {
        // canonical key: clause order is irrelevant to the DocSet
        val key = (parsed.filters.map(f => s"eq:${f._1}=${f._2}") ++
          parsed.rangeFilters.map(r => s"rg:${r.field}:${r.lo}:${r.hi}:${r.inclusive}")).sorted
        fqCache.computeIfAbsent(key, _ => {
          // bounded like the reference's CaffeineCache filterCache: evict an
          // arbitrary entry (plus its persisted DocSet) beyond capacity
          if (fqCache.size >= Searcher.FqCacheMax) {
            val it = fqCache.entrySet().iterator()
            if (it.hasNext) { it.next().getValue.unpersist(); it.remove() }
          }
          val df = segmentCtx(parsed.filters, parsed.rangeFilters)
          df.persist()
          df
        })
      }
    val hasFilter = parsed.filters.nonEmpty || parsed.rangeFilters.nonEmpty

    val hits = rows.groupByKey(_.segment_id).cogroup(ctx.groupByKey(_.segment_id)) {
      (seg, ps, ss) =>
        if (!ss.hasNext) Iterator.empty
        else {
          val sc = ss.next()
          val (m, pm, gm, idfm, bst, nc) = bcMeta.value
          def wIdf(t: String): Float = bst.getOrElse(t, 1f) * idfm(t)
          val byTerm = ps.map(pr => pr.term -> pr).toMap
          val mustCur = scala.collection.mutable.ArrayBuffer.empty[Cursor]
          val shouldCur = scala.collection.mutable.ArrayBuffer.empty[Cursor]
          val notCur = scala.collection.mutable.ArrayBuffer.empty[Cursor]
          var missingMust = false
          m.foreach { case (term, (qpos, occ)) =>
            byTerm.get(term) match {
              case Some(pr) =>
                val cur = new PostingCursor(pr.blocks, wIdf(term), nc, qpos)
                occ match {
                  case 0 => mustCur += cur
                  case 1 => shouldCur += cur
                  case _ => notCur += cur
                }
              case None => if (occ == 0) missingMust = true
            }
          }
          pm.foreach { case (terms, occ, qpos) =>
            if (terms.forall(byTerm.contains)) {
              // fresh member cursors (cursors are stateful; a term used both
              // standalone and inside a phrase needs independent iterators);
              // phrase idf = plain sum of member idfs (boosts apply to term
              // clauses, not phrase members)
              val members = terms.map(t =>
                new PostingCursor(byTerm(t).blocks, idfm(t), nc, 0)).toArray
              var idfSum = 0f
              terms.foreach(t => idfSum += idfm(t))
              val pc = new PhraseCursor(members, idfSum, nc, qpos)
              occ match {
                case 0 => mustCur += pc
                case 1 => shouldCur += pc
                case _ => notCur += pc
              }
            } else if (occ == 0) missingMust = true
          }
          gm.foreach { case (terms, qpos) =>
            val present = terms.filter(byTerm.contains)
            if (present.isEmpty) missingMust = true // MUST group can't match here
            else {
              val members = present.map(t =>
                new PostingCursor(byTerm(t).blocks, wIdf(t), nc, 0)).toArray
              mustCur += new DisjunctionCursor(members, qpos)
            }
          }
          if (missingMust) Iterator.empty // a MUST clause can't match here
          else {
            val filter: Option[RoaringBitmap] =
              if (!hasFilter) None
              else if (sc.fbits == null) Some(new RoaringBitmap()) // filter matches nothing here
              else Some(Searcher.bitmapFrom(sc.fbits))
            Wand.scoreSegment(
              shouldCur.sortBy(_.queryPos).toArray,
              mustCur.sortBy(_.queryPos).toArray,
              notCur.toArray,
              sc.norms, sc.first_doc, filter, k, segmentDocBudget).iterator
          }
        }
    }
    hits.orderBy($"score".desc, $"doc_id".asc).limit(k)
  }

  /** Exact-phrase match enumeration: every (internal docId, phraseFreq)
    * with freq >= 1, from the positional postings — the driver-checkable
    * integer artifact of the phrase path (scores are float and gated by
    * EngineSpec instead). */
  def phraseFreqs(terms: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    val dfs = termStats(terms)
    if (terms.isEmpty || terms.exists(t => dfs.getOrElse(t, 0L) == 0L))
      return spark.emptyDataset[(Long, Long)].toDF("did", "freq")
    val termsV = terms.toVector
    val rows = postings.where(col("term").isin(terms: _*)).as[PostingRow]
    rows.groupByKey(_.segment_id).flatMapGroups { (_, ps) =>
      val byTerm = ps.map(pr => pr.term -> pr).toMap
      if (!termsV.forall(byTerm.contains)) Iterator.empty
      else {
        val dummy = Array.fill(256)(1f)
        val members = termsV.map(t => new PostingCursor(byTerm(t).blocks, 0f, dummy, 0)).toArray
        val pc = new PhraseCursor(members, 0f, dummy, 0)
        new Iterator[(Long, Long)] {
          def hasNext: Boolean = pc.doc != Long.MaxValue
          def next(): (Long, Long) = {
            val r = (pc.doc, pc.freq.toLong)
            pc.next()
            r
          }
        }
      }
    }.toDF("did", "freq")
  }

  /** Full search: top-k hits joined back to stored fields, ranked. */
  def search(q: String, k: Int): DataFrame = {
    val hits = topKHits(q, k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"score".desc, $"doc_id".asc)
    hits.join(docs, "doc_id") // hits is <= k rows; Catalyst broadcasts it
      .withColumn("rank", row_number().over(w))
      .select($"rank", $"doc_id", $"score", $"conv_id", $"turn_idx", $"role", $"text", $"tool", $"ts")
      .orderBy($"rank")
  }

  /** Norms sidecar, optionally joined with a per-segment fq bitmap computed
    * from the stored-fields table (the ProcessedFilter DocSet analogue —
    * `solr/core/src/java/org/apache/solr/search/SolrIndexSearcher.java:1207,1242-1250`).
    * Filter semantics: restricts results, does NOT change corpus stats. */
  private def segmentCtx(filters: Vector[(String, String)],
      ranges: Vector[RangeFilter] = Vector.empty): Dataset[SegmentCtx] = {
    val sidecar = postings.where($"term" === "")
      .select($"segment_id", $"first_doc", $"doc_count".as("num_docs"), $"norms")
    if (filters.isEmpty && ranges.isEmpty)
      sidecar.withColumn("fbits", lit(null).cast("binary")).as[SegmentCtx]
    else {
      val conds = filters.map { case (f, v) => col(f) === lit(v) } ++
        ranges.map { r =>
          if (r.inclusive) col(r.field) >= lit(r.lo) && col(r.field) <= lit(r.hi)
          else col(r.field) > lit(r.lo) && col(r.field) < lit(r.hi)
        }
      val cond = conds.reduce(_ && _)
      // per-segment matching docIds, serialized as a bitmap relative to the
      // segment's min matching id; rebased to first_doc after the sidecar join
      val fb = docs.where(cond)
        .select($"segment_id", $"doc_id")
        .as[(Int, Long)]
        .groupByKey(_._1)
        .mapGroups { (seg, it) =>
          val ids = it.map(_._2).toArray
          val base = ids.min
          val bm = new RoaringBitmap()
          ids.foreach(d => bm.add((d - base).toInt))
          (seg, base, Searcher.bitmapBytes(bm))
        }
        .toDF("segment_id", "fbase", "fraw")
      sidecar.join(fb, Seq("segment_id"), "left")
        .as[(Int, Long, Int, Array[Byte], java.lang.Long, Array[Byte])]
        .map { case (seg, first, n, norms, fbase, fraw) =>
          val bits =
            if (fraw == null) null
            else {
              val bm = Searcher.bitmapFrom(fraw)
              val shift = (fbase.longValue() - first).toInt
              val out = new RoaringBitmap()
              bm.forEach(new org.roaringbitmap.IntConsumer {
                def accept(v: Int): Unit = out.add(v + shift)
              })
              Searcher.bitmapBytes(out)
            }
          SegmentCtx(seg, first, n, norms, bits)
        }
    }
  }
}

object Searcher {
  /** fq DocSet cache capacity per searcher epoch (reference: bounded
    * CaffeineCache filterCache, solrconfig.xml filterCache size). */
  val FqCacheMax = 64

  /** Multi-term expansion cap (the reference's BooleanQuery clause limit
    * role, solrconfig.xml maxBooleanClauses). */
  val MaxExpansions = 128

  /** Banded Levenshtein: true iff editDistance(a, b) <= maxEdits. Standard
    * DP with early exit; matches DuckDB's levenshtein() definition
    * (unit-cost insert/delete/substitute). */
  def editDistanceAtMost(a: String, b: String, maxEdits: Int): Boolean = {
    if (math.abs(a.length - b.length) > maxEdits) return false
    var prev = Array.tabulate(b.length + 1)(identity)
    var cur = new Array[Int](b.length + 1)
    var i = 1
    while (i <= a.length) {
      cur(0) = i
      var rowMin = cur(0)
      var j = 1
      while (j <= b.length) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        if (cur(j) < rowMin) rowMin = cur(j)
        j += 1
      }
      if (rowMin > maxEdits) return false
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(b.length) <= maxEdits
  }

  /** Segment scoring context: norms sidecar + optional filter bitmap. */
  case class SegmentCtx(
      segment_id: Int, first_doc: Long, num_docs: Int,
      norms: Array[Byte], fbits: Array[Byte])

  private[query] def bitmapBytes(bm: RoaringBitmap): Array[Byte] = {
    bm.runOptimize()
    val buf = new java.io.ByteArrayOutputStream()
    bm.serialize(new java.io.DataOutputStream(buf))
    buf.toByteArray
  }

  private[query] def bitmapFrom(bytes: Array[Byte]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    bm.deserialize(java.nio.ByteBuffer.wrap(bytes))
    bm
  }
}

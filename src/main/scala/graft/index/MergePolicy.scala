package graft.index

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Segment-merge POLICY: decides WHICH segments to merge, separate from the
  * merge mechanism ([[IndexMerger]]) — the role of Lucene's TieredMergePolicy
  * as configured by the reference
  * (`solr/core/src/java/org/apache/solr/core/SolrIndexConfig.java:66-107`;
  * policy selection in `lucene/core/.../index/TieredMergePolicy.java`).
  *
  * TieredMergePolicy scores candidate merges by size skew and picks
  * cheapest-first so similar-size segments merge together and giant segments
  * are left alone. Our segments own CONTIGUOUS docId ranges (unlike Lucene's
  * unordered segments), so candidate groups are restricted to ADJACENT runs;
  * within that constraint the same principle applies: repeatedly merge the
  * adjacent pair with the smallest combined size until the segment count is
  * within budget. A long-lived streamed index otherwise accumulates one
  * micro-batch-sized segment per trigger — per-segment query overhead
  * (cursor setup, top-k heaps, stats rows) grows linearly with segment
  * count, which is the reason Lucene background-merges at all.
  *
  * Sizes come from the per-segment metrics table (n_postings — the actual
  * per-segment scan cost), so planning is a metrics-table read, never an
  * index scan.
  */
object MergePolicy {

  /** Greedy tiered plan: merge the adjacent pair with the smallest combined
    * size until at most `maxSegments` groups remain. Input: (segment_id,
    * size) for ALL segments, any order; ids need not be contiguous ints but
    * must be docId-ordered (they are, by construction). Returns the dense
    * monotone old->new map (identity-shaped when already within budget). */
  def plan(sizes: Seq[(Int, Long)], maxSegments: Int): Map[Int, Int] = {
    require(maxSegments >= 1, s"maxSegments must be >= 1, got $maxSegments")
    val ordered = sizes.sortBy(_._1)
    // groups: list of (member old ids, combined size), docId order
    var groups = ordered.map { case (id, sz) => (Vector(id), sz) }.toVector
    while (groups.length > maxSegments) {
      var best = 0
      var bestSz = Long.MaxValue
      var i = 0
      while (i < groups.length - 1) {
        val s = groups(i)._2 + groups(i + 1)._2
        if (s < bestSz) { bestSz = s; best = i }
        i += 1
      }
      groups = (groups.take(best) :+
        (groups(best)._1 ++ groups(best + 1)._1, bestSz)) ++
        groups.drop(best + 2)
    }
    groups.iterator.zipWithIndex
      .flatMap { case ((ids, _), g) => ids.iterator.map(_ -> g) }
      .toMap
  }

  /** Compact an index to at most `maxSegments` segments, planning from its
    * metrics table and rewriting via [[IndexMerger.applyMap]]. Returns the
    * resulting segment count, or None when the index is already within
    * budget — then this is a no-op (nothing written to `outDir`) and
    * callers keep using `indexDir`. */
  def compact(spark: SparkSession, indexDir: String, outDir: String,
      maxSegments: Int): Option[Int] = {
    import spark.implicits._
    val sizes = spark.read.parquet(s"$indexDir/metrics")
      .select(col("segment_id"), col("n_postings"))
      .as[(Int, Long)].collect().toSeq // segment-count-sized by construction
    if (sizes.length <= maxSegments) None
    else {
      val m = plan(sizes, maxSegments)
      val newCount = m.values.max + 1
      IndexMerger.applyMap(spark, indexDir, outDir, m, newCount)
      Some(newCount)
    }
  }
}

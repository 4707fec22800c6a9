package graft.streaming

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Event-time streaming transforms (SURVEY.md §2.8). The reference has no
  * watermark/event-time machinery — its streaming layer is pull-based tuple
  * dataflow plus incremental index maintenance — so these are the
  * engine-side upgrades a Spark-native design gets from Structured
  * Streaming, mapped onto the closest reference semantics:
  *
  *   - windowed rollup  <- TimeSeriesStream (date-range buckets,
  *     `solrj-streaming .../io/stream/TimeSeriesStream.java:52-54`), now
  *     incremental with late-data handling;
  *   - keyed dedup      <- last-writer-wins overwrite by uniqueKey
  *     (`solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java:481-526`),
  *     as drop-duplicates-within-watermark on (conv_id, turn_idx).
  */
object EventStreams {

  /** Tumbling-window counts/sums with a lateness watermark. Works on both
    * streaming and batch DataFrames (same plan — Spark unifies them). */
  def windowedRollup(events: DataFrame, tsCol: String = "ts",
      keyCol: String = "event_type",
      windowLen: String = "10 minutes",
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col(keyCol), col("cnt"))

  /** Exactly-once-per-key semantics on an at-least-once stream: drop
    * duplicate (conv_id, turn_idx) rows within the watermark horizon. */
  def dedupTurns(turns: DataFrame, lateness: String = "1 hour"): DataFrame =
    turns
      .withWatermark("ts", lateness)
      .dropDuplicates("conv_id", "turn_idx")
}

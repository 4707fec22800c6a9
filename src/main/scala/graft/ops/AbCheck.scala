package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.index.{IndexBuilder, TranscriptGen}

/** Dev one-off: rebuild the sf0.01 index fixtures into a fresh dir so the
  * postings/docs/terms tables can be diffed against an index built by a
  * previous revision (allocation-path refactor A/B). */
object AbCheck {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/ab-new")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // identical corpus derivations to FtsOps.index at sf0.01
    val docsTurns = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
      format_string("doc-%06d", col("doc_id")).as("conv_id"),
      lit(0).as("turn_idx"),
      col("source").as("role"),
      col("text"),
      col("lang").as("tool"),
      (lit(1700000000000L) + col("doc_id") * 1000).cast("timestamp").as("ts"))
    IndexBuilder.build(spark, docsTurns, s"$out/documents", IndexBuilder.Config(numSegments = 8))
    val turns = TranscriptGen.generate(spark, numConvs = 300).toDF()
    IndexBuilder.build(spark, turns, s"$out/transcripts", IndexBuilder.Config(numSegments = 8))
    spark.stop()
  }
}

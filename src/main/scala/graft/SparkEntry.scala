package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{ExtendedOps, FtsOps, MlEvalOps, MlOps, Op, ParserOps, RelationalOps, SearchOps, StreamSetOps, TextOps, VectorOps, WriterOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator registry (graft.ops.*) carries, per operator: the Spark
  * DataFrame implementation and (where ANSI-SQL-expressible) a DuckDB
  * oracle over the same parquet tables. Search-scoring ops (BM25/WAND) are
  * not SQL-expressible — their rank-identity is gated by `sbt -batch test`
  * against the in-repo brute-force oracle instead (EngineSpec), and the
  * driver records rows-only checks for them.
  */
object SparkEntry {

  def allOps: Seq[Op] =
    RelationalOps.ops ++ TextOps.ops ++ VectorOps.ops ++ SearchOps.ops ++
      FtsOps.ops ++ ExtendedOps.ops ++ WriterOps.ops ++ MlOps.ops ++
      StreamSetOps.ops ++ ParserOps.ops ++ MlEvalOps.ops

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * end-to-end inverted-index build + BM25/WAND top-k search. */
  def entry(spark: SparkSession): DataFrame = FtsOps.flagship(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(op => op.name -> op.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allOps.flatMap(op => op.oracle.map(op.name -> _)).toMap
}

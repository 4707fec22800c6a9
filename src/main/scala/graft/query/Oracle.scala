package graft.query

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer
import graft.codec.SmallFloat

/** Brute-force BM25 scorer in plain DataFrame ops — the independent
  * correctness oracle (SURVEY.md §5: the stand-in for the reference's golden
  * fixtures; implements the *same* quantized math as the engine by calling
  * the shared [[Bm25]] functions, so engine-vs-oracle equality is exact,
  * not approximate). No postings, no WAND, no compressed blocks — it
  * re-derives everything from the raw docs table each call.
  */
object Oracle {

  /** @param docs DataFrame with at least (doc_id long, text string) plus any
    *             filter columns; stats are computed over ALL rows, filters
    *             restrict results only (Solr fq semantics). */
  def topK(
      spark: SparkSession,
      docs: DataFrame,
      parsed: ParsedQuery,
      k: Int,
      bm25: Bm25 = Bm25(),
      analyzer: Analyzer = Analyzer.default): Dataset[Hit] = {
    import spark.implicits._
    if (parsed.isEmpty || k <= 0) return spark.emptyDataset[Hit]

    val analyzeUdf = udf((s: String) => analyzer.analyze(s))
    val toks = docs.select($"doc_id", explode(analyzeUdf($"text")).as("term"))
    val tf = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).cast("int").as("tf"))
    val dl = toks.groupBy($"doc_id").agg(count(lit(1)).cast("int").as("dl"))

    val (n, sumDl) = docs.select(analyzeUdf($"text").as("ts"))
      .agg(count(lit(1)), coalesce(sum(size($"ts")), lit(0L)).cast("long"))
      .as[(Long, Long)].head()
    val avgdl = bm25.avgdl(sumDl, n)

    val scoring = parsed.must ++ parsed.should
    val dfMap = tf.where($"term".isin(parsed.allTerms: _*))
      .groupBy($"term").agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
    if (parsed.must.exists(t => dfMap.getOrElse(t, 0L) == 0L))
      return spark.emptyDataset[Hit]
    val scoringLive = scoring.filter(t => dfMap.getOrElse(t, 0L) > 0)
    if (scoringLive.isEmpty) return spark.emptyDataset[Hit]
    val qpos = scoringLive.zipWithIndex.toMap
    val idfs = scoringLive.map(t => t -> bm25.idf(n, dfMap(t))).toMap
    val mustSet = parsed.must.toSet
    val nMust = parsed.must.length

    val partial = udf((term: String, tf: Int, dl: Int) =>
      bm25.score(tf, SmallFloat.intToByte4(dl), idfs(term), avgdl))
    val orderedSum = udf((xs: Seq[org.apache.spark.sql.Row]) => {
      val arr = xs.map(r => (r.getInt(0), r.getFloat(1))).sortBy(_._1).map(_._2).toArray
      bm25.sum(arr)
    })

    var scored = tf.where($"term".isin(scoringLive: _*))
      .join(dl, "doc_id")
      .withColumn("qpos", udf((t: String) => qpos(t)).apply($"term"))
      .withColumn("partial", partial($"term", $"tf", $"dl"))
      .groupBy($"doc_id")
      .agg(
        orderedSum(collect_list(struct($"qpos", $"partial"))).as("score"),
        sum(when($"term".isin(mustSet.toSeq: _*), 1).otherwise(0)).as("n_must"))
      .where($"n_must" === nMust)
      .select($"doc_id", $"score")

    if (parsed.mustNot.nonEmpty) {
      val banned = tf.where($"term".isin(parsed.mustNot: _*)).select($"doc_id").distinct()
      scored = scored.join(banned, Seq("doc_id"), "left_anti")
    }
    if (parsed.filters.nonEmpty) {
      val cond = parsed.filters.map { case (f, v) => col(f) === lit(v) }.reduce(_ && _)
      scored = scored.join(docs.where(cond).select($"doc_id"), Seq("doc_id"), "left_semi")
    }
    scored.orderBy($"score".desc, $"doc_id".asc).limit(k).as[Hit]
  }
}

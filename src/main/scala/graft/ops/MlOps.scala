package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Op.t

/** {!tlogit} text logistic regression — the last §2.2 parser row.
  *
  * Reference semantics (solr/core/src/java/org/apache/solr/search/
  * TextLogisticRegressionQParserPlugin.java): each request runs ONE
  * gradient-descent iteration over the result set; the feature vector per
  * doc is idf_i * (1 + ln(tf_i)) per requested term plus a bias slot, the
  * update is w -= alpha * (sigmoid(w·x) - y) * x, and weights round-trip
  * through request params across iterations (:70-99,185-227). The driver
  * (client) loops iterations.
  *
  * Spark rendering: the same feature map and update rule, but BATCH
  * gradient descent — one distributed aggregate per iteration (mean
  * gradient over all docs) instead of the reference's sequential per-doc
  * SGD inside one shard pass. Documented divergence: per-doc SGD is
  * order-dependent (docID order) and inherently serial; the batch variant
  * is the standard data-parallel form (one narrow pass per iteration over
  * a checkpointed feature table, gradient = k+1 doubles reduced to the
  * driver — nothing corpus-sized ever moves). Approximate/float by design:
  * rows-only driver check; convergence and separation are gated in
  * OpsSpec on a learnable objective.
  */
object MlOps {

  def trainTlogit(s: SparkSession, dir: String,
      iters: Int = 40, alpha: Double = 1.5): (Array[Double], Double, Long) = {
    import s.implicits._
    val terms = Array("data", "query", "fast", "window", "merge", "group", "error", "test")
    val docs = t(s, dir, "documents")
      .where(length(col("text")) > 0)
      .select(split(col("text"), " ").as("ws"))
    val n = docs.count().toDouble
    val tdf = docs.select(explode(array_distinct(col("ws"))).as("w"))
      .where(col("w").isin(terms.toSeq: _*))
      .groupBy(col("w")).count().as[(String, Long)].collect().toMap
    val idfs = terms.map(tm => math.log(n / tdf.getOrElse(tm, 1L).toDouble))
    val bcT = s.sparkContext.broadcast((terms, idfs))
    // label: doc mentions 'data' — a separable objective so the gates can
    // assert real convergence (the corpus text is otherwise random)
    val feats = docs.as[Seq[String]].map { ws =>
      val (ts, idf) = bcT.value
      val tf = new Array[Int](ts.length)
      ws.foreach { w =>
        var i = 0
        while (i < ts.length) { if (ts(i) == w) tf(i) += 1; i += 1 }
      }
      val x = Array.tabulate(ts.length + 1) { i =>
        if (i == ts.length) 1.0 // bias slot, like the reference's extra weight
        else if (tf(i) > 0) idf(i) * (1 + math.log(tf(i)))
        else 0.0
      }
      (x, if (tf(0) > 0) 1.0 else 0.0)
    }.toDF("x", "y").localCheckpoint(true)
    val typed = feats.as[(Seq[Double], Double)]
    var w = Array.fill(terms.length + 1)(1.0) // reference inits weights to 1.0
    for (_ <- 1 to iters) {
      val bw = s.sparkContext.broadcast(w)
      // one narrow pass: per-row gradient contribution, elementwise reduce;
      // the last slot carries the row count for the mean
      val g = typed.map { case (x, y) =>
        val ww = bw.value
        var dot = 0.0
        var i = 0
        while (i < ww.length) { dot += ww(i) * x(i); i += 1 }
        val err = 1.0 / (1.0 + math.exp(-dot)) - y
        val out = new Array[Double](ww.length + 1)
        i = 0
        while (i < ww.length) { out(i) = err * x(i); i += 1 }
        out(ww.length) = 1.0
        out
      }.reduce { (a, b) =>
        val r = new Array[Double](a.length)
        var i = 0
        while (i < a.length) { r(i) = a(i) + b(i); i += 1 }
        r
      }
      val cnt = g.last
      w = Array.tabulate(w.length)(i => w(i) - alpha * g(i) / cnt)
      bw.destroy()
    }
    val bw = s.sparkContext.broadcast(w)
    val (correct, total) = typed.map { case (x, y) =>
      val ww = bw.value
      var dot = 0.0
      var i = 0
      while (i < ww.length) { dot += ww(i) * x(i); i += 1 }
      val pred = if (1.0 / (1.0 + math.exp(-dot)) >= 0.5) 1.0 else 0.0
      (if (pred == y) 1L else 0L, 1L)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    (w, correct.toDouble / total, total)
  }

  def ops: Seq[Op] = Seq(

    Op("ml_tlogit_train",
      "{!tlogit} text logistic regression trained to convergence: " +
        "reference feature map idf*(1+ln tf) + bias, sigmoid gradient " +
        "updates (TextLogisticRegressionQParserPlugin.java:185-227), " +
        "batch-GD instead of the reference's serial per-doc SGD " +
        "(documented divergence — the data-parallel form; each iteration " +
        "is one narrow pass producing k+1 gradient doubles). Output: one " +
        "row with accuracy, the learned separation, and rounded weights. " +
        "Float/iterative by design -> rows-only driver check; convergence " +
        "gates live in OpsSpec",
      None,
      (s, dir) => {
        import s.implicits._
        val (w, acc, total) = trainTlogit(s, dir)
        val wData = w(0)
        val rounded = w.map(v => math.rint(v * 100) / 100).mkString(",")
        Seq((40, total, math.rint(acc * 1000) / 1000, wData > 0, rounded))
          .toDF("iterations", "docs", "accuracy", "separates", "weights")
      }),

    Op("update_classify_bayes",
      "ClassificationUpdateProcessor, BAYES algorithm: multinomial naive " +
        "bayes with add-1 smoothing, trained at ingest on the labeled half " +
        "(doc_id even, label = lang) and assigning the class field to the " +
        "unlabeled half (update/processor/ClassificationUpdateProcessor" +
        ".java:60-105 via Lucene's SimpleNaiveBayesClassifier). " +
        "score(c, d) = ln(prior_c) + sum_w cnt_w(d) * ln((tf(w,c) + 1) / " +
        "(tokens_c + V)); argmax with 6dp-rounded score, class-name " +
        "tie-break. Per-(doc, class) sums accumulate in WORD order on " +
        "both sides (the registry's ordered-reduce parity pattern), so " +
        "the oracle reproduces the prediction exactly; class stats are " +
        "5 rows -> broadcast, but the per-class word-count table wc is " +
        "VOCABULARY x classes-sized, so it joins on (lang, w) with no " +
        "broadcast hint (AQE may still elect one while it fits); the " +
        "scoring join is test-tokens x classes, linear in corpus size",
      Some("""WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
             |  FROM documents WHERE length(text) > 0),
             |train AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
             |v AS (SELECT count(DISTINCT w) AS vsz FROM train),
             |cls AS (SELECT lang, count(*) AS tokens_c,
             |    count(DISTINCT doc_id) AS docs_c FROM train GROUP BY lang),
             |tot AS (SELECT sum(docs_c) AS n FROM cls),
             |wc AS (SELECT lang, w, count(*) AS tfwc FROM train GROUP BY lang, w),
             |tc AS (SELECT doc_id, w, count(*) AS cnt FROM toks
             |  WHERE doc_id % 2 = 1 GROUP BY doc_id, w),
             |contrib AS (SELECT tc.doc_id, cls.lang, tc.w,
             |    tc.cnt * ln((coalesce(wc.tfwc, 0) + 1.0) / (cls.tokens_c + v.vsz)) AS p
             |  FROM tc CROSS JOIN cls CROSS JOIN v
             |  LEFT JOIN wc ON wc.lang = cls.lang AND wc.w = tc.w),
             |scores AS (SELECT contrib.doc_id, contrib.lang,
             |    ln(CAST(cls.docs_c AS DOUBLE) / tot.n)
             |      + list_reduce(list(p ORDER BY w), (a, x) -> a + x) AS sc
             |  FROM contrib JOIN cls ON cls.lang = contrib.lang, tot
             |  GROUP BY contrib.doc_id, contrib.lang, cls.docs_c, tot.n),
             |ranked AS (SELECT doc_id, lang,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY round(sc, 6) DESC, lang) AS rn FROM scores)
             |SELECT doc_id, lang AS predicted FROM ranked WHERE rn = 1
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .where(length(col("text")) > 0)
          .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
        val train = toks.where(col("doc_id") % 2 === 0)
        val vsz = train.select(countDistinct(col("w"))).as[Long].head()
        val cls = train.groupBy(col("lang"))
          .agg(count(lit(1)).as("tokens_c"), countDistinct(col("doc_id")).as("docs_c"))
        val nTrain = cls.agg(sum(col("docs_c"))).as[Long].head()
        val wc = train.groupBy(col("lang").as("wlang"), col("w").as("ww"))
          .agg(count(lit(1)).as("tfwc"))
        val tc = toks.where(col("doc_id") % 2 === 1)
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
        // wc is vocabulary x classes rows — never force-broadcast it; the
        // (lang, w) equi-join shuffles at scale, AQE may still broadcast
        // while it genuinely fits
        val contrib = tc.crossJoin(broadcast(cls))
          .join(wc,
            col("lang") === col("wlang") && col("w") === col("ww"), "left")
          .select(col("doc_id"), col("lang"), col("w"), col("docs_c"),
            (col("cnt") * log((coalesce(col("tfwc"), lit(0L)) + lit(1.0))
              / (col("tokens_c") + lit(vsz)))).as("p"))
        // word-ordered double sum == DuckDB list_reduce(list(p ORDER BY w)).
        // DuckDB's default collation is UTF-8 BINARY; Java String ordering
        // is UTF-16 code units, which DISAGREES for supplementary-plane
        // tokens (surrogates 0xD800+ sort before U+E000..U+FFFF) — so the
        // sort key is the word's unsigned UTF-8 bytes, not the String
        val orderedSumByWord = udf((xs: Seq[org.apache.spark.sql.Row]) => {
          implicit val utf8Order: Ordering[Array[Byte]] = (a, b) => {
            var i = 0
            var res = 0
            val n = math.min(a.length, b.length)
            while (i < n && res == 0) {
              res = (a(i) & 0xff) - (b(i) & 0xff)
              i += 1
            }
            if (res != 0) res else a.length - b.length
          }
          val ps = xs.map(r => (r.getString(0)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8), r.getDouble(1)))
            .sortBy(_._1)
          var acc = 0.0
          ps.foreach(acc += _._2)
          acc
        })
        val scores = contrib
          .groupBy(col("doc_id"), col("lang"), col("docs_c"))
          .agg(orderedSumByWord(collect_list(struct(col("w"), col("p")))).as("wsum"))
          .select(col("doc_id"), col("lang"),
            (log(col("docs_c").cast("double") / nTrain) + col("wsum")).as("sc"))
        val byDoc = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(round(col("sc"), 6).desc, col("lang"))
        scores.withColumn("rn", row_number().over(byDoc))
          .where(col("rn") === 1)
          .select(col("doc_id"), col("lang").as("predicted"))
          .orderBy(col("doc_id"))
      })
  )
}

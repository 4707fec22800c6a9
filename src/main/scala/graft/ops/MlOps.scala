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
      })
  )
}

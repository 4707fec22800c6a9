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
  * re-derives everything from the raw docs table each call, including
  * phrase frequencies from token positions.
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
    val phrasesAlive = parsed.phrases
      .filter(_.terms.forall(t => dfMap.getOrElse(t, 0L) > 0))
    if (parsed.phrases.exists(p => p.occur == 0 && !phrasesAlive.contains(p)))
      return spark.emptyDataset[Hit]
    val groupsAlive = parsed.groups
      .map(g => Group(g.terms.filter(t => dfMap.getOrElse(t, 0L) > 0),
        g.phrases.filter(_.terms.forall(t => dfMap.getOrElse(t, 0L) > 0))))
    if (groupsAlive.exists(g => g.terms.isEmpty && g.phrases.isEmpty))
      return spark.emptyDataset[Hit]
    // a conjunction group with any dead member (term or phrase term) can
    // never match — drops out
    val conjAlive = parsed.conjGroups
      .filter(g => g.terms.forall(t => dfMap.getOrElse(t, 0L) > 0) &&
        g.phrases.forall(_.terms.forall(t => dfMap.getOrElse(t, 0L) > 0)))
    val scoringLive = scoring.filter(t => dfMap.getOrElse(t, 0L) > 0)
    if (scoringLive.isEmpty && groupsAlive.isEmpty &&
      phrasesAlive.forall(_.occur == 2) && conjAlive.forall(_.occur == 2))
      return spark.emptyDataset[Hit]
    val qpos = scoringLive.zipWithIndex.toMap
    val idfs = scoringLive.map(t => t -> bm25.idf(n, dfMap(t))).toMap
    val mustSet = parsed.must.toSet
    val nMustTotal = parsed.must.length + phrasesAlive.count(_.occur == 0) + groupsAlive.length

    // clause boost multiplies the term's idf before scoring, like the
    // engine's cursor construction (float multiply, same op order)
    val partial = udf((term: String, tf: Int, dl: Int) =>
      bm25.score(tf, SmallFloat.intToByte4(dl), parsed.boostOf(term) * idfs(term), avgdl))

    // term partials: (doc_id, qpos, partial, is_must)
    val termPartials = tf.where($"term".isin(scoringLive: _*))
      .join(dl, "doc_id")
      .withColumn("qpos", udf((t: String) => qpos(t)).apply($"term"))
      .withColumn("partial", partial($"term", $"tf", $"dl"))
      .withColumn("is_must",
        when($"term".isin(mustSet.toSeq: _*), 1).otherwise(0))
      .select($"doc_id", $"qpos", $"partial", $"is_must")

    // phrase frequency per doc from token positions (same position
    // semantics as the index: stopwords consume a position); slop 0 =
    // exact adjacency, slop k = the engine's ordered greedy chain
    def phraseFreqUdf(terms: Vector[String], slop: Int) = udf((text: String) => {
      val (ts, ps) = analyzer.analyzeWithPositions(text)
      val posOf = scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayBuffer[Int]]
      var i = 0
      while (i < ts.length) {
        posOf.getOrElseUpdate(ts(i), scala.collection.mutable.ArrayBuffer.empty) += ps(i)
        i += 1
      }
      val lists = terms.map(t => posOf.getOrElse(t,
        scala.collection.mutable.ArrayBuffer.empty).sorted.toArray)
      if (lists.exists(_.isEmpty)) 0
      else if (slop == 0) {
        val sets = lists.map(_.toSet)
        sets.head.count(p => (1 until terms.length).forall(j => sets(j).contains(p + j)))
      } else {
        lists.head.count { p =>
          var prev = p
          var ok = true
          var j = 1
          while (ok && j < terms.length) {
            val arr = lists(j)
            var idx = java.util.Arrays.binarySearch(arr, prev + 1)
            if (idx < 0) idx = -idx - 1
            if (idx < arr.length && arr(idx) <= prev + 1 + slop) { prev = arr(idx); j += 1 }
            else ok = false
          }
          ok
        }
      }
    })

    def phraseDocs(p: Phrase): DataFrame =
      docs.select($"doc_id", phraseFreqUdf(p.terms, p.slop)($"text").as("freq"))
        .where($"freq" > 0)

    val phrasePartials = phrasesAlive.zipWithIndex
      .filter(_._1.occur != 2)
      .map { case (p, i) =>
        var idfSum = 0f
        p.terms.foreach(t => idfSum += bm25.idf(n, dfMap(t)))
        val pPartial = udf((freq: Int, dl: Int) =>
          bm25.score(freq, SmallFloat.intToByte4(dl), idfSum, avgdl))
        phraseDocs(p)
          .join(dl, "doc_id")
          .select($"doc_id", lit(scoringLive.length + i).as("qpos"),
            pPartial($"freq", $"dl").as("partial"),
            lit(if (p.occur == 0) 1 else 0).as("is_must"))
      }

    // MUST-group (grouped disjunction) partials: a doc matches if any live
    // member matches; matching members' scores sum in member order (term
    // members first, then phrase members — the engine's cursor order)
    // shared member-partial frame for grouped clauses: (doc_id, mi, mp)
    // with mi = member index (terms first, then phrase members — the
    // engine's cursor order) and mp = the member's BM25 partial; ONE
    // definition so group and conjunction scoring can never drift
    val memberSumUdf = udf((xs: Seq[org.apache.spark.sql.Row]) => {
      val arr = xs.map(r => (r.getInt(0), r.getFloat(1))).sortBy(_._1).map(_._2).toArray
      bm25.sum(arr)
    })
    def memberPartials(terms: Vector[String], phrases: Vector[GroupPhrase]): DataFrame = {
      val mIdx = terms.zipWithIndex.toMap
      val mIdf = terms.map(t => t -> (parsed.boostOf(t) * bm25.idf(n, dfMap(t)))).toMap
      val mPartial = udf((term: String, tf: Int, dl: Int) =>
        bm25.score(tf, SmallFloat.intToByte4(dl), mIdf(term), avgdl))
      val termM =
        if (terms.isEmpty) None
        else Some(tf.where($"term".isin(terms: _*))
          .join(dl, "doc_id")
          .withColumn("mi", udf((t: String) => mIdx(t)).apply($"term"))
          .withColumn("mp", mPartial($"term", $"tf", $"dl"))
          .select($"doc_id", $"mi", $"mp"))
      val phraseM = phrases.zipWithIndex.map { case (gp, pi) =>
        var idfSum = 0f
        gp.terms.foreach(t => idfSum += bm25.idf(n, dfMap(t)))
        val pPartial = udf((freq: Int, dlv: Int) =>
          bm25.score(freq, SmallFloat.intToByte4(dlv), idfSum, avgdl))
        docs.select($"doc_id", phraseFreqUdf(gp.terms, gp.slop)($"text").as("freq"))
          .where($"freq" > 0)
          .join(dl, "doc_id")
          .select($"doc_id", lit(terms.length + pi).as("mi"),
            pPartial($"freq", $"dl").as("mp"))
      }
      (termM.toSeq ++ phraseM).reduce(_ unionByName _)
    }

    val groupPartials = groupsAlive.zipWithIndex.map { case (g, gi) =>
      val gq = scoringLive.length + phrasesAlive.length + gi
      memberPartials(g.terms, g.phrases).groupBy($"doc_id")
        .agg(memberSumUdf(collect_list(struct($"mi", $"mp"))).as("partial"))
        .select($"doc_id", lit(gq).as("qpos"), $"partial", lit(1).as("is_must"))
    }

    // SHOULD conjunction-group partials: only docs matching EVERY member —
    // term or exact-phrase — score the group (sum of member partials in
    // member order: terms first, then phrase members, like the engine)
    val conjPartials = conjAlive.zipWithIndex.filter(_._1.occur == 1).map { case (g, ci) =>
      val cq = scoringLive.length + phrasesAlive.length + groupsAlive.length + ci
      memberPartials(g.terms, g.phrases).groupBy($"doc_id")
        .agg(memberSumUdf(collect_list(struct($"mi", $"mp"))).as("partial"),
          countDistinct($"mi").as("nm"))
        .where($"nm" === (g.terms.length + g.phrases.length))
        .select($"doc_id", lit(cq).as("qpos"), $"partial", lit(0).as("is_must"))
    }

    val allPartials = (phrasePartials ++ groupPartials ++ conjPartials)
      .foldLeft(termPartials)(_ unionByName _)

    val orderedSum = udf((xs: Seq[org.apache.spark.sql.Row]) => {
      val arr = xs.map(r => (r.getInt(0), r.getFloat(1))).sortBy(_._1).map(_._2).toArray
      bm25.sum(arr)
    })

    var scored = allPartials
      .groupBy($"doc_id")
      .agg(
        orderedSum(collect_list(struct($"qpos", $"partial"))).as("score"),
        sum($"is_must").as("n_must"))
      .where($"n_must" === nMustTotal)
      .select($"doc_id", $"score")

    if (parsed.mustNot.nonEmpty) {
      val banned = tf.where($"term".isin(parsed.mustNot: _*)).select($"doc_id").distinct()
      scored = scored.join(banned, Seq("doc_id"), "left_anti")
    }
    phrasesAlive.filter(_.occur == 2).foreach { p =>
      scored = scored.join(phraseDocs(p).select($"doc_id"), Seq("doc_id"), "left_anti")
    }
    // MUST_NOT conjunction: exclude exactly the docs matching ALL members
    // (term members AND every exact-phrase member)
    conjAlive.filter(_.occur == 2).foreach { g =>
      var matched =
        if (g.terms.isEmpty) docs.select($"doc_id")
        else tf.where($"term".isin(g.terms: _*))
          .groupBy($"doc_id").agg(countDistinct($"term").as("nm"))
          .where($"nm" === g.terms.length).select($"doc_id")
      g.phrases.foreach { gp =>
        matched = matched.join(
          docs.select($"doc_id", phraseFreqUdf(gp.terms, gp.slop)($"text").as("freq"))
            .where($"freq" > 0).select($"doc_id"),
          Seq("doc_id"), "left_semi")
      }
      scored = scored.join(matched, Seq("doc_id"), "left_anti")
    }
    if (parsed.filters.nonEmpty || parsed.notFilters.nonEmpty ||
      parsed.rangeFilters.nonEmpty) {
      val conds = parsed.filters.map { case (f, v) => col(f) === lit(v) } ++
        parsed.notFilters.map { case (f, v) => !(col(f) <=> lit(v)) } ++
        parsed.rangeFilters.map { r =>
          val in =
            if (r.inclusive) col(r.field) >= lit(r.lo) && col(r.field) <= lit(r.hi)
            else col(r.field) > lit(r.lo) && col(r.field) < lit(r.hi)
          if (r.negated) !coalesce(in, lit(false)) else in
        }
      scored = scored.join(docs.where(conds.reduce(_ && _)).select($"doc_id"), Seq("doc_id"), "left_semi")
    }
    scored.orderBy($"score".desc, $"doc_id".asc).limit(k).as[Hit]
  }
}

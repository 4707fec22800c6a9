package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Op.t

/** Search-component operators beyond the core BM25 path: dis-max fielded
  * scoring, more-like-this, highlighting, spell suggestion, term
  * enumeration, and upsert ingest — each re-expressed with deterministic
  * (integer / exact) scoring so a DuckDB oracle can verify it end-to-end.
  * The BM25-scored variants of these live on the FTS engine; these
  * registry entries prove the operator *semantics* against SQL.
  */
object SearchOps {

  def ops: Seq[Op] = Seq(

    Op("dismax_fielded",
      "dis-max multi-field scoring with per-field boosts and tie-breaker " +
        "(search/ExtendedDismaxQParser.java:66,994-1036 — qf boosts, tie): " +
        "score = max(field scores) + tie * (sum - max); integer per-field " +
        "scores (query-word containment * boost) keep the oracle exact",
      Some("""WITH s AS (SELECT p_partkey,
             |  (CASE WHEN contains(p_name, 'red') THEN 3 ELSE 0 END
             |   + CASE WHEN contains(p_name, 'widget') THEN 3 ELSE 0 END) AS s_name,
             |  (CASE WHEN contains(lower(p_brand), 'brand#1') THEN 2 ELSE 0 END) AS s_brand,
             |  (CASE WHEN contains(lower(p_type), 'economy') THEN 1 ELSE 0 END) AS s_type
             |  FROM part)
             |SELECT p_partkey,
             |  greatest(s_name, s_brand, s_type)
             |    + 0.3 * (s_name + s_brand + s_type - greatest(s_name, s_brand, s_type)) AS score
             |FROM s WHERE s_name + s_brand + s_type > 0
             |ORDER BY score DESC, p_partkey LIMIT 20""".stripMargin),
      (s, dir) => {
        def c(col_ : Column, w: String, b: Int): Column =
          when(col_.contains(w), b).otherwise(0)
        val sName = (c(col("p_name"), "red", 3) + c(col("p_name"), "widget", 3)).as("s_name")
        val sBrand = c(lower(col("p_brand")), "brand#1", 2).as("s_brand")
        val sType = c(lower(col("p_type")), "economy", 1).as("s_type")
        val g = greatest(col("s_name"), col("s_brand"), col("s_type"))
        t(s, dir, "part")
          .select(col("p_partkey"), sName, sBrand, sType)
          .where(col("s_name") + col("s_brand") + col("s_type") > 0)
          .select(col("p_partkey"),
            (g + lit(0.3) * (col("s_name") + col("s_brand") + col("s_type") - g)).as("score"))
          .orderBy(col("score").desc, col("p_partkey"))
          .limit(20)
      }),

    Op("mlt_similar_docs",
      "more-like-this: salient (rarest-df) terms of a seed doc -> rank " +
        "other docs by overlap (search/mlt/SimpleMLTQParser.java, " +
        "handler/MoreLikeThisHandler.java); integer overlap scoring",
      Some("""WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
             |df AS (SELECT w, count(*) AS df FROM toks GROUP BY w),
             |sel AS (SELECT toks.w FROM toks JOIN df ON toks.w = df.w
             |        WHERE doc_id = 0 ORDER BY df, toks.w LIMIT 5)
             |SELECT t.doc_id, count(*) AS overlap
             |FROM toks t JOIN sel ON t.w = sel.w WHERE t.doc_id <> 0
             |GROUP BY t.doc_id ORDER BY overlap DESC, t.doc_id LIMIT 10""".stripMargin),
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
        val df = toks.groupBy(col("w")).agg(count(lit(1)).as("df"))
        val sel = toks.where(col("doc_id") === 0)
          .join(df, "w")
          .orderBy(col("df"), col("w"))
          .limit(5)
          .select(col("w"))
        toks.where(col("doc_id") =!= 0)
          .join(broadcast(sel), "w")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("overlap"))
          .orderBy(col("overlap").desc, col("doc_id"))
          .limit(10)
      }),

    Op("text_highlight",
      "highlighting: locate the first query-term occurrence, emit a " +
        "snippet with <em> markers (solr/core/src/java/org/apache/solr/" +
        "highlight/ — DefaultSolrHighlighter semantics, fragment + markup)",
      Some("""SELECT doc_id, strpos(text, 'query') AS pos,
             |  replace(substr(text, greatest(1, strpos(text, 'query') - 30), 70),
             |          'query', '<em>query</em>') AS snippet
             |FROM documents WHERE strpos(text, 'query') > 0
             |ORDER BY doc_id LIMIT 50""".stripMargin),
      (s, dir) => {
        val pos = locate("query", col("text"))
        t(s, dir, "documents")
          .where(pos > 0)
          .select(col("doc_id"), pos.as("pos"),
            regexp_replace(
              substring(col("text"), greatest(lit(1), pos - 30), lit(70)),
              "query", "<em>query</em>").as("snippet"))
          .orderBy(col("doc_id"))
          .limit(50)
      }),

    Op("suggest_spellcheck",
      "spellcheck: suggest corpus terms within edit distance 2 of a " +
        "misspelled input, ranked by (distance, frequency) " +
        "(solr/core/src/java/org/apache/solr/spelling/ — " +
        "DirectSolrSpellChecker semantics)",
      Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
             |v AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w)
             |SELECT w AS suggestion, levenshtein(w, 'qery') AS dist, cnt
             |FROM v WHERE levenshtein(w, 'qery') <= 2
             |ORDER BY dist, cnt DESC, suggestion LIMIT 10""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .withColumn("dist", levenshtein(col("w"), lit("qery")))
        .where(col("dist") <= 2)
        .select(col("w").as("suggestion"), col("dist"), col("cnt"))
        .orderBy(col("dist"), col("cnt").desc, col("suggestion"))
        .limit(10)),

    Op("terms_enum",
      "terms component: enumerate index terms by prefix with df/ttf " +
        "(handler/component/TermsComponent.java)",
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
             |SELECT w AS term, count(DISTINCT doc_id) AS df, count(*) AS ttf
             |FROM toks WHERE w LIKE 's%'
             |GROUP BY w ORDER BY term LIMIT 30""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .where(col("w").startsWith("s"))
        .groupBy(col("w"))
        .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("ttf"))
        .select(col("w").as("term"), col("df"), col("ttf"))
        .orderBy(col("term"))
        .limit(30)),

    Op("ingest_upsert",
      "overwrite-by-uniqueKey ingest: last-writer-wins merge of a delta " +
        "against the base table (update/DirectUpdateHandler2.java:481-526 " +
        "delete-then-add; versions DistributedUpdateProcessor.java:312-330)",
      Some("""WITH delta AS (SELECT c_custkey, c_acctbal + 1000 AS c_acctbal, 2 AS v
             |  FROM customer WHERE c_custkey % 10 = 0),
             |base AS (SELECT c_custkey, c_acctbal, 1 AS v FROM customer),
             |u AS (SELECT * FROM base UNION ALL SELECT * FROM delta)
             |SELECT c_custkey, c_acctbal, v FROM (
             |  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY v DESC) AS rn FROM u)
             |WHERE rn = 1 AND c_custkey < 50 ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        val base = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_acctbal"), lit(1).as("v"))
        val delta = t(s, dir, "customer")
          .where(col("c_custkey") % 10 === 0)
          .select(col("c_custkey"), (col("c_acctbal") + 1000).as("c_acctbal"), lit(2).as("v"))
        val w = Window.partitionBy(col("c_custkey")).orderBy(col("v").desc)
        base.unionByName(delta)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1 && col("c_custkey") < 50)
          .select(col("c_custkey"), col("c_acctbal"), col("v"))
          .orderBy(col("c_custkey"))
      })
  )
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Op.{t, dec2}

/** Round-2 additions closing the last SURVEY §2 coverage rows that had no
  * registry entry: response writers (JSON/CSV sinks), interval facets,
  * nested pivot drill-down, ReducerStream grouped payloads, the Let/Get/
  * Tup/Echo stream-decorator family, and doc transformers. Reference
  * citations per op; paths relative to /root/reference/.
  */
object WriterOps {

  private def outDir(kind: String, dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-writer/$kind-${dir.replaceAll("[^a-zA-Z0-9.]", "_")}"

  // rank-ordered string agg shared with SearchOps' luke op (Op.sortTopUdf)
  private val subSortUdf = Op.sortTopUdf

  def ops: Seq[Op] = Seq(

    Op("writer_json",
      "JSON response writer: a computed result page (top-50 customers by " +
        "balance) serialized through the JSON sink and parsed back with an " +
        "explicit schema — the /select?wt=json path " +
        "(solr/core/src/java/org/apache/solr/response/JSONResponseWriter.java, " +
        "JacksonJsonWriter.java); oracle is the query itself",
      Some("""SELECT c_custkey, c_name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
             |FROM customer ORDER BY bal DESC, c_custkey LIMIT 50""".stripMargin),
      (s, dir) => {
        // final column cast to DOUBLE per the registry parity rule (OpQuery):
        // DECIMAL outputs hash differently between Spark and the oracle
        val res = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"),
            dec2(col("c_acctbal")).cast("double").as("bal"))
          .orderBy(col("bal").desc, col("c_custkey")).limit(50)
        val out = outDir("json", dir)
        res.write.mode("overwrite").json(out)
        s.read.schema(res.schema).json(out)
          .orderBy(col("bal").desc, col("c_custkey"))
      }),

    Op("writer_xml",
      "XML response writer: a result page serialized to the Solr wt=xml " +
        "<result><doc><field> shape (solr/core/src/java/org/apache/solr/" +
        "response/XMLWriter.java) in a compiled projection, then parsed " +
        "back through the same StAX pull parser the XML loader uses — " +
        "round-trip equality with the query is the oracle; serialization " +
        "and parse both distribute as plain per-row projections",
      Some("""SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey""".stripMargin),
      (s, dir) => {
        val res = t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))
        val serialized = res.select(concat(
          lit("<doc><field name=\"n_nationkey\">"), XmlCodec.esc(col("n_nationkey")),
          lit("</field><field name=\"n_name\">"), XmlCodec.esc(col("n_name")),
          lit("</field></doc>")).as("xml"))
        val parseUdf = udf((xml: String) => {
          val fields = XmlCodec.parseFields(xml)
          (fields.getOrElse("n_nationkey", ""), fields.getOrElse("n_name", ""))
        })
        serialized.select(parseUdf(col("xml")).as("d"))
          .select(col("d._1").cast("int").as("n_nationkey"), col("d._2").as("n_name"))
          .orderBy(col("n_nationkey"))
      }),

    Op("writer_csv",
      "CSV response writer: an aggregated result exported as quoted CSV " +
        "with header and read back typed — the /select?wt=csv path " +
        "(solr/core/src/java/org/apache/solr/response/CSVResponseWriter.java); " +
        "oracle is the aggregation itself",
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  count(*) AS cnt
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, dir) => {
        val res = t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
            count(lit(1)).as("cnt"))
        val out = outDir("csv", dir)
        res.write.mode("overwrite")
          .option("header", "true").option("quoteAll", "true").csv(out)
        s.read.option("header", "true").schema(res.schema).csv(out)
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      }),

    Op("facet_intervals",
      "interval facets: arbitrary (overlapping allowed) intervals over a " +
        "numeric field, each doc counted in EVERY interval containing it — " +
        "facet.interval semantics " +
        "(solr/core/src/java/org/apache/solr/request/IntervalFacets.java); " +
        "rendered as one filtered count per interval, unioned in spec order",
      Some("""SELECT * FROM (
             |  SELECT 0 AS ord, '(*,0)'        AS interval, count(*) FILTER (WHERE c_acctbal < 0) AS cnt FROM customer
             |  UNION ALL
             |  SELECT 1, '[0,1000)',    count(*) FILTER (WHERE c_acctbal >= 0 AND c_acctbal < 1000) FROM customer
             |  UNION ALL
             |  SELECT 2, '[1000,5000)', count(*) FILTER (WHERE c_acctbal >= 1000 AND c_acctbal < 5000) FROM customer
             |  UNION ALL
             |  SELECT 3, '[0,5000)',    count(*) FILTER (WHERE c_acctbal >= 0 AND c_acctbal < 5000) FROM customer
             |  UNION ALL
             |  SELECT 4, '[5000,*]',    count(*) FILTER (WHERE c_acctbal >= 5000) FROM customer)
             |ORDER BY ord""".stripMargin),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val bal = col("c_acctbal")
        // (label, predicate) in request order; intervals 2 and 3 overlap on
        // purpose — the defining difference vs range facets' disjoint buckets
        val spec: Seq[(Int, String, org.apache.spark.sql.Column)] = Seq(
          (0, "(*,0)", bal < 0),
          (1, "[0,1000)", bal >= 0 && bal < 1000),
          (2, "[1000,5000)", bal >= 1000 && bal < 5000),
          (3, "[0,5000)", bal >= 0 && bal < 5000),
          (4, "[5000,*]", bal >= 5000))
        spec.map { case (ord, label, pred) =>
          c.agg(sum(when(pred, 1L).otherwise(0L)).as("cnt"))
            .select(lit(ord).as("ord"), lit(label).as("interval"), col("cnt"))
        }.reduce(_.unionByName(_)).orderBy(col("ord"))
      }),

    Op("facet_pivot",
      "pivot facet drill-down: top-3 nations by customer count, and within " +
        "EACH of those parents the top-2 market segments — the nested " +
        "parent>child bucket shape of facet.pivot=nation,mktsegment " +
        "(solr/core/src/java/org/apache/solr/handler/component/PivotFacetProcessor.java, " +
        "PivotFacetField.java); flat rendering (level, parent, value, cnt) " +
        "with count-desc/value-asc ordering at both levels, Solr's default " +
        "index-order tie-break",
      Some("""WITH l1 AS (
             |  SELECT n_name, count(*) AS cnt FROM customer JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY n_name QUALIFY row_number() OVER (ORDER BY cnt DESC, n_name) <= 3),
             |l2 AS (
             |  SELECT n_name, c_mktsegment, count(*) AS cnt
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey
             |  WHERE n_name IN (SELECT n_name FROM l1)
             |  GROUP BY n_name, c_mktsegment
             |  QUALIFY row_number() OVER (PARTITION BY n_name ORDER BY cnt DESC, c_mktsegment) <= 2)
             |SELECT * FROM (
             |  SELECT 1 AS level, CAST(NULL AS VARCHAR) AS parent, n_name AS value, cnt FROM l1
             |  UNION ALL
             |  SELECT 2, n_name, c_mktsegment, cnt FROM l2)
             |ORDER BY level, parent NULLS FIRST, cnt DESC, value""".stripMargin),
      (s, dir) => {
        val joined = t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
        // top-3 parents via orderBy+limit (distributed TakeOrdered) — the
        // rank itself is unused, so no Window (let alone an unpartitioned
        // one) is needed here
        val l1 = joined.groupBy(col("n_name")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("n_name")).limit(3)
        val l2 = joined
          .join(broadcast(l1.select(col("n_name").as("keep"))),
            col("n_name") === col("keep"))
          .groupBy(col("n_name"), col("c_mktsegment")).agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("n_name")).orderBy(col("cnt").desc, col("c_mktsegment"))))
          .where(col("rk") <= 2).drop("rk")
        l1.select(lit(1).as("level"), lit(null).cast("string").as("parent"),
            col("n_name").as("value"), col("cnt"))
          .unionByName(l2.select(lit(2).as("level"), col("n_name").as("parent"),
            col("c_mktsegment").as("value"), col("cnt")))
          .orderBy(col("level"), col("parent").asc_nulls_first, col("cnt").desc, col("value"))
      }),

    Op("facet_terms_options",
      "terms-facet response options missing/allBuckets/numBuckets: the " +
        "limit-3 bucket list plus the three meta buckets — __missing__ " +
        "(docs with no value; synthesized here by nullif-ing one priority, " +
        "the testdata has no natural nulls), __allBuckets__ (count across " +
        "ALL buckets regardless of limit), __numBuckets__ (distinct bucket " +
        "count) — the JSON Facet API options of search/facet/FacetField" +
        ".java (missing/allBuckets/numBuckets flags) and FacetFieldProcessor" +
        ".java. Rendered as reserved-name rows so the meta buckets ride the " +
        "same (bucket, cnt) schema; 4 partial-agg scans, no extra shuffle " +
        "beyond the terms agg itself",
      Some("""WITH v AS (SELECT nullif(o_orderpriority, '1-URGENT') AS b FROM orders),
             |top3 AS (SELECT b AS bucket, count(*) AS cnt FROM v WHERE b IS NOT NULL
             |         GROUP BY b ORDER BY cnt DESC, b LIMIT 3)
             |SELECT bucket, cnt FROM top3
             |UNION ALL SELECT '__missing__', count(*) FROM v WHERE b IS NULL
             |UNION ALL SELECT '__allBuckets__', count(*) FROM v WHERE b IS NOT NULL
             |UNION ALL SELECT '__numBuckets__', count(DISTINCT b) FROM v
             |ORDER BY bucket""".stripMargin),
      (s, dir) => {
        val v = t(s, dir, "orders")
          .select(expr("nullif(o_orderpriority, '1-URGENT')").as("b"))
        val top3 = v.where(col("b").isNotNull)
          .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("b")).limit(3)
          .select(col("b").as("bucket"), col("cnt"))
        val missing = v.where(col("b").isNull)
          .agg(count(lit(1)).as("cnt"))
          .select(lit("__missing__").as("bucket"), col("cnt"))
        val all = v.where(col("b").isNotNull)
          .agg(count(lit(1)).as("cnt"))
          .select(lit("__allBuckets__").as("bucket"), col("cnt"))
        val num = v.agg(countDistinct(col("b")).as("cnt"))
          .select(lit("__numBuckets__").as("bucket"), col("cnt"))
        top3.unionByName(missing).unionByName(all).unionByName(num)
          .orderBy(col("bucket"))
      }),

    Op("facet_subfacet_metrics",
      "nested JSON-facet block with METRICS AT EVERY LEVEL — the signature " +
        "composition of the JSON Facet API ({type:terms, facet:{avg:..., " +
        "sub:{type:terms, facet:{avg:...}}}}; search/facet/FacetField.java " +
        "nested facet parsing, FacetContext sub-processing): top-2 nations " +
        "by count each carry count+avg(acctbal), and every mktsegment " +
        "bucket nested under them carries its own count+avg. Decimal sums " +
        "keep the avg hash-exact; parent cut is a TakeOrdered; both levels " +
        "aggregate off one shared join, so the child pass adds one " +
        "partial-agg stage, not a second corpus scan",
      Some("""WITH j AS (SELECT n_name, c_mktsegment, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
             |l1 AS (SELECT n_name, count(*) AS cnt, sum(bal) AS s FROM j
             |       GROUP BY n_name ORDER BY cnt DESC, n_name LIMIT 2)
             |SELECT 1 AS level, NULL AS parent, n_name AS value, cnt,
             |  round(CAST(s AS DOUBLE) / cnt, 6) AS avg_bal FROM l1
             |UNION ALL
             |SELECT 2, j.n_name, c_mktsegment, count(*),
             |  round(CAST(sum(bal) AS DOUBLE) / count(*), 6)
             |FROM j JOIN l1 USING (n_name) GROUP BY j.n_name, c_mktsegment
             |ORDER BY level, parent NULLS FIRST, cnt DESC, value""".stripMargin),
      (s, dir) => {
        val j = t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("c_mktsegment"),
            Op.dec2(col("c_acctbal")).as("bal"))
        val l1 = j.groupBy(col("n_name"))
          .agg(count(lit(1)).as("cnt"), sum(col("bal")).as("s"))
          .orderBy(col("cnt").desc, col("n_name")).limit(2)
        val parents = l1.select(lit(1).as("level"),
          lit(null).cast("string").as("parent"), col("n_name").as("value"),
          col("cnt"), round(col("s").cast("double") / col("cnt"), 6).as("avg_bal"))
        val children = j
          .join(broadcast(l1.select(col("n_name").as("keep"))),
            col("n_name") === col("keep"))
          .groupBy(col("n_name"), col("c_mktsegment"))
          .agg(count(lit(1)).as("cnt"), sum(col("bal")).as("s"))
          .select(lit(2).as("level"), col("n_name").as("parent"),
            col("c_mktsegment").as("value"), col("cnt"),
            round(col("s").cast("double") / col("cnt"), 6).as("avg_bal"))
        parents.unionByName(children)
          .orderBy(col("level"), col("parent").asc_nulls_first,
            col("cnt").desc, col("value"))
      }),

    Op("facet_exclude_tags",
      "multi-select faceting via tagged-filter exclusion: the query applies " +
        "fq={!tag=SRC}source:src3 AND fq=lang:en, but the source facet runs " +
        "over the domain with the SRC-tagged filter EXCLUDED (domain: " +
        "{excludeTags:SRC} in the JSON Facet API — search/facet/FacetRequest" +
        ".java domain parsing; legacy facet.field={!ex=SRC} in " +
        "request/SimpleFacets.java) so the UI keeps showing every source's " +
        "count under the OTHER filters while one is selected. Rows = top-5 " +
        "facet buckets over (lang=en) only, plus the __results__ meta row " +
        "counting the fully-filtered result set. Scale shape: two partial " +
        "aggregations over one filtered scan, no extra shuffle",
      Some("""WITH dom AS (SELECT source FROM documents WHERE lang = 'en'),
             |top5 AS (SELECT source AS bucket, count(*) AS cnt FROM dom
             |         GROUP BY source ORDER BY cnt DESC, bucket LIMIT 5)
             |SELECT bucket, cnt FROM top5
             |UNION ALL SELECT '__results__', count(*) FROM dom WHERE source = 'src3'
             |ORDER BY cnt DESC, bucket""".stripMargin),
      (s, dir) => {
        val dom = t(s, dir, "documents")
          .where(col("lang") === "en") // untagged fq: stays in the domain
          .select(col("source"))
        val top5 = dom.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("source")).limit(5)
          .select(col("source").as("bucket"), col("cnt"))
        val results = dom.where(col("source") === "src3") // tagged fq applies
          .agg(count(lit(1)).as("cnt"))
          .select(lit("__results__").as("bucket"), col("cnt"))
        top5.unionByName(results)
          .orderBy(col("cnt").desc, col("bucket"))
      }),

    Op("facet_prefix",
      "terms facet restricted to buckets with a term prefix — facet.prefix " +
        "(request/SimpleFacets.java prefix handling; JSON Facet API `prefix` " +
        "in search/facet/FacetField.java), the facet-driven autocomplete " +
        "idiom. The prefix predicate applies BEFORE aggregation, so at " +
        "scale it prunes the scan (pushed filter), not the bucket list",
      Some("""SELECT source AS bucket, count(*) AS cnt FROM documents
             |WHERE source LIKE 'src1%' GROUP BY source
             |ORDER BY cnt DESC, bucket""".stripMargin),
      (s, dir) => t(s, dir, "documents")
        .where(col("source").startsWith("src1"))
        .groupBy(col("source")).agg(count(lit(1)).as("cnt"))
        .select(col("source").as("bucket"), col("cnt"))
        .orderBy(col("cnt").desc, col("bucket"))),

    Op("facet_range_other",
      "range facet with other=all: gap buckets over [50000, 250000) by " +
        "50000 plus the __before__/__after__/__between__ meta counts — " +
        "facet.range.other semantics (FacetParams.FacetRangeOther, " +
        "search/facet/FacetRange.java other/hardend handling, " +
        "RangeFacetProcessor.java). Bucket key = range start; meta buckets " +
        "as reserved-name rows on the same (bucket, cnt) schema; counts " +
        "are integer-exact so the bucket arithmetic (floor over doubles, " +
        "same expression shape both sides) never reaches the hash",
      Some("""WITH p AS (SELECT o_totalprice AS v FROM orders)
             |SELECT bucket, cnt FROM (
             |  SELECT CAST(CAST(50000 + 50000 * floor((v - 50000) / 50000) AS BIGINT) AS VARCHAR) AS bucket, count(*) AS cnt
             |  FROM p WHERE v >= 50000 AND v < 250000 GROUP BY 1
             |  UNION ALL SELECT '__before__', count(*) FROM p WHERE v < 50000
             |  UNION ALL SELECT '__after__', count(*) FROM p WHERE v >= 250000
             |  UNION ALL SELECT '__between__', count(*) FROM p WHERE v >= 50000 AND v < 250000)
             |ORDER BY bucket""".stripMargin),
      (s, dir) => {
        val p = t(s, dir, "orders").select(col("o_totalprice").as("v"))
        val inRange = p.where(col("v") >= 50000 && col("v") < 250000)
        val buckets = inRange
          .groupBy((lit(50000) + lit(50000) * floor((col("v") - 50000) / 50000))
            .cast("long").cast("string").as("bucket"))
          .agg(count(lit(1)).as("cnt"))
        val before = p.where(col("v") < 50000).agg(count(lit(1)).as("cnt"))
          .select(lit("__before__").as("bucket"), col("cnt"))
        val after = p.where(col("v") >= 250000).agg(count(lit(1)).as("cnt"))
          .select(lit("__after__").as("bucket"), col("cnt"))
        val between = inRange.agg(count(lit(1)).as("cnt"))
          .select(lit("__between__").as("bucket"), col("cnt"))
        buckets.unionByName(before).unionByName(after).unionByName(between)
          .orderBy(col("bucket"))
      }),

    Op("group_collect",
      "ReducerStream + GroupOperation: rows sorted by a group key reduced " +
        "into one tuple per group carrying the ordered member payload " +
        "(solrj-streaming .../io/stream/ReducerStream.java, " +
        ".../io/ops/GroupOperation.java) — suppliers grouped by nation with " +
        "the name list sorted inside each group; the payload is rendered as " +
        "a joined string so the oracle hash-compares exactly",
      Some("""SELECT n_name, count(*) AS members,
             |  string_agg(s_name, ',' ORDER BY s_name) AS names
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
      (s, dir) => {
        t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("members"),
            array_join(sort_array(collect_list(col("s_name"))), ",").as("names"))
          .orderBy(col("n_name"))
      }),

    Op("stream_let_get",
      "Let/Get/Tup/Echo stream decorators: let() binds named sub-streams, " +
        "get() re-reads them, tup() emits one tuple combining them, echo() " +
        "a literal — (solrj-streaming .../io/stream/LetStream.java, " +
        "GetStream.java, TupStream.java, EchoStream.java); rendered as one " +
        "row tupling two bound scalar aggregates plus an echoed literal",
      Some("""SELECT 'hello' AS echo,
             |  (SELECT count(*) FROM orders) AS order_cnt,
             |  (SELECT CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) FROM lineitem) AS total_qty""".stripMargin),
      (s, dir) => {
        // let a = agg(orders), b = agg(lineitem); tup(echo, get(a), get(b))
        val a = t(s, dir, "orders").agg(count(lit(1)).as("order_cnt"))
        val b = t(s, dir, "lineitem")
          .agg(sum(dec2(col("l_quantity"))).cast("double").as("total_qty"))
        s.range(1).select(lit("hello").as("echo"))
          .crossJoin(broadcast(a)).crossJoin(broadcast(b))
      }),

    Op("doc_transform_subquery",
      "[subquery] doc transformer: each RESULT doc carries the rows of a " +
        "correlated subquery executed for it (response/transform/" +
        "SubQueryAugmenterFactory.java — fromIndex lookup keyed on a " +
        "result-doc field, rows limited per doc). Result set = top-10 " +
        "customers by balance; subquery = each one's 3 most expensive " +
        "orders, joined-as-string per the registry's array convention. " +
        "Scale shape: the 10-row result window broadcasts into the " +
        "orders scan (never orders x customers); the per-doc LIMIT is a " +
        "PARTITIONED-by-parent ranking window",
      Some("""WITH win AS (SELECT c_custkey, c_name, c_acctbal FROM customer
             |  ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey LIMIT 10),
             |sub AS (SELECT o.o_custkey, o.o_orderkey, o.o_totalprice,
             |    row_number() OVER (PARTITION BY o.o_custkey
             |      ORDER BY CAST(o.o_totalprice AS DECIMAL(18,2)) DESC, o.o_orderkey) AS rk
             |  FROM orders o JOIN win ON o.o_custkey = win.c_custkey)
             |SELECT win.c_custkey, win.c_name, win.c_acctbal,
             |  coalesce(string_agg(CAST(sub.o_orderkey AS VARCHAR), ',' ORDER BY sub.rk), '') AS top_orders
             |FROM win LEFT JOIN sub ON sub.o_custkey = win.c_custkey AND sub.rk <= 3
             |GROUP BY win.c_custkey, win.c_name, win.c_acctbal
             |ORDER BY win.c_custkey""".stripMargin),
      (s, dir) => {
        val win = t(s, dir, "customer")
          .orderBy(Op.dec2(col("c_acctbal")).desc, col("c_custkey")).limit(10)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val byCust = Window.partitionBy(col("o_custkey"))
          .orderBy(Op.dec2(col("o_totalprice")).desc, col("o_orderkey"))
        val sub = t(s, dir, "orders")
          .join(broadcast(win.select(col("c_custkey").as("wk"))),
            col("o_custkey") === col("wk"), "leftsemi")
          .withColumn("rk", row_number().over(byCust))
          .where(col("rk") <= 3)
        // rank-ordered join-as-string (same sortTop shape as luke's)
        val agg = sub.groupBy(col("o_custkey"))
          .agg(subSortUdf(collect_list(struct(col("rk"),
            col("o_orderkey").cast("string")))).as("top_orders"))
        win.join(agg, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
            coalesce(col("top_orders"), lit("")).as("top_orders"))
          .orderBy(col("c_custkey"))
      }),

    Op("doc_transform",
      "doc transformers: result augmenters appending pseudo-fields to each " +
        "returned doc — [docid] (position in the result set), a constant " +
        "[value] field, and an [explain]-style score-breakdown string " +
        "(solr/core/src/java/org/apache/solr/response/transform/" +
        "DocIdAugmenterFactory.java, ValueAugmenterFactory.java, " +
        "ExplainAugmenterFactory.java)",
      Some("""SELECT o_orderkey,
             |  CAST(row_number() OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey) - 1 AS INT) AS docid,
             |  'testdata' AS source_tag,
             |  'price=' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS explain
             |FROM orders
             |QUALIFY docid < 20 ORDER BY docid""".stripMargin),
      (s, dir) => {
        val priced = t(s, dir, "orders")
          .select(col("o_orderkey"), dec2(col("o_totalprice")).as("p"))
        // [docid] positions exist only within the returned page: take the
        // page first (orderBy+limit = distributed TakeOrdered), then number
        // the 20 surviving rows. pmod(key,1) = non-foldable constant
        // partition key (a foldable lit(0) is optimized away, reintroducing
        // the unpartitioned-Window shape); one partition here is BOUNDED by
        // the limit, vs the old full-table unpartitioned Window sort
        priced
          .orderBy(col("p").desc, col("o_orderkey")).limit(20)
          .withColumn("docid", (row_number().over(
            Window.partitionBy(pmod(col("o_orderkey"), lit(1)))
              .orderBy(col("p").desc, col("o_orderkey"))) - 1).cast("int"))
          .select(col("o_orderkey"), col("docid"),
            lit("testdata").as("source_tag"),
            concat(lit("price="), col("p").cast("string")).as("explain"))
          .orderBy(col("docid"))
      })
  )
}

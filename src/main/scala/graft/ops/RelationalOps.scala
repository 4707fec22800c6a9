package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Op.{t, dec2}

/** Relational operator surface re-expressed Spark-first (SURVEY.md §2):
  * facet/rollup aggregations, the join family, sort/top-k/paging, and the
  * query-parser filter semantics of the reference — each as a declarative
  * DataFrame plan (Catalyst picks the physical strategy) with a DuckDB SQL
  * oracle. Reference citations are per-op below; all paths relative to
  * /root/reference/.
  */
object RelationalOps {

  def ops: Seq[Op] = Seq(

    // ---------------- facets / aggregations (SURVEY §2.4) ----------------

    Op("facet_terms",
      "terms facet: group-by field -> count, sorted desc w/ limit " +
        "(solr/core/src/java/org/apache/solr/search/facet/FacetField.java)",
      Some("""SELECT l_returnflag, count(*) AS cnt FROM lineitem
             |GROUP BY l_returnflag ORDER BY cnt DESC, l_returnflag LIMIT 10""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l_returnflag").asc)
        .limit(10)),

    Op("facet_rollup_metrics",
      "rollup with sum/avg/min/max sub-aggs per bucket, date-range filtered " +
        "(facet/SumAgg.java, AvgAgg.java, MinMaxAgg.java; RollupStream.java:40-42)",
      Some("""SELECT l_returnflag, l_linestatus,
             |  count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
             |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2001-06-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"),
          sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).cast("double").as("sum_disc_price"),
          (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    Op("facet_range",
      "range facet: numeric bucketing with start/gap " +
        "(facet/FacetRange.java, FacetRangeProcessor.java)",
      Some("""SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
             |  count(*) AS cnt,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 50000.0).cast("bigint").as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("bucket"))),

    Op("facet_query",
      "query facet: count per arbitrary predicate bucket " +
        "(facet/FacetQuery.java)",
      // CAST: DuckDB sum(int) is HUGEINT; Spark emits BIGINT (r1 hash-fail)
      Some("""SELECT
             |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
             |  CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low,
             |  CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS big,
             |  count(*) AS total
             |FROM orders""".stripMargin),
      (s, dir) => t(s, dir, "orders").agg(
        sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("urgent"),
        sum(when(col("o_orderpriority") === "5-LOW", 1).otherwise(0)).as("low"),
        sum(when(col("o_totalprice") > 200000, 1).otherwise(0)).as("big"),
        count(lit(1)).as("total"))),

    Op("facet_time_series",
      "date-range facet / time series: month buckets " +
        "(solrj-streaming .../io/stream/TimeSeriesStream.java:52-54)",
      Some("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             |  count(*) AS cnt,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY month ORDER BY month""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec2(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("month"))),

    Op("agg_global_stats",
      "global stats incl. variance/stddev from exact sums " +
        "(handler/component/StatsComponent.java, .../io/stream/StatsStream.java); " +
        "moments derived from exact decimal sums so both engines agree bitwise",
      Some("""SELECT count(*) AS n,
             |  min(l_quantity) AS min_q, max(l_quantity) AS max_q,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_q,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_q,
             |  (CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |    - CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |      * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
             |    / (count(*) - 1) AS var_q
             |FROM lineitem""".stripMargin),
      (s, dir) => {
        val q = dec2(col("l_quantity"))
        t(s, dir, "lineitem").agg(
          count(lit(1)).as("n"),
          min(col("l_quantity")).as("min_q"),
          max(col("l_quantity")).as("max_q"),
          sum(q).cast("double").as("sum_q"),
          (sum(q).cast("double") / count(lit(1))).as("mean_q"),
          ((sum(q * q).cast("double")
            - sum(q).cast("double") * sum(q).cast("double") / count(lit(1)))
            / (count(lit(1)) - 1)).as("var_q"))
      }),

    Op("agg_percentile_disc",
      "discrete percentile per bucket via explicit rank formula (same SQL " +
        "shape both sides; the reference uses a t-digest sketch — " +
        "facet/PercentileAgg.java:19,138-155 — ours is exact, a documented " +
        "strictly-stronger variant)",
      Some("""WITH s AS (
             |  SELECT o_orderpriority AS pr, o_totalprice AS v,
             |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
             |    count(*) OVER (PARTITION BY o_orderpriority) AS n
             |  FROM orders)
             |SELECT pr, max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS p50,
             |  max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN v END) AS p90
             |FROM s GROUP BY pr ORDER BY pr""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"), col("o_orderkey"))
        val wc = Window.partitionBy(col("o_orderpriority"))
        t(s, dir, "orders")
          .select(col("o_orderpriority").as("pr"), col("o_totalprice").as("v"),
            row_number().over(w).as("rn"), count(lit(1)).over(wc).as("n"))
          .groupBy(col("pr"))
          .agg(
            max(when(col("rn") === ceil(lit(0.5) * col("n")).cast("bigint"), col("v"))).as("p50"),
            max(when(col("rn") === ceil(lit(0.9) * col("n")).cast("bigint"), col("v"))).as("p90"))
          .orderBy(col("pr"))
      }),

    Op("agg_count_distinct",
      "unique/hll agg, exact variant (facet/UniqueAgg.java:34, HLLAgg.java:30-46 " +
        "— Spark shuffle agg affords exact distinct in one pass)",
      Some("""SELECT l_linestatus, count(DISTINCT l_partkey) AS u_part,
             |  count(DISTINCT l_suppkey) AS u_supp, count(*) AS cnt
             |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(countDistinct(col("l_partkey")).as("u_part"),
          countDistinct(col("l_suppkey")).as("u_supp"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_linestatus"))),

    Op("agg_percentile_sketch",
      "percentile via a mergeable quantile sketch — the reference's ACTUAL " +
        "algorithm class (t-digest, facet/PercentileAgg.java:19,138-155; " +
        "ours is Spark's GK approx_percentile, a different published sketch " +
        "with the same distributed partial+merge shape). Approximate by " +
        "design -> rows-only driver check; |sketch - exact| tolerance and " +
        "the exact-twin agreement are gated in OpsSpec",
      None,
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("pr"))
        .agg(expr("approx_percentile(o_totalprice, 0.5, 1000)").as("p50"),
          expr("approx_percentile(o_totalprice, 0.9, 1000)").as("p90"))
        .orderBy(col("pr"))),

    Op("agg_percentile_tdigest",
      "percentile via an ACTUAL t-digest implemented from the published " +
        "paper (Dunning & Ertl 2019) as a typed Aggregator / UDAF — the " +
        "same algorithm class AND the same distributed topology as the " +
        "reference (facet/PercentileAgg.java:19,138-155: AVLTreeDigest(100) " +
        "per shard, digests merged at the coordinator; here: per-partition " +
        "partial digests, centroid-list merge at the final aggregate). " +
        "Approximate by design -> rows-only driver check; rank-window " +
        "accuracy vs the exact twin and partitioning robustness are gated " +
        "in OpsSpec",
      None,
      (s, dir) => {
        val p50 = udaf(new graft.functions.TDigestPercentile(0.5))
        val p90 = udaf(new graft.functions.TDigestPercentile(0.9))
        t(s, dir, "orders")
          .groupBy(col("o_orderpriority").as("pr"))
          .agg(p50(col("o_totalprice")).as("p50"),
            p90(col("o_totalprice")).as("p90"))
          .orderBy(col("pr"))
      }),

    Op("agg_hll_approx",
      "unique/hll agg, SKETCH variant — the reference's hll facet function " +
        "(facet/HLLAgg.java:30-46, HyperLogLog with mergeable registers); " +
        "Spark's approx_count_distinct is the same HLL++ family with the " +
        "same partial+merge distribution. Approximate -> rows-only driver " +
        "check; relative error vs the exact twin is gated in OpsSpec",
      None,
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(approx_count_distinct(col("l_partkey")).as("u_part"),
          approx_count_distinct(col("l_suppkey")).as("u_supp"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_linestatus"))),

    Op("agg_having",
      "post-aggregation filter (.../io/stream/HavingStream.java:34-40)",
      Some("""SELECT o_custkey, count(*) AS cnt
             |FROM orders GROUP BY o_custkey HAVING count(*) >= 16
             |ORDER BY cnt DESC, o_custkey""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
        .where(col("cnt") >= 16)
        .orderBy(col("cnt").desc, col("o_custkey"))),

    Op("agg_sig_terms",
      "significant terms: fg/bg ratio per term " +
        "(search/SignificantTermsQParserPlugin.java, .../io/stream/SignificantTermsStream.java)",
      Some("""WITH fg AS (SELECT event_type, count(*) AS f FROM events WHERE user_id % 7 = 0 GROUP BY event_type),
             |bg AS (SELECT event_type, count(*) AS b FROM events GROUP BY event_type),
             |tot AS (SELECT (SELECT count(*) FROM events WHERE user_id % 7 = 0) AS ft,
             |               (SELECT count(*) FROM events) AS bt)
             |SELECT fg.event_type, f, b,
             |  (CAST(f AS DOUBLE) / ft) / (CAST(b AS DOUBLE) / bt) AS lift
             |FROM fg JOIN bg ON fg.event_type = bg.event_type, tot
             |ORDER BY lift DESC, fg.event_type""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "events")
        val fg = e.where(col("user_id") % 7 === 0).groupBy(col("event_type")).agg(count(lit(1)).as("f"))
        val bg = e.groupBy(col("event_type")).agg(count(lit(1)).as("b"))
        val ft = e.where(col("user_id") % 7 === 0).count()
        val bt = e.count()
        fg.join(bg, "event_type")
          .withColumn("lift", (col("f").cast("double") / ft) / (col("b").cast("double") / bt))
          .select(col("event_type"), col("f"), col("b"), col("lift"))
          .orderBy(col("lift").desc, col("event_type"))
      }),

    Op("agg_unique_block",
      "uniqueBlock: count distinct parent blocks from matching children " +
        "(facet/UniqueBlockAgg.java)",
      Some("""SELECT l_returnflag, count(DISTINCT l_orderkey) AS parents
             |FROM lineitem WHERE l_quantity > 45
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .where(col("l_quantity") > 45)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("parents"))
        .orderBy(col("l_returnflag"))),

    // ---------------- joins (SURVEY §2.3) --------------------------------

    Op("join_hash_broadcast",
      "hash join, small build side broadcast " +
        "(.../io/stream/HashJoinStream.java:35-42 -> broadcast hash join)",
      Some("""SELECT c_mktsegment, count(*) AS cnt,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"), sum(dec2(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("c_mktsegment"))),

    Op("join_sort_merge",
      "sorted equi-join of two large inputs " +
        "(.../io/stream/InnerJoinStream.java:28-33 -> Spark SortMergeJoin)",
      Some("""SELECT o_orderpriority, count(*) AS cnt,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), sum(dec2(col("l_extendedprice"))).cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))),

    Op("join_left_outer",
      "left outer join preserving unmatched left rows " +
        "(.../io/stream/LeftOuterJoinStream.java, OuterHashJoinStream.java)",
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY n_orders DESC, c_custkey LIMIT 50""".stripMargin),
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("n_orders").desc, col("c_custkey"))
        .limit(50)),

    Op("join_full_outer",
      "full outer join (.../io/stream/FullOuterJoinStream.java)",
      Some("""WITH cn AS (SELECT c_nationkey AS k, count(*) AS customers FROM customer GROUP BY 1),
             |sn AS (SELECT s_nationkey AS k, count(*) AS suppliers FROM supplier GROUP BY 1)
             |SELECT coalesce(cn.k, sn.k) AS nationkey,
             |  coalesce(customers, 0) AS customers, coalesce(suppliers, 0) AS suppliers
             |FROM cn FULL OUTER JOIN sn ON cn.k = sn.k ORDER BY nationkey""".stripMargin),
      (s, dir) => {
        val cn = t(s, dir, "customer").groupBy(col("c_nationkey").as("k")).agg(count(lit(1)).as("customers"))
        val sn = t(s, dir, "supplier").groupBy(col("s_nationkey").as("k2")).agg(count(lit(1)).as("suppliers"))
        cn.join(sn, col("k") === col("k2"), "full_outer")
          .select(coalesce(col("k"), col("k2")).as("nationkey"),
            coalesce(col("customers"), lit(0)).as("customers"),
            coalesce(col("suppliers"), lit(0)).as("suppliers"))
          .orderBy(col("nationkey"))
      }),

    Op("join_semi",
      "intersect/semi-join: rows of A with a match in B " +
        "(.../io/stream/IntersectStream.java:36-41; {!join} JoinQParserPlugin.java:36-105)",
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice >= 350000)
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").where(col("o_totalprice") >= 350000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    Op("join_anti",
      "complement/anti-join: rows of A with no match in B " +
        "(.../io/stream/ComplementStream.java:36-41)",
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice >= 350000)
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").where(col("o_totalprice") >= 350000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))),

    Op("join_fetch_enrich",
      "fetch: batched lookup join enriching a stream with stored fields " +
        "(.../io/stream/FetchStream.java:45-52)",
      Some("""SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
             |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"), "left_outer")
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)),

    Op("explode_cartesian",
      "cartesian product stream: one tuple per value of a multi-valued field " +
        "(.../io/stream/CartesianProductStream.java -> explode/Generator)",
      Some("""SELECT w AS word, count(*) AS cnt
             |FROM (SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
             |GROUP BY w ORDER BY cnt DESC, w""".stripMargin),
      (s, dir) => t(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))),

    Op("join_block_parent",
      "block join parent query: parents having a matching child " +
        "(search/join/BlockJoinParentQParserPlugin.java)",
      Some("""SELECT o_orderpriority, count(*) AS cnt FROM orders
             |WHERE o_orderkey IN (
             |  SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49 AND l_discount >= 0.09)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "lineitem").where(col("l_quantity") >= 49 && col("l_discount") >= 0.09),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderpriority"))),

    Op("join_scored",
      "scored semi-join: score=max of from-side per to-key " +
        "(search/join/ScoreJoinQParserPlugin.java)",
      Some("""SELECT c_custkey, c_name, score FROM customer
             |JOIN (SELECT o_custkey, max(o_totalprice) AS score FROM orders GROUP BY o_custkey) j
             |  ON c_custkey = o_custkey
             |ORDER BY score DESC, c_custkey LIMIT 10""".stripMargin),
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").groupBy(col("o_custkey")).agg(max(col("o_totalprice")).as("score")),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"), col("score"))
        .orderBy(col("score").desc, col("c_custkey"))
        .limit(10)),

    Op("graph_two_hop",
      "graph expansion by repeated index lookups, here a 2-hop " +
        "customer->nation->region walk (.../io/graph/GatherNodesStream.java)",
      Some("""SELECT r_name, count(*) AS customers,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin),
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("customers"), sum(dec2(col("c_acctbal"))).cast("double").as("total_bal"))
        .orderBy(col("r_name"))),

    // ---------------- window / grouping (SURVEY §2.4-2.5) ----------------

    Op("collapse_group_head",
      "collapse: one head doc per group by max sort value " +
        "(search/CollapsingQParserPlugin.java:91-121)",
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) WHERE rn = 1
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(25)
      }),

    Op("group_top_n",
      "result grouping: top-N docs per group value (search/Grouping.java)",
      Some("""SELECT c_mktsegment, c_custkey, c_acctbal FROM (
             |  SELECT c_mktsegment, c_custkey, c_acctbal,
             |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
             |  FROM customer) WHERE rn <= 2
             |ORDER BY c_mktsegment, c_acctbal DESC, c_custkey""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 2)
          .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
          .orderBy(col("c_mktsegment"), col("c_acctbal").desc, col("c_custkey"))
      }),

    Op("expand_group",
      "expand: top-N non-head docs of each collapsed group " +
        "(handler/component/ExpandComponent.java)",
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
             |  SELECT o_custkey, o_orderkey,
             |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) WHERE rn BETWEEN 2 AND 3 AND o_custkey < 40
             |ORDER BY o_custkey, rn""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .where(col("rn").between(2, 3) && col("o_custkey") < 40)
          .select(col("o_custkey"), col("o_orderkey"), col("rn"))
          .orderBy(col("o_custkey"), col("rn"))
      }),

    // ---------------- sort / top-k / paging (SURVEY §2.5) ----------------

    Op("rank_top_k",
      "rank stream: top-N by priority queue (.../io/stream/RankStream.java:42-46 " +
        "-> TakeOrderedAndProject: per-partition heap + driver merge)",
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 15""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(15)),

    Op("sort_export",
      "full sorted export over the result set " +
        "(handler/export/ExportWriter.java:98,713-803 -> Spark external sort)",
      Some("""SELECT s_suppkey, s_name, s_acctbal FROM supplier
             |ORDER BY s_acctbal DESC, s_suppkey""".stripMargin),
      (s, dir) => t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))),

    Op("merge_sorted_streams",
      "k-way merge of pre-sorted streams (.../io/stream/MergeStream.java:35-40)",
      Some("""SELECT o_orderkey, o_orderpriority, CAST(o_orderdate AS DATE) AS od FROM orders
             |WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
             |ORDER BY od, o_orderkey LIMIT 40""".stripMargin),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val a = o.where(col("o_orderpriority") === "1-URGENT")
        val b = o.where(col("o_orderpriority") === "5-LOW")
        a.unionByName(b)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate").cast("date").as("od"))
          .orderBy(col("od"), col("o_orderkey"))
          .limit(40)
      }),

    Op("page_offset",
      "offset pagination: start/rows (CommonParams.java:65-70)",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(20).limit(10)),

    Op("page_cursor",
      "cursorMark deep paging: keyset from last sort values, uniqueKey " +
        "tie-break (search/CursorMark.java:46-63,294)",
      Some("""WITH cur AS (SELECT o_totalprice AS cp, o_orderkey AS ck FROM orders
             |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1 OFFSET 19)
             |SELECT o_orderkey, o_totalprice FROM orders, cur
             |WHERE o_totalprice < cp OR (o_totalprice = cp AND o_orderkey > ck)
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val cur = o.select(col("o_totalprice").as("cp"), col("o_orderkey").as("ck"))
          .orderBy(col("cp").desc, col("ck")).offset(19).limit(1)
        o.crossJoin(broadcast(cur))
          .where(col("o_totalprice") < col("cp") ||
            (col("o_totalprice") === col("cp") && col("o_orderkey") > col("ck")))
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
      }),

    Op("rerank",
      "re-ranking: rescore top-N of the main query by a second signal " +
        "(search/ReRankQParserPlugin.java, ReRankCollector.java)",
      Some("""WITH top1 AS (SELECT o_orderkey, o_totalprice FROM orders
             |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 50),
             |sec AS (SELECT l_orderkey, count(*) AS li_cnt FROM lineitem GROUP BY l_orderkey)
             |SELECT t.o_orderkey, t.o_totalprice, coalesce(li_cnt, 0) AS li_cnt
             |FROM top1 t LEFT JOIN sec ON t.o_orderkey = sec.l_orderkey
             |ORDER BY li_cnt DESC, o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),
      (s, dir) => {
        val top1 = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(50)
        val sec = t(s, dir, "lineitem").groupBy(col("l_orderkey")).agg(count(lit(1)).as("li_cnt"))
        top1.join(sec, col("o_orderkey") === col("l_orderkey"), "left_outer")
          .select(col("o_orderkey"), col("o_totalprice"), coalesce(col("li_cnt"), lit(0)).as("li_cnt"))
          .orderBy(col("li_cnt").desc, col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
      }),

    Op("rrf_fusion",
      "reciprocal rank fusion of two ranked lists " +
        "(handler/component/CombinedQueryComponent.java:67-76, search/combine/). " +
        "Reference semantics: each query contributes its RETRIEVED top-k " +
        "window (k=100 here), docs outside a window contribute 0 to the " +
        "fused score — so ranking is a distributed TakeOrdered top-100 per " +
        "list followed by a row_number over that bounded page, never a " +
        "full-corpus single-partition Window sort",
      Some("""WITH w1 AS (SELECT p_partkey, row_number() OVER (ORDER BY p_retailprice DESC, p_partkey) AS rk
             |  FROM (SELECT p_partkey, p_retailprice FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 100)),
             |w2 AS (SELECT p_partkey, row_number() OVER (ORDER BY p_size DESC, p_partkey) AS rk
             |  FROM (SELECT p_partkey, p_size FROM part ORDER BY p_size DESC, p_partkey LIMIT 100))
             |SELECT coalesce(w1.p_partkey, w2.p_partkey) AS p_partkey,
             |  round(coalesce(1.0 / (60 + w1.rk), 0) + coalesce(1.0 / (60 + w2.rk), 0), 6) AS rrf
             |FROM w1 FULL OUTER JOIN w2 ON w1.p_partkey = w2.p_partkey
             |ORDER BY rrf DESC, p_partkey LIMIT 10""".stripMargin),
      (s, dir) => {
        val p = t(s, dir, "part")
        // bounded page per list: orderBy+limit = TakeOrdered (distributed
        // partial top-k, merge on one reducer); the Window then ranks only
        // the 100-row page. The constant partition key pmod(key,1) keeps the
        // spec non-empty (a foldable lit(0) is optimized away, reintroducing
        // the unpartitioned-Window full-sort shape) — one partition here is
        // BOUNDED by the limit, not a full-table single-partition sort
        def window(sortCol: String, rkName: String) = p
          .select(col("p_partkey"), col(sortCol))
          .orderBy(col(sortCol).desc, col("p_partkey")).limit(100)
          .select(col("p_partkey"), row_number().over(
            Window.partitionBy(pmod(col("p_partkey"), lit(1)))
              .orderBy(col(sortCol).desc, col("p_partkey"))).as(rkName))
        val r1 = window("p_retailprice", "rk1")
        val r2 = window("p_size", "rk2").withColumnRenamed("p_partkey", "pk2")
        r1.join(r2, col("p_partkey") === col("pk2"), "full_outer")
          .select(coalesce(col("p_partkey"), col("pk2")).as("p_partkey"),
            round(coalesce(lit(1.0) / (lit(60) + col("rk1")), lit(0))
              + coalesce(lit(1.0) / (lit(60) + col("rk2")), lit(0)), 6).as("rrf"))
          .orderBy(col("rrf").desc, col("p_partkey"))
          .limit(10)
      }),

    Op("query_elevation_exclude",
      "query elevation with markExcludes: elevated ids pinned on top IN " +
        "CONFIG ORDER (the elevate.xml sequence, not the organic sort), " +
        "excluded ids removed from the result set entirely " +
        "(QueryElevationComponent.java markExcludes / forced-out ids)",
      Some("""SELECT p_partkey, p_name, elevated FROM (
             |  SELECT p_partkey, p_name,
             |    CASE WHEN p_partkey IN (7, 11, 13) THEN 1 ELSE 0 END AS elevated,
             |    CASE p_partkey WHEN 7 THEN 0 WHEN 11 THEN 1 WHEN 13 THEN 2 ELSE 999 END AS elev_pos,
             |    p_retailprice
             |  FROM part WHERE p_partkey NOT IN (2, 5))
             |ORDER BY elevated DESC, elev_pos, p_retailprice DESC, p_partkey LIMIT 10""".stripMargin),
      (s, dir) => {
        val k = col("p_partkey")
        t(s, dir, "part")
          .where(!k.isin(2, 5)) // markExcludes: forced out of the results
          .withColumn("elevated", when(k.isin(7, 11, 13), 1).otherwise(0))
          // config-order pin: the elevate.xml sequence, organic sort after
          .withColumn("elev_pos",
            when(k === 7, 0).when(k === 11, 1).when(k === 13, 2).otherwise(999))
          .orderBy(col("elevated").desc, col("elev_pos"),
            col("p_retailprice").desc, k)
          .select(k, col("p_name"), col("elevated"))
          .limit(10)
      }),

    Op("query_elevation",
      "query elevation: pin chosen ids above the organic ranking " +
        "(handler/component/QueryElevationComponent.java)",
      Some("""SELECT p_partkey, p_name,
             |  CASE WHEN p_partkey IN (7, 11, 13) THEN 1 ELSE 0 END AS elevated
             |FROM part
             |ORDER BY elevated DESC, p_retailprice DESC, p_partkey LIMIT 10""".stripMargin),
      (s, dir) => t(s, dir, "part")
        .withColumn("elevated", when(col("p_partkey").isin(7, 11, 13), 1).otherwise(0))
        .select(col("p_partkey"), col("p_name"), col("elevated"))
        .orderBy(col("elevated").desc, col("p_retailprice").desc, col("p_partkey"))
        .limit(10)),

    Op("sample_deterministic",
      "pseudo-random sample by content hash — the deterministic analogue of " +
        "RandomStream (.../io/stream/RandomStream.java:261); md5 replaces " +
        "rand(seed) so engine and oracle agree",
      Some("""SELECT o_orderkey FROM orders
             |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = 'a'
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .where(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "a")
        .select(col("o_orderkey"))
        .orderBy(col("o_orderkey"))),

    // ---------------- filters / parsers (SURVEY §2.2) --------------------

    Op("filter_boolean",
      "boolean query composition: AND/OR/NOT, IN, BETWEEN, LIKE " +
        "(parser/QueryParser.jj grammar; BoolQParserPlugin.java)",
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
             |  AND c_acctbal BETWEEN 0 AND 5000
             |  AND c_name NOT LIKE '%42'
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => t(s, dir, "customer")
        .where(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
          && col("c_acctbal").between(0, 5000)
          && !col("c_name").like("%42"))
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    Op("filter_prefix",
      "prefix/wildcard query (PrefixQParserPlugin.java)",
      Some("""SELECT p_brand, count(*) AS cnt FROM part
             |WHERE p_name LIKE 'b%' GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      (s, dir) => t(s, dir, "part")
        .where(col("p_name").startsWith("b"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("p_brand"))),

    Op("filter_fuzzy",
      "fuzzy query by edit distance (FuzzyQParserPlugin.java -> levenshtein)",
      Some("""SELECT n_name, levenshtein(n_name, 'NATION_2') AS dist FROM nation
             |WHERE levenshtein(n_name, 'NATION_2') <= 1 ORDER BY dist, n_name""".stripMargin),
      (s, dir) => t(s, dir, "nation")
        .withColumn("dist", levenshtein(col("n_name"), lit("NATION_2")))
        .where(col("dist") <= 1)
        .select(col("n_name"), col("dist"))
        .orderBy(col("dist"), col("n_name"))),

    Op("filter_frange",
      "function range query: l <= f(doc) <= u over a computed value " +
        "(search/FunctionRangeQParserPlugin.java); exact decimal arithmetic",
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net
             |FROM lineitem
             |WHERE CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
             |      BETWEEN 94000 AND 95000
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) => {
        val net = dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
        t(s, dir, "lineitem")
          .where(net.between(94000, 95000))
          .select(col("l_orderkey"), col("l_linenumber"), net.cast("double").as("net"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      }),

    Op("filter_switch",
      "switch/case param-driven routing (SwitchQParserPlugin.java)",
      Some("""SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'expedite'
             |  WHEN o_orderpriority = '3-MEDIUM' THEN 'normal' ELSE 'defer' END AS class,
             |  count(*) AS cnt
             |FROM orders GROUP BY class ORDER BY class""".stripMargin),
      (s, dir) => t(s, dir, "orders")
        .withColumn("class",
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "expedite")
            .when(col("o_orderpriority") === "3-MEDIUM", "normal")
            .otherwise("defer"))
        .groupBy(col("class")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("class"))),

    // ---------------- events / incremental (SURVEY §2.8) -----------------

    Op("events_hourly_rollup",
      "time-bucketed rollup of an event stream (TimeSeriesStream.java; " +
        "groupBy(window(ts)) in streaming mode — here its batch equivalent)",
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
             |  count(*) AS cnt, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM events GROUP BY hour, event_type
             |ORDER BY hour, event_type LIMIT 60""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), sum(dec2(col("value"))).cast("double").as("total"))
        .orderBy(col("hour"), col("event_type"))
        .limit(60)),

    Op("events_incremental_pull",
      "topic stream: checkpointed incremental pull of rows newer than the " +
        "stored high-water mark (.../io/stream/TopicStream.java:75-103)",
      Some("""WITH hwm AS (SELECT max(ts) AS mt FROM events)
             |SELECT event_type, count(*) AS cnt FROM events, hwm
             |WHERE ts > mt - INTERVAL 1 DAY
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val e = t(s, dir, "events")
        val hwm = e.agg(max(col("ts")).as("mt"))
        e.crossJoin(broadcast(hwm))
          .where(col("ts") > col("mt") - expr("INTERVAL 1 DAY"))
          .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("event_type"))
      }),

    Op("events_latest_by_key",
      "realtime-get / last-writer-wins dedup: latest row per key " +
        "(handler/component/RealTimeGetComponent.java:105,646-668; " +
        "DistributedUpdateProcessor.java:312-330 versioning)",
      Some("""SELECT user_id, event_id, event_type FROM (
             |  SELECT user_id, event_id, event_type,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events) WHERE rn = 1 AND user_id < 30
             |ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
        t(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1 && col("user_id") < 30)
          .select(col("user_id"), col("event_id"), col("event_type"))
          .orderBy(col("user_id"))
      }),

    Op("json_ingest_extract",
      "JSON ingestion: extract typed values from a JSON payload column " +
        "(handler/loader/JsonLoader.java)",
      Some("""SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
             |  count(*) AS cnt
             |FROM events GROUP BY k_mod ORDER BY k_mod""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .withColumn("k_mod", get_json_object(col("props"), "$.k").cast("int") % 10)
        .groupBy(col("k_mod")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("k_mod")))
  )
}

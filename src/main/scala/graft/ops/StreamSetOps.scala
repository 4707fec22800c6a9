package graft.ops

import org.apache.spark.sql.functions._
import Op.{t, dec2}

/** Round-4 late additions: the last named streaming-expression classes from
  * the reference's solrj-streaming surface that had no dedicated registry op
  * (each was previously covered only implicitly by a sibling op). Paths
  * relative to /root/reference/solr/solrj-streaming/src/java/org/apache/solr/
  * client/solrj/io/.
  *
  * All six are single-shuffle (or shuffle-free) plans: set ops are semi/anti
  * hash joins Catalyst plans freely (broadcast when one side is small, SMJ
  * otherwise under AQE); unique/facet2D group or window strictly PARTITIONED
  * by their bucket key (never a global unpartitioned window); scoreNodes
  * joins a bounded node list (|distinct terms|) against corpus stats.
  */
object StreamSetOps {

  def ops: Seq[Op] = Seq(

    Op("stream_intersect",
      "IntersectStream: emit tuples from streamA that also exist in streamB " +
        "under the field equalitor, A's order preserved (stream/" +
        "IntersectStream.java:36-43 — sorted-merge set intersection). " +
        "Spark-first this is a LEFT SEMI join, not a merge loop: Catalyst " +
        "picks broadcast/SMJ by size, and sortedness is not a precondition. " +
        "Here: lineitems of fulfilled orders, keyed on order id",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "orders").where(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"), "leftsemi")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    Op("stream_complement",
      "ComplementStream: emit tuples from streamA that do NOT exist in " +
        "streamB under the equalitor (stream/ComplementStream.java:37-42). " +
        "LEFT ANTI join; same plan family as stream_intersect",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "orders").where(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"), "leftanti")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    Op("stream_unique",
      "UniqueStream: one tuple per equalitor key — the FIRST in the stream's " +
        "sort order (stream/UniqueStream.java:38-44; DistinctOperation keeps " +
        "the first of each run). Rendered as min(struct(sort-key, ...)) per " +
        "group — a plain partial+final hash agg, no global window, " +
        "deterministic because event_id is unique. Here: each user's " +
        "earliest event under (ts, event_id) order",
      Some("""SELECT user_id, ts, event_id, event_type FROM (
             |  SELECT user_id, ts, event_id, event_type,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin),
      (s, dir) => t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(min(struct(col("ts"), col("event_id"), col("event_type"))).as("m"))
        .select(col("user_id"), col("m.ts").as("ts"),
          col("m.event_id").as("event_id"), col("m.event_type").as("event_type"))
        .orderBy(col("user_id"))),

    Op("facet_2d",
      "Facet2DStream: two-dimensional facet — top dimensionX x-buckets by " +
        "count desc, then top dimensionY y-buckets within each x " +
        "(stream/Facet2DStream.java:52-93, bucketSort '<metric> desc'). " +
        "x = event_type (top 3), y = hour-of-day (top 4 per x); ties broken " +
        "by bucket value asc so the emitted SET is deterministic. One " +
        "groupBy shuffle; the per-x ranking window is PARTITIONED by x",
      Some("""WITH xy AS (SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hour,
             |    count(*) AS cnt FROM events GROUP BY 1, 2),
             |xt AS (SELECT event_type, sum(cnt) AS xcnt,
             |    row_number() OVER (ORDER BY sum(cnt) DESC, event_type) AS xrn
             |  FROM xy GROUP BY event_type),
             |r AS (SELECT xy.event_type, xy.hour, xy.cnt,
             |    row_number() OVER (PARTITION BY xy.event_type ORDER BY xy.cnt DESC, xy.hour) AS yrn
             |  FROM xy JOIN xt ON xy.event_type = xt.event_type WHERE xt.xrn <= 3)
             |SELECT event_type, hour, CAST(cnt AS BIGINT) AS cnt FROM r WHERE yrn <= 4
             |ORDER BY event_type, cnt DESC, hour""".stripMargin),
      (s, dir) => {
        val xy = t(s, dir, "events")
          .groupBy(col("event_type"), hour(col("ts")).cast("bigint").as("hour"))
          .agg(count(lit(1)).as("cnt"))
        // top-3 x buckets: bounded by |distinct event_type|, plain sort+limit
        val xTop = xy.groupBy(col("event_type")).agg(sum(col("cnt")).as("xcnt"))
          .orderBy(col("xcnt").desc, col("event_type")).limit(3)
          .select(col("event_type").as("xt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("cnt").desc, col("hour"))
        xy.join(broadcast(xTop), col("event_type") === col("xt"), "leftsemi")
          .withColumn("yrn", row_number().over(w))
          .where(col("yrn") <= 4)
          .select(col("event_type"), col("hour"), col("cnt"))
          .orderBy(col("event_type"), col("cnt").desc, col("hour"))
      }),

    Op("drill_rollup",
      "DrillStream: push a rollup over the /export sorted stream down to " +
        "each shard replica, then merge the per-shard partials " +
        "(stream/DrillStream.java:43-60; the drill endpoint runs the inner " +
        "expression against the sorted export). Spark's partial+final hash " +
        "aggregation IS this protocol — map-side partials per partition, one " +
        "exchange, final merge — so the rendering is a plain groupBy over " +
        "the export projection with the drill's q param as a pushed filter",
      Some("""SELECT l_suppkey, count(*) AS cnt,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem WHERE l_returnflag = 'R'
             |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin),
      (s, dir) => t(s, dir, "lineitem")
        .where(col("l_returnflag") === "R")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("cnt"), sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(col("l_suppkey"))),

    Op("score_nodes",
      "ScoreNodesStream: tf-idf score the node set of a graph walk — " +
        "nodeScore = (ln(termFreq)+1) * (ln((numDocs+1)/(docFreq+1))+1), " +
        "termFreq = the node's count(*) from gatherNodes, docFreq/numDocs " +
        "from corpus term stats (stream/ScoreNodesStream.java:46-56,238-256). " +
        "Walk: seed users (user_id < 50) -> event_type nodes; corpus doc = " +
        "user, docFreq = users emitting the type. The node list is bounded " +
        "(|distinct terms|) so the stats join broadcasts; score computed " +
        "with the identical double expression shape both sides, rounded 6dp",
      Some("""WITH walk AS (SELECT event_type AS node, count(*) AS term_freq
             |  FROM events WHERE user_id < 50 GROUP BY event_type),
             |stats AS (SELECT event_type AS node,
             |    count(DISTINCT user_id) AS doc_freq FROM events GROUP BY event_type),
             |n AS (SELECT count(DISTINCT user_id) AS num_docs FROM events)
             |SELECT walk.node AS node, term_freq, doc_freq, num_docs,
             |  round((ln(CAST(term_freq AS DOUBLE)) + 1.0) *
             |        (ln((CAST(num_docs AS DOUBLE) + 1.0) / (CAST(doc_freq AS DOUBLE) + 1.0)) + 1.0), 6) AS node_score
             |FROM walk JOIN stats ON walk.node = stats.node CROSS JOIN n
             |ORDER BY walk.node""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val walk = ev.where(col("user_id") < 50)
          .groupBy(col("event_type").as("node")).agg(count(lit(1)).as("term_freq"))
        val stats = ev.groupBy(col("event_type").as("snode"))
          .agg(countDistinct(col("user_id")).as("doc_freq"))
        val n = ev.agg(countDistinct(col("user_id")).as("num_docs"))
        walk.join(broadcast(stats), col("node") === col("snode"))
          .crossJoin(broadcast(n))
          .select(col("node"), col("term_freq"), col("doc_freq"), col("num_docs"),
            round((log(col("term_freq").cast("double")) + 1.0) *
              (log((col("num_docs").cast("double") + 1.0) / (col("doc_freq").cast("double") + 1.0)) + 1.0), 6)
              .as("node_score"))
          .orderBy(col("node"))
      })
  )
}

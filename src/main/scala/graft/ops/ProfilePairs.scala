package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev utility: stage-by-stage timing of the pair-dedup pipeline. */
object ProfilePairs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2fs  $n rows")
    }
    import spark.implicits._
    val w = split(col("text"), " ")
    val minJ = 0.6
    val shingleUdf = udf((ws: Seq[String]) => {
      val out = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + 2 < ws.length) { out.add(ws(i) + " " + ws(i + 1) + " " + ws(i + 2)); i += 1 }
      out.toArray(new Array[String](out.size))
    })
    def docs = spark.read.parquet(s"$dir/documents.parquet")
      .where(size(w) >= 3).select(col("doc_id"), shingleUdf(w).as("sh"))
    time("docs(count)") { spark.read.parquet(s"$dir/documents.parquet").count() }
    time("shingleTable") { docs.count() }
    time("shingleTable2") { docs.count() }
    def sh = docs.select(col("doc_id"), explode(col("sh")).as("s"))
    time("explode") { sh.count() }
    def dfs = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    time("dfs") { dfs.count() }
    def ranked = sh.join(dfs, "s")
      .withColumn("rk", row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    time("ranked") { ranked.count() }
    def prefix = ranked.where(col("rk") <= col("n") - ceil(lit(minJ) * col("n")) + 1)
      .select(col("s"), struct(col("doc_id").as("_1"), col("rk").as("_2"), col("n").as("_3")).as("e"))
    time("prefix") { prefix.count() }
    time("buckets") { prefix.groupBy(col("s")).agg(collect_list(col("e")).as("es")).where(size(col("es")) > 1).count() }
    def cand = prefix.groupBy(col("s")).agg(collect_list(col("e")).as("es"))
      .where(size(col("es")) > 1)
      .select(col("es")).as[Seq[(Long, Int, Long)]]
      .flatMap { es =>
        val arr = es.sortBy(_._1).toArray
        val out = Seq.newBuilder[(Long, Long)]
        var i = 0
        while (i < arr.length) {
          val (ia, ra, na) = arr(i)
          var j = i + 1
          while (j < arr.length) {
            val (jb, rb, nb) = arr(j)
            if (math.min(na, nb) >= minJ * math.max(na, nb)) {
              val alpha = math.ceil(minJ / (1 + minJ) * (na + nb))
              if (1 + math.min(na - ra, nb - rb) >= alpha) out += ((ia, jb))
            }
            j += 1
          }
          i += 1
        }
        out.result()
      }.toDF("i", "j")
    time("cand(raw)") { cand.count() }
    def candD = cand.distinct()
    time("cand(distinct)") { candD.count() }
    val inter = size(array_intersect(col("sha"), col("shb")))
    time("verify") {
      candD
        .join(docs.select(col("doc_id").as("i"), col("sh").as("sha")), "i")
        .join(docs.select(col("doc_id").as("j"), col("sh").as("shb")), "j")
        .withColumn("jac", inter.cast("double") / (size(col("sha")) + size(col("shb")) - inter))
        .where(col("jac") >= minJ).count()
    }
    spark.stop()
  }
}

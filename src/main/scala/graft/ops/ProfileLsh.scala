package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the vec_ann_lsh plan. */
object ProfileLsh {
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
    val op = VectorOps.ops.find(_.name == "vec_ann_lsh").get
    time("full (cold)") { op.run(spark, dir).count() }
    time("full (warm)") { op.run(spark, dir).count() }
    // sub-steps
    val nBits = 8; val nTables = 16; val dim = 64
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val planes: Array[Array[Array[Double]]] = Array.tabulate(nTables, nBits, dim) { (l, b, d) =>
      mix(l * 7368787L + b * 1000003L + d).toDouble / Long.MaxValue
    }
    val bc = spark.sparkContext.broadcast(planes)
    val sigsUdf = udf((v: Seq[Float]) => {
      val ps = bc.value
      val arr = v.toArray
      val n = math.min(dim, arr.length)
      (0 until nTables).map { l =>
        var sig = 0
        var b = 0
        while (b < nBits) {
          val row = ps(l)(b)
          var acc = 0.0
          var d = 0
          while (d < n) { acc += row(d) * arr(d); d += 1 }
          if (acc > 0) sig |= (1 << b)
          b += 1
        }
        (l, sig)
      }
    })
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    time("scan") { e.count() }
    val tabled = e
      .select(col("vec_id"), col("embedding"), explode(sigsUdf(col("embedding"))).as("ts"))
      .select(col("vec_id"), col("embedding"), col("ts._1").as("table"), col("ts._2").as("sig"))
    time("tabled") { tabled.count() }
    time("tabled2") { tabled.count() }
    val probeUdf = udf((sig: Int) => {
      val out = Seq.newBuilder[Int]
      out += sig
      var a = 0
      while (a < nBits) {
        out += (sig ^ (1 << a))
        var b2 = a + 1
        while (b2 < nBits) { out += (sig ^ (1 << a) ^ (1 << b2)); b2 += 1 }
        a += 1
      }
      out.result()
    })
    val probes = tabled.where(col("vec_id") === 0)
      .select(col("table"), explode(probeUdf(col("sig"))).as("sig"), col("embedding").as("qe"))
    time("probes") { probes.count() }
    val joined = tabled.where(col("vec_id") =!= 0)
      .join(broadcast(probes), Seq("table", "sig"))
      .select(col("vec_id"), col("embedding"), col("qe"))
    time("join") { joined.count() }
    val dedup = joined.dropDuplicates("vec_id")
    time("dedup") { dedup.count() }
    spark.stop()
  }
}

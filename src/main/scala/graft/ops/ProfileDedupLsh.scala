package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the vec_dedup_lsh plan.
  *
  * The sub-stages below REPLICATE the op's internals as of r5 (including
  * the (table, sig) repartition at the checkpoint); the authoritative
  * timing is always the "full" rows at the top — if the op changes, trust
  * those and re-sync the stages before trusting the breakdown. */
object ProfileDedupLsh {
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
    val op = VectorOps.ops.find(_.name == "vec_dedup_lsh").get
    time("full (cold)") { op.run(spark, dir).count() }
    time("full (warm)") { op.run(spark, dir).count() }
    // replicate the op's stages with the same parameters
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val nVecs = e.count()
    val nBits = math.min(12, math.max(4,
      (math.log(math.max(1.0, nVecs / 64.0)) / math.log(2)).ceil.toInt))
    val pBit = 1.0 - math.acos(0.45) / math.Pi
    val nTables = math.max(24,
      (math.log(0.05) / math.log(1 - math.pow(pBit, nBits))).ceil.toInt)
    println(s"[prof] n=$nVecs bits=$nBits tables=$nTables")
    val dim = 64
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val planes: Array[Array[Array[Double]]] = Array.tabulate(nTables, nBits, dim) { (l, b, d) =>
      mix(l * 15485863L + b * 32452843L + d * 49979687L).toDouble / Long.MaxValue
    }
    val bc = spark.sparkContext.broadcast(planes)
    val sigsUdf = udf((v: Seq[Float]) => {
      val ps = bc.value
      val arr = v.toArray
      val n = math.min(dim, arr.length)
      (0 until nTables).map { l =>
        var sig = 0L
        var b = 0
        while (b < nBits) {
          val row = ps(l)(b)
          var acc = 0.0
          var d = 0
          while (d < n) { acc += row(d) * arr(d); d += 1 }
          if (acc > 0) sig |= (1L << b)
          b += 1
        }
        (l, sig)
      }
    })
    time("count job") { e.count() }
    val tabled = e
      .select(col("vec_id"), explode(sigsUdf(col("embedding"))).as("ts"))
      .select(col("vec_id"), col("ts._1").as("table"), col("ts._2").as("sig"))
      .repartition(spark.sparkContext.defaultParallelism, col("table"), col("sig"))
      .localCheckpoint()
    time("tabled (checkpoint)") { tabled.count() }
    val cand = tabled.as("a")
      .join(tabled.as("b"),
        col("a.table") === col("b.table") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"))
    time("bucket self-join") { cand.count() }
    val dedup = cand.dropDuplicates("i", "j")
    time("dropDuplicates") { dedup.count() }
    val joined = dedup
      .join(e.select(col("vec_id").as("i"), col("embedding").as("ea")), "i")
      .join(e.select(col("vec_id").as("j"), col("embedding").as("eb")), "j")
    time("vector joins") { joined.count() }
    println("[prof] join plan:")
    joined.explain("simple")
    val out = joined
      .select(col("i"), col("j"), round(VectorOps.cosinePublic(col("ea"), col("eb")), 4).as("cos"))
      .where(col("cos") >= 0.45)
    time("cosine+filter") { out.count() }
    spark.stop()
  }
}

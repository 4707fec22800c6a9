package graft.ops
import org.apache.spark.sql.SparkSession
/** Dev probe: dedup-family prewarm + repeated text_dedup_groups timing. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $label%-18s ${(System.nanoTime()-t0)/1e9}%6.2fs"); r
    }
    t("prewarm")(TextOps.prewarm(spark, dir))
    val op = graft.SparkEntry.allOps.find(_.name == "text_dedup_groups").get
    for (r <- 1 to 3) t(s"groups rep$r")(op.run(spark, dir).count())
    spark.stop()
  }
}

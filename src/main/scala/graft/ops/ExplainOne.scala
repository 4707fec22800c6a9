package graft.ops

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of one registry op.
  * Usage: runMain graft.ops.ExplainOne <sfDir> <opName>
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val op = graft.SparkEntry.allOps.find(_.name == args(1)).get
    println(op.run(spark, args(0)).queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}

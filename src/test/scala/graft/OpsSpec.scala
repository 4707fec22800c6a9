package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Smoke coverage for the operator registry: every SparkEntry query runs on
  * the smallest scale factor and yields a readable schema; the flagship
  * entry returns rows. The value-level correctness of the SQL-oracled ops is
  * gated by the driver's DuckDB compare (scripts/compare_oracle.py locally);
  * search-op score correctness is gated by EngineSpec.
  */
class OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("ops-spec")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered op runs on sf0.001") {
    val failures = SparkEntry.allOps.flatMap { op =>
      try { op.run(spark, sfDir).count(); None }
      catch { case e: Throwable => Some(s"${op.name}: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracleSql only references registered query names") {
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
  }

  test("op names are unique") {
    val ns = SparkEntry.allOps.map(_.name)
    assert(ns.distinct.length == ns.length)
  }

  test("vec_ann_lsh recall@10 >= 0.9 vs exact brute-force top-k") {
    // the LSH path is approximate by design (rows-only in the driver's
    // correctness gate); this pins its QUALITY against the exact op
    def ids(name: String, dir: String): Seq[Long] =
      SparkEntry.queries(name)(spark, dir)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
    val recalls = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").map { dir =>
      val exact = ids("vec_ann_topk", dir).toSet
      val approx = ids("vec_ann_lsh", dir).toSet
      exact.intersect(approx).size.toDouble / exact.size
    }
    assert(recalls.forall(_ >= 0.9), s"recall@10 too low: $recalls")
  }
}

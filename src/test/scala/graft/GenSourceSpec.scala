package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 generator table: correctness, filter pushdown
  * (the generated range narrows), and column pruning. */
class GenSourceSpec extends AnyFunSuite {
  import TestSession._

  private def gen(rows: Long = 10000L, parts: Int = 4): DataFrame =
    spark.read.format("graft.sources.GenSource")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  test("generates the requested range deterministically") {
    val df = gen(rows = 1000L)
    assert(df.count() == 1000)
    val r = df.where(col("id") === 7L)
      .select("bucket", "score", "tok").collect()(0)
    val b = (((7L * 2654435761L) % 2147483647L) % 100).toInt
    assert(r.getInt(0) == b && r.getDouble(1) == b / 100.0 &&
      r.getString(2) == "t7")
  }

  test("id-range filters push into the generator") {
    val df = gen().where(col("id") >= 100L && col("id") < 200L)
    assert(df.count() == 100)
    val scan = df.queryExecution.executedPlan.toString
    // pushed filters appear on the BatchScan, and the scan description
    // carries the narrowed range
    assert(scan.contains("graft_gen[100,200)"), scan)
  }

  test("equality filter narrows to a single row") {
    val df = gen().where(col("id") === 42L)
    assert(df.queryExecution.executedPlan.toString
      .contains("graft_gen[42,43)"))
    assert(df.count() == 1)
  }

  test("column pruning reaches the reader") {
    val df = gen(rows = 100L).select("bucket")
    // the scan's read schema must have dropped the other columns
    val v2Scan = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(v2Scan.contains("bucket") && !v2Scan.contains("tok"), v2Scan)
    assert(df.distinct().count() <= 100)
  }

  test("parallel partitions cover the range exactly once") {
    val df = gen(rows = 99999L, parts = 7)
    assert(df.count() == 99999)
    assert(df.select(countDistinct(col("id"))).collect()(0).getLong(0)
      == 99999)
  }
}

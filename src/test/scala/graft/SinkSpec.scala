package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned parquet sink: write lineitem partitioned by returnflag,
  * read it back, and confirm partition pruning reaches the scan. */
class SinkSpec extends AnyFunSuite {
  import TestSession._

  test("partitioned parquet sink round-trips and prunes partitions") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_sink").toString
    val li = Tables(spark, sfDir).lineitem
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)

    val back = spark.read.parquet(out)
    assert(back.count() == li.count())

    val pruned = back.filter(col("l_returnflag") === "A")
    val expected = li.filter(col("l_returnflag") === "A").count()
    assert(pruned.count() == expected)
    // partition filter appears in the plan (pruned scan, not a filter
    // over all partitions)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("l_returnflag"))
  }
}

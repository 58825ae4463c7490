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

  test("streaming parquet sink is exactly-once across a restart") {
    val base = java.nio.file.Files.createTempDirectory("graft_ssink")
    val srcDir = base.resolve("src").toString
    val outDir = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val ev = Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("value"))

    // batch 1 arrives, stream runs and stops
    ev.where(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(srcDir + "/p1")
    def start() = spark.readStream
      .schema(ev.schema).option("maxFilesPerTrigger", "1")
      .parquet(srcDir + "/p*")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // more data lands while the stream is down; restart from the
    // checkpoint — the first half must NOT be written again
    ev.where(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(srcDir + "/p2")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() == ev.count(), "duplicate or lost rows")
    assert(out.select(countDistinct(col("event_id"))).collect()(0)
      .getLong(0) == ev.count())
  }
}

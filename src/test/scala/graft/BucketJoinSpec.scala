package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables: co-located fact-fact joins with NO exchange — the
  * pre-partitioning strategy SURVEY §4 prescribes for repeated big-big
  * joins at corpus scale (bucket once, join many times shuffle-free). */
class BucketJoinSpec extends AnyFunSuite {
  import TestSession._

  test("bucketed saveAsTable joins without a shuffle exchange") {
    val t = Tables(spark, sfDir)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // the in-memory catalog forgets tables between JVMs but the
    // warehouse directories persist — clear them or the create fails
    for (d <- Seq("li_bucketed", "ord_bucketed")) {
      val p = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), d)
      if (p.exists())
        scala.reflect.io.Directory(p).deleteRecursively()
    }
    t.lineitem.select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    t.orders.select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    // small sf would auto-broadcast (adding a BroadcastExchange);
    // disable it — the point is the big-big co-located join shape
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // both scans are bucketed on the join key: the join needs no
      // Exchange, and the aggregation reuses the bucket partitioning
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    val expected = t.lineitem.join(t.orders,
        col("l_orderkey") === col("o_orderkey")).count()
    val got = spark.table("li_bucketed").join(spark.table("ord_bucketed"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(got == expected)
  }
}

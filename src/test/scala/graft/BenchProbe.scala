package graft

/** Throwaway diagnostic: time a few queries in isolation vs after the
  * suspected poisoning queries, in one fresh session. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(name: String): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
        val t = Tables(spark, "/root/testdata/sf0.01")
    val csvPath = graft.sources.ExternalStage
      .materialize("/root/testdata/sf0.01", "csv_customer", t.customer) { (df, path) =>
        df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
      }
    val jsonPath = graft.sources.ExternalStage
      .materialize("/root/testdata/sf0.01", "json_orders", t.orders) { (df, path) =>
        df.coalesce(1).write.mode("overwrite").json(path)
      }
    val customers = spark.read.option("header", "true").schema(t.customer.schema).csv(csvPath)
    val orders = spark.read.schema(t.orders.schema).json(jsonPath)
    println("PROBE customers " + customers.count())
    println("PROBE orders " + orders.count())
    println("PROBE lineitem " + t.lineitem.count())
    orders.show(3)
    customers.show(3)

    spark.stop()
  }
}

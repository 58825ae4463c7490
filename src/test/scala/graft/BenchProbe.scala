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
    for (_ <- 1 to 5) {
      time("q156_date_spine")
    }
    spark.stop()
  }
}

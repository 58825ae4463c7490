// quick timing harness (not committed)
object TmpTime {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session(master = "local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val sf = "/root/testdata/sf0.1"
    for (q <- args; i <- 1 to 3) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sf).count()
      println(f"[t] $q run$i ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}

package graft.tools

/** Local dev probe: run named registry queries at one sf and print
  * results + timing. Not part of the driver contract.
  * usage: sbt "runMain graft.tools.SmokeOne q224_semdedup ..."
  * (SPARK_GRAFT_SF_DIR selects the scale; default sf0.01) */
object SmokeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Engine.session(master = "local[8]", shufflePartitions = 8)
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      df.show(20, truncate = false)
      println(f"[$name] rows=$n in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

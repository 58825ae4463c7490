// quick timing harness: time named queries, 2 passes each

package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names; pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).collect().length
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[timeq] $n pass$pass $dt%.3f s ($c rows)")
    }
    spark.stop()
  }
}

package graft.tools
import graft._
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(master = "local[4]", shufflePartitions = 4)
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      // warm
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}

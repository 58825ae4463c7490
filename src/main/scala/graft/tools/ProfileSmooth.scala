package graft.tools

import org.apache.spark.sql.functions._
import graft._

/** Throwaway profiling probe for the SMOOTH EWMA front door (r7). */
object ProfileSmooth {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(master = "local[4]", shufflePartitions = 4)
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)
    val daily = t.orders
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).cast("double").as("x"))
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("daily agg only")(daily.count())
    time("series collect")(daily
      .select(col("d").as("t"), col("x"))
      .agg(sort_array(collect_list(struct(col("t"), col("x")))).as("xs"))
      .count())
    time("full ewma op")(
      graft.operators.SmoothOps.ewma(daily, "d", "x", 0.2, 3.0).count())
    daily.createOrReplaceTempView("daily_orders")
    time("front door")(spark
      .sql("GRAFT SMOOTH daily_orders TIME d VALUE x EWMA 0.2 3.0")
      .count())
    spark.stop()
  }
}

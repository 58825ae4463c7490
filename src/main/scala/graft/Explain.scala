package graft

/** Dev utility: print the formatted physical plan for named registry
  * queries (the ".explain and iterate" loop; PlanGuardSpec pins the
  * load-bearing properties, this prints the evidence).
  *
  * Usage: runMain graft.Explain [sfDir] [q1,q2,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q02_filter_project", "q03_join_agg", "q100_asof_exec",
        "q153_band_join", "q54_ann_lsh", "q147_equidepth_hist",
        "q179_knn_classify", "q70_pipeline_e2e", "q199_ppjoin",
        "q201_interval_join")
    val spark = Engine.session(master = "local[4]", shufflePartitions = 4)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n==== $n ====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}

import graft._

/** Per-job / per-stage wall-time profile for one registry query.
  *
  * Usage: runMain graft.tools.Prof <sfDir> <name>[,<name>...] [cpus]
  *
  * Times pass 1 (cold) and pass 2 (warm, the bench's best-of-two
  * measure) with `.count()` — the bench's timed action — and prints
  * every Spark job the pass ran with its duration and stage shapes,
  * so the expensive stage of a multi-job query is visible without
  * the (disabled) UI.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = Engine.session(
      master = s"local[$cpus]", shufflePartitions = cpus)
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_PROF_CONF="k=v;k=v" — ad-hoc session confs for A/B runs
    sys.env.get("GRAFT_PROF_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    // job id -> (start ns, desc); stage info keyed by stage id
    val jobs = mutable.LinkedHashMap.empty[Int, (Long, String)]
    val jobEnd = mutable.LinkedHashMap.empty[Int, Long]
    val stages = mutable.LinkedHashMap.empty[Int, (Int, Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(e.jobId) = (System.nanoTime(),
            Option(e.properties.getProperty("spark.job.description"))
              .getOrElse(""))
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobEnd(e.jobId) = System.nanoTime() }
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val si = e.stageInfo
        val dur = (for {
          a <- si.completionTime; b <- si.submissionTime
        } yield a - b).getOrElse(-1L)
        stages(si.stageId) = (si.numTasks, dur, si.name.take(60))
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm session
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      for (pass <- 1 to 2) {
        jobs.synchronized { jobs.clear(); jobEnd.clear(); stages.clear() }
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val total = (System.nanoTime() - t0) / 1e9
        println(f"==== $name pass$pass: $total%.3f s ====")
        jobs.synchronized {
          jobs.foreach { case (id, (start, desc)) =>
            val dur = jobEnd.get(id)
              .map(e => (e - start) / 1e9).getOrElse(-1.0)
            println(f"  job $id%3d $dur%7.3f s  $desc")
          }
          val slow = stages.toSeq.sortBy(-_._2._2).take(12)
          slow.foreach { case (sid, (nt, dur, nm)) =>
            println(f"  stage $sid%4d ${dur / 1e3}%7.3f s tasks=$nt%3d  $nm")
          }
        }
      }
    }
    spark.stop()
  }
}

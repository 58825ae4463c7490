package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingNaiveBayes

/** The incrementally-maintained naive Bayes model must equal the
  * batch trainer's counts exactly after the stream drains, including
  * across micro-batch boundaries (counts only grow, so the max
  * emission per model cell is the final state). */
class StreamingNaiveBayesSpec extends AnyFunSuite {
  import TestSession._

  test("streamed model equals batch counts across micro-batches") {
    val d = java.nio.file.Files.createTempDirectory("graft_nb_stream")
    val ev = Tables(spark, sfDir).events
    val n = ev.count()
    val firstHalf = ev.limit((n / 2).toInt)
    val secondHalf = ev.exceptAll(firstHalf)
    firstHalf.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("p1").toString)
    secondHalf.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("p2").toString)

    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(d.toString + "/p*")
    val q = StreamingNaiveBayes.model(StreamingNaiveBayes.observations(stream))
      .writeStream.outputMode("update")
      .format("memory").queryName("nb_model_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("nb_model_out")
      .groupBy(col("label"), col("feature"), col("value"))
      .agg(max(col("n")).as("n"), max(col("n_l")).as("n_l"))

    val obs = StreamingNaiveBayes.observations(Tables(spark, sfDir).events)
      .toDF()
    val labelTotals = obs.groupBy(col("label")).agg(count(lit(1)).as("n_l"))
    val batch = obs
      .select(col("label"), lit("f1").as("feature"), col("f1").as("value"))
      .unionByName(obs.select(col("label"), lit("f2").as("feature"),
        col("f2").as("value")))
      .groupBy(col("label"), col("feature"), col("value"))
      .agg(count(lit(1)).as("n"))
      .join(labelTotals, Seq("label"))
      .select(col("label"), col("feature"), col("value"), col("n"),
        col("n_l"))

    assert(streamed.count() > 0)
    assert(streamed.select(batch.columns.map(col): _*).exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed.select(batch.columns.map(col): _*)).isEmpty)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-train / stream-score with a NAMED model: the production
  * pattern for a registry model — GRAFT CREATE CLASSIFIER trains once
  * into the catalog, and each micro-batch is scored against it via
  * foreachBatch (the static k-row model broadcast into every batch's
  * scoring join). The streamed scores over all micro-batches must
  * equal the batch scoring of the same rows exactly. */
class StreamingModelScoreSpec extends AnyFunSuite {
  import TestSession._

  test("micro-batch scoring with a named model equals batch scoring") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE CLASSIFIER msc TARGET label ON embeddings")
    val model = spark.table("graft_model_msc")

    val e = Tables(spark, sfDir).embeddings
    val d = java.nio.file.Files.createTempDirectory("graft_score_stream")
    e.where(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(d.resolve("p1").toString)
    e.where(col("vec_id") % 2 =!= 0).coalesce(1)
      .write.mode("overwrite").parquet(d.resolve("p2").toString)

    val acc = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]()
    val stream = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(d.toString + "/p*")
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.MLOps.assign(batch, model)
          .select(col("vec_id"), col("c_label"))
          .collect()
          .foreach(r => acc.add((r.getLong(0), r.getInt(1))))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = acc.toArray(Array.empty[(Long, Int)]).toSet
    val batchScored = graft.operators.MLOps.assign(e, model)
      .select(col("vec_id"), col("c_label"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(streamed == batchScored)
    assert(streamed.nonEmpty)
  }
}

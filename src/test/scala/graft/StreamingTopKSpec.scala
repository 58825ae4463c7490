package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingTopK

/** Streaming SpaceSaving top-k must agree with exact batch counts in
  * its exact regime (capacity >= distinct terms per group), including
  * across micro-batch boundaries: counts per (group, term) only grow,
  * so the max emission per pair is the final state and must equal the
  * exact groupBy count over everything streamed. */
class StreamingTopKSpec extends AnyFunSuite {
  import TestSession._

  test("streaming top-k equals exact counts across micro-batches") {
    val d = java.nio.file.Files.createTempDirectory("graft_topk_stream")
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("lang"), col("source"))
    val n = docs.count()
    val firstHalf = docs.limit((n / 2).toInt)
    val secondHalf = docs.exceptAll(firstHalf)
    firstHalf.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("p1").toString)
    secondHalf.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("p2").toString)

    val stream = spark.readStream
      .schema(firstHalf.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(d.toString + "/p*")
    // capacity >= distinct sources per lang => exact counts; k =
    // capacity so the final micro-batch emits every tracked term
    val q = StreamingTopK.topK(
        StreamingTopK.keyed(stream, "lang", "source"), k = 64, capacity = 64)
      .writeStream.outputMode("update")
      .format("memory").queryName("topk_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("topk_out")
      .groupBy(col("group"), col("term")).agg(max(col("n")).as("n"))
    val exact = docs
      .groupBy(col("lang").cast("string").as("group"),
        col("source").cast("string").as("term"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(exact).isEmpty &&
      exact.exceptAll(streamed).isEmpty)
  }

  test("per-batch emissions are capped at k") {
    val d = java.nio.file.Files.createTempDirectory("graft_topk_k")
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("lang"), col("source"))
    docs.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("p1").toString)
    val stream = spark.readStream
      .schema(docs.schema)
      .parquet(d.toString + "/p*")
    val q = StreamingTopK.topK(
        StreamingTopK.keyed(stream, "lang", "source"), k = 2, capacity = 64)
      .writeStream.outputMode("update")
      .format("memory").queryName("topk_k_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val perGroup = spark.table("topk_k_out")
      .groupBy(col("group")).agg(countDistinct(col("term")).as("nt"))
      .agg(max(col("nt")).as("m")).head().getLong(0)
    assert(perGroup <= 2)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingPipeline

/** The streaming curation pipeline must keep exactly one doc per
  * canonical form and agree with the batch pipeline on the
  * dedup-invariant totals. (Per-source splits can differ: streaming
  * dedup keeps the first-arrived copy, the batch q70 keeps the
  * lowest doc_id — duplicates may live in different sources.) */
class StreamingPipelineSpec extends AnyFunSuite {
  import TestSession._

  lazy val docsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_pipe_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      d.resolve("documents.parquet"))
    d.toString
  }

  test("streaming curation matches batch totals") {
    val schema = Tables(spark, sfDir).documents.schema
    val stream = spark.readStream.schema(schema).parquet(docsDir)
    val q = StreamingPipeline.curate(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("curated")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("curated")
      .agg(sum(col("n_docs")).as("docs"),
        sum(col("total_tokens")).as("toks")).collect()(0)
    val batch = SparkEntry.queries("q70_pipeline_e2e")(spark, sfDir)
      .agg(sum(col("n_docs")).as("docs"),
        sum(col("total_tokens")).as("toks")).collect()(0)
    // token multisets of duplicates are identical (order-shuffled
    // copies), so totals are invariant to which copy survives
    assert(streamed.getLong(0) == batch.getLong(0))
    assert(streamed.getLong(1) == batch.getLong(1))
  }
}

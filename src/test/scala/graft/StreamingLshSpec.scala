package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps
import graft.streaming.StreamingLshDedup

/** The incremental LSH candidate generator must surface exactly the
  * batch operator's candidate set when no bucket saturates. */
class StreamingLshSpec extends AnyFunSuite {
  import TestSession._

  lazy val docsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_docs_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      d.resolve("documents.parquet"))
    d.toString
  }

  test("streaming LSH candidates equal batch candidates") {
    val schema = Tables(spark, sfDir).documents.schema
    val stream = spark.readStream.schema(schema).parquet(docsDir)
    val q = StreamingLshDedup
      .candidates(stream, "text", k = 16, bands = 4, maxBucket = 100000)
      .writeStream.outputMode("append")
      .format("memory").queryName("lsh_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("lsh_out")
      .select(col("doc_a"), col("doc_b")).distinct()
    val sigs = DedupOps.minhashSignature(
      Tables(spark, sfDir).documents, "text", k = 16)
    val batch = DedupOps.minhashCandidates(
      sigs, "doc_id", k = 16, bands = 4, maxBucket = 100000)

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("bucket cap bounds state and emissions") {
    val schema = Tables(spark, sfDir).documents.schema
    val stream = spark.readStream.schema(schema).parquet(docsDir)
    val q = StreamingLshDedup
      .candidates(stream, "text", k = 16, bands = 4, maxBucket = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("lsh_capped_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    // each bucket emits at most C(3,2)=3 pairs; with 4 bands the
    // per-pair multiplicity is <= 4 — just assert it ran and stayed
    // far below the uncapped candidate count
    val capped = spark.table("lsh_capped_out").count()
    val uncapped = spark.table("lsh_out").count()
    assert(capped < uncapped)
  }
}

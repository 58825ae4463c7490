package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup

/** Drives the stateful streaming dedup over the documents parquet and
  * checks it keeps exactly one doc per canonical key (the batch q48
  * group count). */
class StreamDedupSpec extends AnyFunSuite {
  import TestSession._

  test("streaming stateful dedup keeps one doc per canonical key") {
    val docsDir = {
      val d = java.nio.file.Files.createTempDirectory("graft_docs_stream")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
        d.resolve("documents.parquet"))
      d.toString
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(schema).parquet(docsDir)
    val kept = StreamDedup.dedup(StreamDedup.withCanonKey(stream))
    val q = kept.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("dedup_out").count()
    val batchGroups = SparkEntry.queries("q48_dedup_exact")(spark, sfDir)
      .count()
    assert(streamed == batchGroups)
    // keys are unique in the output
    val dups = spark.table("dedup_out")
      .groupBy(col("canon_key")).count().where(col("count") > 1).count()
    assert(dups == 0)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingWindowDedup

/** The incremental span-dedup monitor must agree with the batch q232
  * window accounting: every batch-duplicated hash is reported exactly
  * once, including duplications that only complete across micro-batch
  * boundaries. */
class StreamingWindowDedupSpec extends AnyFunSuite {
  import TestSession._

  test("streamed duplicated spans equal the batch duplicated hashes") {
    // two files -> two micro-batches: cross-batch duplicates must
    // complete against carried state, not just within-batch ones
    val docs = Tables(spark, sfDir).documents
    val d = java.nio.file.Files.createTempDirectory("graft_windedup")
    docs.where(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$d/p1")
    docs.where(col("doc_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$d/p2")

    val stream = spark.readStream.schema(docs.schema).parquet(s"$d/p*")
    val q = StreamingWindowDedup.dupSpans(stream, "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("windedup_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("windedup_out")
    // batch truth: hashes occurring more than once corpus-wide
    val batchDup = StreamingWindowDedup.windowHashes(docs, "text")
      .groupBy(col("h")).agg(count(lit(1)).as("occ"))
      .where(col("occ") > 1).select(col("h"))

    assert(streamed.count() > 0, "no duplicated spans found at all")
    // exactly one report per duplicated hash
    assert(streamed.groupBy(col("h")).count()
      .where(col("count") > 1).isEmpty)
    assert(streamed.select(col("h")).exceptAll(batchDup).isEmpty &&
      batchDup.exceptAll(streamed.select(col("h"))).isEmpty)
    // every report fired at the moment the hash became duplicated
    assert(streamed.where(col("occ") < 2).isEmpty)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingAnn

/** Micro-batched ANN serving must return EXACTLY what one batch probe
  * of the same queries returns — per-query results cannot depend on
  * how the query stream happens to be chopped into micro-batches.
  * Queries are staged as several parquet files and drained one file
  * per trigger, so the stream genuinely crosses batch boundaries. */
class StreamingAnnSpec extends AnyFunSuite {
  import TestSession._

  test("streamed IVF probe == batch probe, across micro-batches") {
    val e = Tables(spark, sfDir).embeddings
    val corpus = e.where(col("vec_id") >= 10)
    val queries = e.where(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))

    val cents = StreamingAnn.centroids(corpus, 16)
    val lists = StreamingAnn.assignLists(corpus, 16).persist()
    lists.count()

    // stage queries as 5 files -> 5 micro-batches at 1 file/trigger
    val dir = java.nio.file.Files.createTempDirectory("graft_annq")
    queries.repartition(5).write.mode("overwrite")
      .parquet(s"$dir/queries")
    val sink = s"$dir/results"

    val stream = spark.readStream
      .schema(queries.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/queries")
    val q = StreamingAnn.serve(stream, lists, cents,
      nprobe = 2, k = 5, sinkPath = sink)
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(sink)
    val batch = StreamingAnn.probe(queries, lists, cents, 2, 5)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "micro-batched ANN serving diverged from the one-shot batch probe")
    // every query got answers, ranks are 1..k
    val perQ = streamed.groupBy(col("q_id"))
      .agg(count(lit(1)).as("n"), max(col("rk")).as("mx"),
        min(col("rk")).as("mn"))
      .collect()
    assert(perQ.length == 10)
    assert(perQ.forall(r => r.getAs[Long]("n") == 5 &&
      r.getAs[Int]("mx") == 5 && r.getAs[Int]("mn") == 1))
    lists.unpersist()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextSearchOps

/** Incremental index maintenance must be EXACT: build-then-append
  * equals a from-scratch rebuild — same postings, same doc lengths,
  * same merged stats, and therefore byte-identical BM25 scores. */
class IncrementalIndexSpec extends AnyFunSuite {
  import TestSession._

  private val terms = Seq("hash", "merge", "scan")

  private def contentEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def assertSameIndex(idxA: String, idxB: String): Unit = {
    val pA = spark.read.parquet(s"$idxA/postings")
    val pB = spark.read.parquet(s"$idxB/postings")
    assert(contentEqual(pA, pB), "postings diverge")
    assert(contentEqual(
      spark.read.parquet(s"$idxA/doclen"),
      spark.read.parquet(s"$idxB/doclen")), "doclen diverges")
    val sA = spark.read.parquet(s"$idxA/stats").head()
    val sB = spark.read.parquet(s"$idxB/stats").head()
    assert(sA.getAs[Double]("n_docs") == sB.getAs[Double]("n_docs"))
    // bit-identical, not approximately equal: the merge is exact
    assert(sA.getAs[Double]("avgdl") == sB.getAs[Double]("avgdl"))
    assert(sA.getAs[Double]("sum_dl") == sB.getAs[Double]("sum_dl"))
    val rA = TextSearchOps.bm25Indexed(spark, idxA, "doc_id", terms, 10)
      .collect().toSeq
    val rB = TextSearchOps.bm25Indexed(spark, idxB, "doc_id", terms, 10)
      .collect().toSeq
    assert(rA == rB, "BM25 results diverge between the two indexes")
  }

  test("append-maintained index equals the full rebuild") {
    val docs = Tables(spark, sfDir).documents
    val base = java.nio.file.Files
      .createTempDirectory("graft_incidx").toString
    val half1 = docs.where(col("doc_id") % 2 === 0)
    val half2 = docs.where(col("doc_id") % 2 === 1)

    TextSearchOps.buildIndex(docs, "doc_id", "text", s"$base/full")
    TextSearchOps.buildIndex(half1, "doc_id", "text", s"$base/inc")
    TextSearchOps.appendToIndex(half2, "doc_id", "text", s"$base/inc")

    assertSameIndex(s"$base/inc", s"$base/full")
  }

  test("streaming maintenance under Trigger.AvailableNow is exact") {
    val docs = Tables(spark, sfDir).documents
    val base = java.nio.file.Files
      .createTempDirectory("graft_stridx").toString
    val half1 = docs.where(col("doc_id") % 2 === 0)
    val half2 = docs.where(col("doc_id") % 2 === 1)
    TextSearchOps.buildIndex(docs, "doc_id", "text", s"$base/full")

    // corpus grows between scheduler runs; each run drains only the
    // new files (checkpointed) and extends the index
    half1.coalesce(1).write.parquet(s"$base/in/p1")
    graft.streaming.StreamingIndexer.maintainAvailableNow(
      spark, s"$base/in/p*", docs.schema, "doc_id", "text",
      s"$base/inc", s"$base/ckpt")
    assert(TextSearchOps.indexComplete(s"$base/inc"))

    half2.coalesce(1).write.parquet(s"$base/in/p2")
    graft.streaming.StreamingIndexer.maintainAvailableNow(
      spark, s"$base/in/p*", docs.schema, "doc_id", "text",
      s"$base/inc", s"$base/ckpt")

    assertSameIndex(s"$base/inc", s"$base/full")
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MatViewOps
import graft.streaming.StreamingMatView

/** The streaming-maintained view must equal the direct full aggregate
  * over everything that has arrived — across micro-batch boundaries
  * and across separate AvailableNow invocations (restart with the
  * same checkpoint = process only the new files). */
class StreamingMatViewSpec extends AnyFunSuite {
  import TestSession._

  private val keys = Seq("source", "lang")
  private def ntok = size(split(col("text"), " "))

  private def canon(df: DataFrame): Seq[(String, String, Long, Long)] =
    df.select(col("source"), col("lang"), col("n_rows"), col("n_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

  test("AvailableNow maintenance equals the full aggregate, incl. restart") {
    val root = Files.createTempDirectory("graft_smv").toFile
    val factDir = new java.io.File(root, "fact").toString
    val viewPath = new java.io.File(root, "view").toString
    val ckpt = new java.io.File(root, "ckpt").toString
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
    val schema = docs.schema

    // first arrival: two source slices land as separate files
    val sources = docs.select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted
    val (first, later) = sources.splitAt(2)
    first.foreach { s =>
      docs.where(col("source") === s).coalesce(1)
        .write.mode("append").parquet(factDir)
    }
    StreamingMatView.maintainAvailableNow(
      spark, factDir, schema, keys, ntok, viewPath, ckpt)
    val expectFirst = canon(MatViewOps.partial(
      docs.where(col("source").isin(first: _*)), keys, ntok))
    assert(canon(MatViewOps.read(spark, viewPath)) == expectFirst,
      "view after first drain diverges")

    // later arrival + RESTART with the same checkpoint: only the new
    // files fold in, and the result is as if everything aggregated at
    // once
    later.foreach { s =>
      docs.where(col("source") === s).coalesce(1)
        .write.mode("append").parquet(factDir)
    }
    StreamingMatView.maintainAvailableNow(
      spark, factDir, schema, keys, ntok, viewPath, ckpt)
    val expectAll = canon(MatViewOps.partial(docs, keys, ntok))
    assert(canon(MatViewOps.read(spark, viewPath)) == expectAll,
      "view after restart drain diverges from the full aggregate")
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MatViewOps

/** Incremental materialized-view maintenance must be EXACT: merging
  * per-delta partial aggregates — in any batching and any order —
  * equals the direct full aggregate, and each refresh leaves a
  * readable generation behind (copy-on-write swap). */
class IncrementalMatViewSpec extends AnyFunSuite {
  import TestSession._

  private val keys = Seq("source", "lang")
  private def ntok = size(split(col("text"), " "))

  private def docs = Tables(spark, sfDir).documents

  private def full: Seq[(String, String, Long, Long)] =
    canon(MatViewOps.partial(docs, keys, ntok))

  private def canon(df: DataFrame): Seq[(String, String, Long, Long)] =
    df.select(col("source"), col("lang"), col("n_rows"), col("n_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

  private def freshPath(tag: String): String =
    new java.io.File(
      Files.createTempDirectory(s"graft_mv_$tag").toFile, "view").toString

  test("per-source refreshes converge to the direct full aggregate") {
    val view = freshPath("fwd")
    val sources = docs.select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted
    sources.foreach { s =>
      MatViewOps.refresh(spark, view,
        MatViewOps.partial(docs.where(col("source") === s), keys, ntok),
        keys)
    }
    assert(canon(MatViewOps.read(spark, view)) == full)
  }

  test("refresh order and delta batching do not change the view") {
    val view = freshPath("rev")
    val sources = docs.select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted.reverse
    // reversed order, and the first two sources folded as ONE delta
    val (head, rest) = sources.splitAt(2)
    MatViewOps.refresh(spark, view,
      MatViewOps.partial(docs.where(col("source").isin(head: _*)),
        keys, ntok), keys)
    rest.foreach { s =>
      MatViewOps.refresh(spark, view,
        MatViewOps.partial(docs.where(col("source") === s), keys, ntok),
        keys)
    }
    assert(canon(MatViewOps.read(spark, view)) == full)
  }

  test("a refresh is key-bounded: re-adding a delta doubles only its keys") {
    val view = freshPath("dup")
    MatViewOps.refresh(spark, view,
      MatViewOps.partial(docs, keys, ntok), keys)
    val s0 = docs.select(col("source")).orderBy(col("source"))
      .head().getString(0)
    MatViewOps.refresh(spark, view,
      MatViewOps.partial(docs.where(col("source") === s0), keys, ntok),
      keys)
    val after = canon(MatViewOps.read(spark, view))
    val expect = full.map {
      case (src, lang, n, t) if src == s0 => (src, lang, 2 * n, 2 * t)
      case other => other
    }
    assert(after == expect)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VersionedTable
import graft.streaming.StreamingSnapshots

/** Streaming snapshot ingestion (streaming/StreamingSnapshots): each
  * drained micro-batch commits one immutable version; the latest
  * version equals the batch read of everything ingested so far, and
  * a second incremental run appends new versions without touching the
  * old ones. */
class StreamingSnapshotsSpec extends AnyFunSuite {
  import TestSession._

  test("available-now ingestion commits versions that match batch") {
    val d = java.nio.file.Files.createTempDirectory("graft_snapstream")
    val root = d.resolve("vt").toString
    val ckpt = d.resolve("ckpt").toString
    val src = d.toString + "/in"
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val n = docs.count()
    val first = docs.limit((n / 2).toInt)
    val second = docs.exceptAll(first)

    first.coalesce(1).write.mode("overwrite").parquet(src + "/p1")
    StreamingSnapshots.ingestAvailableNow(
      spark, src + "/p*", docs.schema, root, ckpt)
    val v0 = VersionedTable.latestVersion(root)
    assert(v0 >= 0)
    assert(VersionedTable.read(spark, root, v0).count() == first.count())

    second.coalesce(1).write.mode("overwrite").parquet(src + "/p2")
    StreamingSnapshots.ingestAvailableNow(
      spark, src + "/p*", docs.schema, root, ckpt)
    val v1 = VersionedTable.latestVersion(root)
    assert(v1 > v0, "second run must commit a NEW version")
    // pinned old version untouched (snapshot isolation)
    assert(VersionedTable.read(spark, root, v0).count() == first.count())
    // latest == batch union of everything ingested
    val latest = VersionedTable.read(spark, root, v1)
    assert(latest.count() == n)
    assert(latest.exceptAll(docs).isEmpty &&
      docs.exceptAll(latest).isEmpty,
      "latest snapshot must equal the batch read")
    // version log row counts strictly increase
    val hist = VersionedTable.history(spark, root).collect()
      .sortBy(_.getInt(0)).map(_.getLong(1))
    assert(hist.zip(hist.tail).forall { case (a, b) => a < b })
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CollectBatchWrite, CollectSink, CollectWriterFactory}

/** The DSv2 batch sink must implement the two-phase commit protocol:
  * nothing is visible before the driver-side commit, aborted task
  * attempts never leak rows, and append/overwrite modes compose. */
class CollectSinkSpec extends AnyFunSuite {
  import TestSession._

  test("end-to-end: append and overwrite publish exactly the input") {
    CollectSink.clear("t1")
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("lang")).limit(100)
    docs.write.format("graft.sources.CollectSink")
      .option("table", "t1").mode("append").save()
    assert(CollectSink.rows("t1").size == 100)

    docs.write.format("graft.sources.CollectSink")
      .option("table", "t1").mode("append").save()
    assert(CollectSink.rows("t1").size == 200, "append must accumulate")

    docs.write.format("graft.sources.CollectSink")
      .option("table", "t1").mode("overwrite").save()
    assert(CollectSink.rows("t1").size == 100, "overwrite must replace")

    val expected = docs.collect().map(r => Seq(r.get(0), r.get(1))).toSet
    assert(CollectSink.rows("t1").toSet == expected)
    CollectSink.clear("t1")
  }

  test("protocol: uncommitted and aborted attempts publish nothing") {
    CollectSink.clear("t2")
    val schema = StructType(Seq(StructField("x", LongType)))
    val factory = new CollectWriterFactory(schema)

    // attempt 0 writes rows then aborts (simulated task failure)
    val w0 = factory.createWriter(0, 0L)
    w0.write(InternalRow(1L)); w0.write(InternalRow(2L))
    w0.abort()
    assert(CollectSink.rows("t2").isEmpty, "abort leaked rows")

    // attempt 1 commits at task level — still not visible until the
    // driver's job-level commit
    val w1 = factory.createWriter(0, 1L)
    w1.write(InternalRow(1L)); w1.write(InternalRow(2L))
    val msg = w1.commit()
    assert(CollectSink.rows("t2").isEmpty, "task commit must not publish")

    val bw = new CollectBatchWrite("t2", schema, replace = false)
    bw.commit(Array[WriterCommitMessage](msg))
    assert(CollectSink.rows("t2") == Vector(Seq(1L), Seq(2L)))

    // a job-level abort of a second write leaves the table untouched
    val w2 = factory.createWriter(0, 2L)
    w2.write(InternalRow(3L))
    val msg2 = w2.commit()
    new CollectBatchWrite("t2", schema, replace = false)
      .abort(Array[WriterCommitMessage](msg2))
    assert(CollectSink.rows("t2") == Vector(Seq(1L), Seq(2L)))
    CollectSink.clear("t2")
  }
}

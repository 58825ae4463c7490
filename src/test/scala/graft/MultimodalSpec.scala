package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSession._

  test("binary payload pipeline: schema, partition batches, features") {
    val docs = Tables(spark, sfDir).documents
    val media = Multimodal.asMediaTable(docs).repartition(4)
    val feats = Multimodal.extractFeatures(media)

    assert(feats.rdd.getNumPartitions == 4)
    val n = docs.count()
    assert(feats.count() == n)

    // deterministic stub features agree with SQL-side octet math
    val joined = feats.toDF().join(docs, Seq("doc_id"))
    val bad = joined.filter(
      col("n_bytes") =!= length(col("text")) ||
      col("stub_width") =!= col("n_bytes") % 640).count()
    assert(bad == 0)
  }

  test("resize bounds payload size; frame sampling fans out in-partition") {
    val docs = Tables(spark, sfDir).documents
    val media = Multimodal.asMediaTable(docs).repartition(4)

    val resized = Multimodal.resize(media, maxBytes = 100)
    // stride downsample: ceil(len/stride) bytes, stride=floor(len/100)
    assert(resized.collect().forall(_.payload.length <= 201))

    val frames = Multimodal.sampleFrames(media, nFrames = 4)
    assert(frames.count() == docs.count() * 4)
    assert(frames.rdd.getNumPartitions == 4, "fan-out must not shuffle")
    // frames tile the payload prefix deterministically
    val f0 = frames.filter(_.doc_id == 0).collect().sortBy(_.frame_id)
    assert(f0.map(_.frame_id).toSeq == Seq(0, 1, 2, 3))
  }
}

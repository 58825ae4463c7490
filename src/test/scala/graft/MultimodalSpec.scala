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
}

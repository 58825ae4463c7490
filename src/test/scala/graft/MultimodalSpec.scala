package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Multimodal

/** Real BMP decode over binary media columns: codec round-trip,
  * partition-wise batch shape, resize and frame ops producing valid
  * re-encoded images. */
class MultimodalSpec extends AnyFunSuite {
  import TestSession._

  test("BMP codec round-trip: encode then decode recovers the image") {
    // a gradient image with every edge case the decoder must honor:
    // odd width (row padding), asymmetric dims, BGR order, bottom-up
    val bytes = Multimodal.encodeBmp(5, 3,
      (x, y) => (10 + x + y, 20 + y, 30 + x))
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    // 5*3 bytes/px = 15-byte rows pad to 16
    assert(bytes.length == 54 + 16 * 3)
    val (w, h, mr, mg, mb) = Multimodal.decodeBmp(bytes)
    assert(w == 5 && h == 3)
    assert(math.abs(mr - (10 + 2 + 1)) < 1e-9) // mean x = 2, mean y = 1
    assert(math.abs(mg - (20 + 1)) < 1e-9)
    assert(math.abs(mb - (30 + 2)) < 1e-9)
  }

  test("codec round-trips random images exactly (all widths mod 4)") {
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 20) {
      // widths 1..8 cover every row-padding residue; random pixels
      val w = 1 + rnd.nextInt(8); val h = 1 + rnd.nextInt(6)
      val px = Array.fill(h, w)((rnd.nextInt(256), rnd.nextInt(256),
        rnd.nextInt(256)))
      val bytes = Multimodal.encodeBmp(w, h, (x, y) => px(y)(x))
      val (dw, dh, mr, mg, mb) = Multimodal.decodeBmp(bytes)
      assert(dw == w && dh == h)
      val n = (w * h).toDouble
      def mean(f: ((Int, Int, Int)) => Int) =
        px.flatten.map(f).sum / n
      assert(math.abs(mr - mean(_._1)) < 1e-9)
      assert(math.abs(mg - mean(_._2)) < 1e-9)
      assert(math.abs(mb - mean(_._3)) < 1e-9)
    }
  }

  test("binary payload pipeline: schema, partition batches, features") {
    val docs = Tables(spark, sfDir).documents
    val media = Multimodal.asMediaTable(docs).repartition(4)
    val feats = Multimodal.extractFeatures(media)

    assert(feats.rdd.getNumPartitions == 4)
    val n = docs.count()
    assert(feats.count() == n)

    // decoded dimensions match the synthesis formulas end-to-end
    val bad = feats.toDF().filter(
      col("width") =!= lit(8) + col("doc_id") % 9 ||
      col("height") =!= lit(8) + col("doc_id") % 7).count()
    assert(bad == 0)
  }

  test("resize decodes, downscales, re-encodes a valid image") {
    val docs = Tables(spark, sfDir).documents
    val media = Multimodal.asMediaTable(docs).repartition(4)
    val resized = Multimodal.resize(media, maxEdge = 8)
    val checked = resized.collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      val (w, h, _, _, _) = Multimodal.decodeBmp(r.payload)
      assert(w <= 8 && h <= 8, s"doc ${r.doc_id} resized to ${w}x$h")
    }
  }

  test("frame sampling fans out in-partition to valid per-band images") {
    val docs = Tables(spark, sfDir).documents
    val media = Multimodal.asMediaTable(docs).repartition(4)
    val frames = Multimodal.sampleFrames(media, nFrames = 4)
    assert(frames.count() == docs.count() * 4)
    assert(frames.rdd.getNumPartitions == 4, "fan-out must not shuffle")
    // bands of one image: same width, heights sum to the original's
    val f0 = frames.filter(_.doc_id == 0L).collect().sortBy(_.frame_id)
    assert(f0.map(_.frame_id).toSeq == Seq(0, 1, 2, 3))
    val dims = f0.map(f => Multimodal.decodeBmp(f.payload))
    assert(dims.map(_._1).distinct.length == 1)
    assert(dims.map(_._2).sum == Multimodal.synthHeight(0L))
  }

  test("aHash is brightness-offset invariant and geometry-sensitive") {
    // same dimensions, different color offsets -> identical hash
    // (every cell shifts with the global mean)
    def grad(w: Int, h: Int, r0: Int, g0: Int, b0: Int) =
      Multimodal.encodeBmp(w, h, (x, y) => (r0 + x + y, g0 + y, b0 + x))
    val a = Multimodal.aHash64(grad(12, 10, 10, 20, 30))
    val b = Multimodal.aHash64(grad(12, 10, 90, 5, 60))
    assert(a == b)
    assert(a.length == 64 && a.forall(c => c == '0' || c == '1'))
    // a structurally different image (vertical-only gradient) must
    // hash differently
    val c = Multimodal.aHash64(
      Multimodal.encodeBmp(12, 10, (_, y) => (10 + 4 * y, 10, 10)))
    assert(a != c)
    // constant image: no cell exceeds the mean -> all zero bits
    val d = Multimodal.aHash64(
      Multimodal.encodeBmp(9, 8, (_, _) => (50, 50, 50)))
    assert(d == "0" * 64)
  }
}

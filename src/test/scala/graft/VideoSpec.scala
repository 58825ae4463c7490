package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Multimodal, Video}

/** Real Y4M decode over binary video columns: container round-trip,
  * motion energy, frame extraction transcoding to valid BMPs. */
class VideoSpec extends AnyFunSuite {
  import TestSession._

  test("y4m codec round-trip: header, frames, luma stats") {
    val w = 4; val h = 3
    val f0 = Array.tabulate(w * h)(i => (10 + i).toByte)
    val f1 = Array.tabulate(w * h)(i => (15 + i).toByte) // +5 shift
    val bytes = Video.encodeY4m(w, h, 30, Array(f0, f1), 100, 110)
    val (dw, dh, fps, nf, first, last, motion) = Video.decodeY4m(bytes)
    assert(dw == w && dh == h && fps == 30 && nf == 2)
    val exp0 = (0 until w * h).map(10 + _).sum.toDouble / (w * h)
    assert(math.abs(first - exp0) < 1e-9)
    assert(math.abs(last - (exp0 + 5)) < 1e-9)
    assert(math.abs(motion - 5.0) < 1e-9)
  }

  test("decoder validates container: magic, chroma, truncation") {
    intercept[IllegalArgumentException] {
      Video.decodeY4m("MPEG4 nope\n".getBytes("US-ASCII"))
    }
    val good = Video.synthY4m(7)
    intercept[IllegalArgumentException] {
      // C420 header is rejected (only C444 planes are walked)
      val s = new String(good, "ISO-8859-1").replace("C444", "C420")
      Video.decodeY4m(s.getBytes("ISO-8859-1"))
    }
    intercept[IllegalArgumentException] {
      Video.decodeY4m(java.util.Arrays.copyOf(good, good.length - 10))
    }
  }

  test("synthesis closed forms hold for random doc ids") {
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 30) {
      val id = math.abs(rnd.nextLong() % 1000000)
      val (w, h, f) = Video.synthParams(id)
      val y0 = (id % 100).toInt
      val (dw, dh, fps, nf, first, last, motion) =
        Video.decodeY4m(Video.synthY4m(id))
      assert(dw == w && dh == h && fps == 25 && nf == f)
      val exp = y0 + (w - 1) / 2.0 + (h - 1) / 2.0
      assert(math.abs(first - exp) < 1e-9)
      assert(math.abs(last - (exp + 2 * (f - 1))) < 1e-9)
      assert(math.abs(motion - 2.0) < 1e-9)
    }
  }

  test("frame extraction transcodes every frame to a valid BMP") {
    val docs = Tables(spark, sfDir).documents.limit(25)
    val video = Video.asVideoTable(docs)
    val frames = Video.extractFrames(video)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    // frame count per doc matches the decoded stream
    val perDoc = rows.groupBy(_.doc_id).view.mapValues(_.length).toMap
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      assert(perDoc(id) == Video.synthParams(id)._3)
    }
    // each extracted frame decodes as a BMP whose channel means equal
    // the frame's luma mean (grayscale transcode)
    rows.take(10).foreach { fr =>
      val (w, h, mr, mg, mb) = Multimodal.decodeBmp(fr.payload)
      val (sw, sh, _) = Video.synthParams(fr.doc_id)
      assert(w == sw && h == sh)
      val y0 = (fr.doc_id % 100).toInt
      val exp = y0 + (w - 1) / 2.0 + (h - 1) / 2.0 + 2 * fr.frame_id
      assert(math.abs(mr - exp) < 1e-9)
      assert(mr == mg && mg == mb)
    }
  }

  test("q244 runs and matches closed forms at sf0.001") {
    val df = SparkEntry.queries("q244_video_decode")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length > 0)
    rows.take(20).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h, f) = Video.synthParams(id)
      assert(r.getAs[Int]("width") == w)
      assert(r.getAs[Int]("n_frames") == f)
      assert(r.getAs[Double]("motion_energy") == 2.0)
    }
  }
}

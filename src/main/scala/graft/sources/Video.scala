package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Video third of the multimodal column family (images: [[Multimodal]],
  * audio: [[Audio]]). Payloads are genuine YUV4MPEG2 (.y4m) streams —
  * the public uncompressed-video interchange format (mjpegtools): an
  * ASCII stream header `YUV4MPEG2 W.. H.. F..:.. Ip A1:1 C444\n`, then
  * per frame an ASCII `FRAME\n` marker followed by planar Y, U, V
  * bytes. The decoder does real container work: it parses the header
  * tags (width/height/rate/chroma), validates C444, walks the frame
  * markers, and folds the luma planes for per-frame statistics and
  * inter-frame motion energy (mean |ΔY| between consecutive frames —
  * the zero-dependency stand-in for codec motion estimation).
  *
  * Synthesis gives every statistic a closed form the q244 oracle
  * recomputes from doc_id alone:
  *   w = 8+(id%5), h = 8+(id%3), frames f = 4+(id%4), 25 fps,
  *   Y(x,y,t) = y0 + x + y + 2t with y0 = id%100 (max 135 < 255 — no
  *   wrap) ⇒ frame-t mean luma = y0 + (w-1)/2 + (h-1)/2 + 2t and
  *   motion energy = 2 exactly; U/V are constant planes.
  *
  * Scale shape: 1-in/1-out `mapPartitions` decode (codec init per
  * partition, no shuffle); frame extraction is a flatMap fan-out that
  * RE-ENCODES each luma plane as a standalone grayscale BMP via
  * [[Multimodal.encodeBmp]] — a real cross-container transcode.
  */
object Video {

  case class VideoRow(doc_id: Long, payload: Array[Byte], meta_lang: String)
  case class VideoFeatures(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int,
      fps: Int, duration_ms: Double, mean_luma_first: Double,
      mean_luma_last: Double, motion_energy: Double, meta_lang: String)
  case class VideoFrame(
      doc_id: Long, frame_id: Int, payload: Array[Byte], meta_lang: String)

  // ----------------------------------------------------------------
  // Real Y4M codec (C444 planar). Public format spec; zero deps.
  // ----------------------------------------------------------------

  /** Encode frames of (Y, U, V) planes as a C444 Y4M stream.
    * `luma(t)(y*w + x)` is the Y plane of frame t; U/V constant. */
  def encodeY4m(w: Int, h: Int, fps: Int, lumaFrames: Array[Array[Byte]],
      u: Int, v: Int): Array[Byte] = {
    val header = s"YUV4MPEG2 W$w H$h F$fps:1 Ip A1:1 C444\n"
      .getBytes("US-ASCII")
    val frameMark = "FRAME\n".getBytes("US-ASCII")
    val planeSize = w * h
    val out = new java.io.ByteArrayOutputStream(
      header.length + lumaFrames.length * (frameMark.length + 3 * planeSize))
    out.write(header)
    val uPlane = Array.fill[Byte](planeSize)(u.toByte)
    val vPlane = Array.fill[Byte](planeSize)(v.toByte)
    lumaFrames.foreach { y =>
      require(y.length == planeSize)
      out.write(frameMark); out.write(y); out.write(uPlane); out.write(vPlane)
    }
    out.toByteArray
  }

  private case class Y4mHeader(w: Int, h: Int, fps: Int, dataOff: Int)

  private def parseHeader(b: Array[Byte]): Y4mHeader = {
    var nl = 0
    while (nl < b.length && b(nl) != '\n') nl += 1
    require(nl < b.length, "no y4m header terminator")
    val header = new String(b, 0, nl, "US-ASCII")
    val parts = header.split(' ')
    require(parts(0) == "YUV4MPEG2", "not a YUV4MPEG2 payload")
    var w = -1; var h = -1; var fps = -1; var chroma = "C420jpeg"
    parts.drop(1).foreach { tag =>
      tag.headOption match {
        case Some('W') => w = tag.tail.toInt
        case Some('H') => h = tag.tail.toInt
        case Some('F') => fps = tag.tail.takeWhile(_ != ':').toInt
        case Some('C') => chroma = tag
        case _ => // interlace/aspect/extension tags ignored
      }
    }
    require(w > 0 && h > 0 && fps > 0, s"incomplete y4m header: $header")
    require(chroma == "C444", s"only C444 supported, got $chroma")
    Y4mHeader(w, h, fps, nl + 1)
  }

  /** Walk the FRAME markers and fold luma planes: (w, h, fps, nFrames,
    * meanLumaFirst, meanLumaLast, motionEnergy). Motion energy is the
    * mean absolute luma delta between consecutive frames (0.0 for a
    * single-frame stream). */
  def decodeY4m(bytes: Array[Byte])
      : (Int, Int, Int, Int, Double, Double, Double) = {
    val hd = parseHeader(bytes)
    val planeSize = hd.w * hd.h
    val frameBytes = 3 * planeSize
    var off = hd.dataOff
    var nFrames = 0
    var first = 0.0; var last = 0.0
    var prev: Array[Byte] = null
    var motionSum = 0.0
    while (off < bytes.length) {
      // FRAME marker line (parameters after FRAME allowed, to \n)
      require(off + 5 <= bytes.length &&
        new String(bytes, off, 5, "US-ASCII") == "FRAME",
        s"bad frame marker at $off")
      while (bytes(off) != '\n') off += 1
      off += 1
      require(off + frameBytes <= bytes.length, "truncated frame")
      var sum = 0L
      var i = 0
      while (i < planeSize) { sum += bytes(off + i) & 0xff; i += 1 }
      val mean = sum.toDouble / planeSize
      if (nFrames == 0) first = mean
      last = mean
      if (prev != null) {
        var d = 0L; var j = 0
        while (j < planeSize) {
          d += math.abs((bytes(off + j) & 0xff) - (prev(j) & 0xff)); j += 1
        }
        motionSum += d.toDouble / planeSize
      }
      prev = java.util.Arrays.copyOfRange(bytes, off, off + planeSize)
      nFrames += 1
      off += frameBytes
    }
    require(nFrames > 0, "no frames")
    val motion = if (nFrames > 1) motionSum / (nFrames - 1) else 0.0
    (hd.w, hd.h, hd.fps, nFrames, first, last, motion)
  }

  // ----------------------------------------------------------------
  // Deterministic synthesis (closed forms — see header).
  // ----------------------------------------------------------------

  def synthParams(docId: Long): (Int, Int, Int) =
    (8 + (docId % 5).toInt, 8 + (docId % 3).toInt, 4 + (docId % 4).toInt)

  def synthY4m(docId: Long): Array[Byte] = {
    val (w, h, f) = synthParams(docId)
    val y0 = (docId % 100).toInt
    val frames = Array.tabulate(f) { t =>
      val p = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { p(y * w + x) = (y0 + x + y + 2 * t).toByte; x += 1 }
        y += 1
      }
      p
    }
    encodeY4m(w, h, 25, frames, 64 + (docId % 50).toInt,
      64 + (docId % 30).toInt)
  }

  /** Documents as a video table: real Y4M payload + typed metadata. */
  def asVideoTable(documents: DataFrame): Dataset[VideoRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("lang")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, lang) => VideoRow(id, synthY4m(id), lang) }
      }
  }

  /** Partition-wise decode + per-stream feature extraction. */
  def extractFeatures(video: Dataset[VideoRow]): Dataset[VideoFeatures] = {
    val spark = video.sparkSession
    import spark.implicits._
    video.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, fps, nf, first, last, motion) = decodeY4m(r.payload)
        VideoFeatures(r.doc_id, r.payload.length, w, h, nf, fps,
          1000.0 * nf / fps, first, last, motion, r.meta_lang)
      }
    }
  }

  /** Frame extraction with cross-container transcode: every luma plane
    * re-encoded as a standalone grayscale 24bpp BMP (flatMap fan-out
    * inside the partition, no shuffle). */
  def extractFrames(video: Dataset[VideoRow]): Dataset[VideoFrame] = {
    val spark = video.sparkSession
    import spark.implicits._
    video.flatMap { r =>
      val hd = parseHeader(r.payload)
      val planeSize = hd.w * hd.h
      var off = hd.dataOff
      val frames = scala.collection.mutable.ArrayBuffer.empty[VideoFrame]
      var t = 0
      while (off < r.payload.length) {
        while (r.payload(off) != '\n') off += 1
        off += 1
        val base = off
        val bmp = Multimodal.encodeBmp(hd.w, hd.h, (x, y) => {
          val v = r.payload(base + y * hd.w + x) & 0xff
          (v, v, v)
        })
        frames += VideoFrame(r.doc_id, t, bmp, r.meta_lang)
        t += 1
        off += 3 * planeSize
      }
      frames
    }
  }
}

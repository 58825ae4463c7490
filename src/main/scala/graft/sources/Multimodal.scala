package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: media payloads ride as opaque binary
  * columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run partition-wise in batches (the Scala analogue of
  * mapInPandas — one codec init per partition, amortized over the
  * batch, never a per-row UDF).
  *
  * The decode is REAL: payloads are genuine 24-bit uncompressed BMP
  * images (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR pixel
  * rows padded to 4 bytes — the public Windows bitmap spec), and
  * [[decodeBmp]] parses the headers and walks the pixel array for
  * channel statistics. The images themselves are synthesized
  * deterministically from document attributes (no image corpus ships
  * in the testdata), with per-pixel gradients chosen so the decoded
  * channel means have closed forms the DuckDB oracle can compute —
  * any stride / padding / BGR-order / row-direction bug in the
  * decoder breaks the q60 hash match.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], meta_lang: String)
  case class MediaFeatures(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double, meta_lang: String)

  // ----------------------------------------------------------------
  // Real BMP codec (24bpp, BI_RGB). Public format spec; zero deps.
  // ----------------------------------------------------------------

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def getU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def getI32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Encode a width x height 24bpp BMP; `px(x, y)` returns (r, g, b)
    * for the pixel at (x, y) with y = 0 the TOP row (the encoder
    * writes rows bottom-up as positive-height BMP requires). */
  def encodeBmp(width: Int, height: Int,
      px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowSize = ((3 * width + 3) / 4) * 4 // rows pad to 4-byte stride
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, 54 + dataSize) // file size
    putU32(out, 10, 54) // pixel data offset
    putU32(out, 14, 40) // BITMAPINFOHEADER size
    putU32(out, 18, width)
    putU32(out, 22, height) // positive = bottom-up row order
    putU16(out, 26, 1) // planes
    putU16(out, 28, 24) // bpp
    putU32(out, 30, 0) // BI_RGB, uncompressed
    putU32(out, 34, dataSize)
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < width) {
        val (r, g, b) = px(x, y)
        val o = rowOff + 3 * x
        out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse headers + pixel stats: (width, height, mean_r, mean_g,
    * mean_b). Validates magic / bpp / compression; honors the pixel
    * data offset, 4-byte row stride, bottom-up row order, and BGR
    * byte order. Padding bytes are never read into the sums. */
  def decodeBmp(bytes: Array[Byte])
      : (Int, Int, Double, Double, Double) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val dataOff = getI32(bytes, 10)
    val width = getI32(bytes, 18)
    val heightRaw = getI32(bytes, 22)
    val bottomUp = heightRaw > 0
    val height = math.abs(heightRaw)
    require(getU16(bytes, 28) == 24, "only 24bpp BMP supported")
    require(getI32(bytes, 30) == 0, "only uncompressed BI_RGB supported")
    val rowSize = ((3 * width + 3) / 4) * 4
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      val rowOff = dataOff + srcRow * rowSize
      var x = 0
      while (x < width) {
        val o = rowOff + 3 * x
        sb += bytes(o) & 0xff
        sg += bytes(o + 1) & 0xff
        sr += bytes(o + 2) & 0xff
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    (width, height, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  // ----------------------------------------------------------------
  // Deterministic image synthesis from document attributes. The
  // gradients give the decoded means CLOSED FORMS (no per-pixel value
  // ever exceeds 255, so no modular wrap):
  //   mean_b = doc_id % 100        + (w-1)/2          (B varies in x)
  //   mean_g = n_chars % 150       + (h-1)/2          (G varies in y)
  //   mean_r = (7*doc_id + 3) % 200 + (w-1)/2 + (h-1)/2
  // which is what the q60 oracle recomputes in SQL.
  // ----------------------------------------------------------------

  def synthWidth(docId: Long): Int = 8 + (docId % 9).toInt
  def synthHeight(docId: Long): Int = 8 + (docId % 7).toInt

  def synthBmp(docId: Long, nChars: Long): Array[Byte] = {
    val r0 = ((7 * docId + 3) % 200).toInt
    val g0 = (nChars % 150).toInt
    val b0 = (docId % 100).toInt
    encodeBmp(synthWidth(docId), synthHeight(docId),
      (x, y) => (r0 + x + y, g0 + y, b0 + x))
  }

  /** Documents as a media table: real BMP payload + typed metadata. */
  def asMediaTable(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        col("lang"))
      .as[(Long, Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, nc, lang) => MediaRow(id, synthBmp(id, nc), lang) }
      }
  }

  /** Partition-wise decode + feature extraction over the payloads. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init (codec/model handle) would go here
      rows.map { r =>
        val (w, h, mr, mg, mb) = decodeBmp(r.payload)
        MediaFeatures(r.doc_id, r.payload.length, w, h,
          mr, mg, mb, r.meta_lang)
      }
    }
  }

  /** Real nearest-neighbor downscale: decode, cap the longer edge at
    * `maxEdge`, re-encode — 1-in/1-out partition-wise, the production
    * resize shape. Payloads already within bounds pass through. */
  def resize(media: Dataset[MediaRow], maxEdge: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val b = r.payload
        val w = getI32(b, 18); val h = math.abs(getI32(b, 22))
        if (w <= maxEdge && h <= maxEdge) r
        else {
          val s = math.max(w, h).toDouble / maxEdge
          val nw = math.max(1, math.round(w / s).toInt)
          val nh = math.max(1, math.round(h / s).toInt)
          val dataOff = getI32(b, 10)
          val rowSize = ((3 * w + 3) / 4) * 4
          val out = encodeBmp(nw, nh, (x, y) => {
            val sx = math.min(w - 1, (x * s).toInt)
            val sy = math.min(h - 1, (y * s).toInt)
            val o = dataOff + (h - 1 - sy) * rowSize + 3 * sx
            ((b(o + 2) & 0xff), (b(o + 1) & 0xff), (b(o) & 0xff))
          })
          r.copy(payload = out)
        }
      }
    }
  }

  case class MediaFrame(
      doc_id: Long, frame_id: Int, payload: Array[Byte], meta_lang: String)

  /** Frame sampling: one image in, `nFrames` horizontal bands out,
    * each RE-ENCODED as a standalone valid BMP. The flatMap shape
    * (fan-out inside the partition, no shuffle) is the production
    * shape for frame extraction at corpus scale. */
  def sampleFrames(
      media: Dataset[MediaRow], nFrames: Int): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val b = r.payload
      val w = getI32(b, 18); val h = math.abs(getI32(b, 22))
      val dataOff = getI32(b, 10)
      val rowSize = ((3 * w + 3) / 4) * 4
      val n = math.max(1, math.min(nFrames, h))
      val band = h / n
      (0 until n).map { f =>
        val y0 = f * band
        val bh = if (f == n - 1) h - y0 else band
        val frame = encodeBmp(w, bh, (x, y) => {
          val sy = y0 + y
          val o = dataOff + (h - 1 - sy) * rowSize + 3 * x
          ((b(o + 2) & 0xff), (b(o + 1) & 0xff), (b(o) & 0xff))
        })
        MediaFrame(r.doc_id, f, frame, r.meta_lang)
      }
    }
  }

  // ----------------------------------------------------------------
  // Perceptual average-hash (aHash — the classic public image-dedup
  // fingerprint): decode, box-average onto an 8x8 grid, threshold
  // each cell at the global mean. All-integer: a cell is lit iff
  // cell_sum * n_pixels > total_sum * n_cell_pixels (exact cross-
  // multiplication, no division), so the hash is bit-reproducible in
  // any engine — the q278 oracle recomputes it in closed form from
  // the synthesis gradients. Returned as a 64-char '0'/'1' string
  // (row-major), which dodges BIGINT sign issues and ports anywhere.
  // ----------------------------------------------------------------

  /** 8x8 average-hash of a 24bpp BMP payload. Requires w,h >= 8. */
  def aHash64(bytes: Array[Byte]): String = {
    val dataOff = getI32(bytes, 10)
    val w = getI32(bytes, 18)
    val heightRaw = getI32(bytes, 22)
    val bottomUp = heightRaw > 0
    val h = math.abs(heightRaw)
    val rowSize = ((3 * w + 3) / 4) * 4
    // per-pixel value = r+g+b (integer; no /3, so sums stay exact)
    def boxSum(x0: Int, x1: Int, y0: Int, y1: Int): Long = {
      var s = 0L
      var y = y0
      while (y < y1) {
        val srcRow = if (bottomUp) h - 1 - y else y
        val rowOff = dataOff + srcRow * rowSize
        var x = x0
        while (x < x1) {
          val o = rowOff + 3 * x
          s += (bytes(o) & 0xff) + (bytes(o + 1) & 0xff) +
            (bytes(o + 2) & 0xff)
          x += 1
        }
        y += 1
      }
      s
    }
    val total = boxSum(0, w, 0, h)
    val nPix = w.toLong * h
    val sb = new StringBuilder(64)
    var i = 0
    while (i < 8) {
      val y0 = i * h / 8; val y1 = (i + 1) * h / 8
      var j = 0
      while (j < 8) {
        val x0 = j * w / 8; val x1 = (j + 1) * w / 8
        val nCell = (x1 - x0).toLong * (y1 - y0)
        val lit = boxSum(x0, x1, y0, y1) * nPix > total * nCell
        sb.append(if (lit) '1' else '0')
        j += 1
      }
      i += 1
    }
    sb.toString
  }
}

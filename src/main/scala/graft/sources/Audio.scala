package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Audio half of the multimodal column family (images: [[Multimodal]]).
  * Payloads are genuine 16-bit PCM mono WAV files — the public RIFF/WAVE
  * container spec — and the decoder does real codec work: it walks the
  * chunk list (not fixed offsets), validates the `fmt ` chunk
  * (PCM / mono / 16-bit), locates `data`, and folds the little-endian
  * samples for signal statistics (mean, RMS, peak, zero crossings).
  *
  * Synthesis is a deterministic integer sawtooth per document whose
  * statistics have CLOSED FORMS the DuckDB oracle recomputes from
  * doc_id alone — any chunk-walk / endianness / sign-extension bug in
  * the decoder breaks the q239 hash match:
  *   period p = 2*(1 + doc_id%5), cycles c = 50 + doc_id%25,
  *   amplitude A = 100*(1 + doc_id%8), sample s_i = A*(2*(i mod p) - (p-1))
  *   ⇒ n = p*c, mean = 0, peak = A*(p-1),
  *     rms = A*sqrt((p²-1)/3)   (exact per-period mean square),
  *     zero crossings = 2c-1    (one mid-period + one wrap, no wrap
  *                               after the final sample; p even keeps
  *                               every sample odd·A ≠ 0).
  *
  * Scale shape: 1-in/1-out `mapPartitions` projections — codec init is
  * per-partition, no shuffle anywhere; windowed loudness is a flatMap
  * fan-out inside the partition (the frame-sampling shape).
  *
  * Reference: sclera models external typed payloads as opaque columns
  * (modules/core/src/main/scala/objects/value types); the decode/
  * feature-extract staging here is the Spark-native analogue.
  */
object Audio {

  val SampleRate = 8000

  case class AudioRow(doc_id: Long, payload: Array[Byte], meta_lang: String)
  case class AudioFeatures(
      doc_id: Long, n_bytes: Int, sample_rate: Int, n_samples: Int,
      duration_ms: Double, mean_amp: Double, rms: Double, peak: Int,
      zero_cross: Int, meta_lang: String)
  case class AudioWindow(
      doc_id: Long, win_id: Int, n_samples: Int, rms: Double)

  // ----------------------------------------------------------------
  // Real PCM16 mono WAV codec. Public RIFF/WAVE spec; zero deps.
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
  private def getI16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)).toShort.toInt
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Encode mono 16-bit PCM samples as a canonical 44-byte-header WAV. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = 2 * samples.length
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putU32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putU32(out, 16, 16) // fmt chunk size
    putU16(out, 20, 1) // PCM
    putU16(out, 22, 1) // mono
    putU32(out, 24, sampleRate)
    putU32(out, 28, sampleRate * 2) // byte rate
    putU16(out, 32, 2) // block align
    putU16(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putU32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      putU16(out, 44 + 2 * i, samples(i) & 0xffff); i += 1
    }
    out
  }

  /** Parse by walking the RIFF chunk list (tolerates extra chunks such
    * as LIST/INFO before data; chunk bodies pad to even length), then
    * fold the samples: (sampleRate, nSamples, mean, rms, peakAbs,
    * zeroCrossings). */
  def decodeWav(bytes: Array[Byte])
      : (Int, Int, Double, Double, Int, Int) = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "not a WAV payload")
    var off = 12
    var sampleRate = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = tag(bytes, off); val size = getI32(bytes, off + 4)
      id match {
        case "fmt " =>
          require(getU16(bytes, off + 8) == 1, "only PCM supported")
          require(getU16(bytes, off + 10) == 1, "only mono supported")
          require(getU16(bytes, off + 22) == 16, "only 16-bit supported")
          sampleRate = getI32(bytes, off + 12)
        case "data" => dataOff = off + 8; dataLen = size
        case _ => // skip unknown chunk
      }
      off += 8 + size + (size & 1) // chunk bodies pad to even
    }
    require(sampleRate > 0 && dataOff >= 0, "missing fmt or data chunk")
    val n = dataLen / 2
    var sum = 0L; var sumSq = 0L; var peak = 0; var zc = 0; var prev = 0
    var i = 0
    while (i < n) {
      val s = getI16(bytes, dataOff + 2 * i)
      sum += s; sumSq += s.toLong * s
      val a = math.abs(s); if (a > peak) peak = a
      if (i > 0 && ((s > 0 && prev < 0) || (s < 0 && prev > 0))) zc += 1
      prev = s
      i += 1
    }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
    (sampleRate, n, mean, rms, peak, zc)
  }

  // ----------------------------------------------------------------
  // Deterministic sawtooth synthesis (closed-form stats — see header).
  // ----------------------------------------------------------------

  def synthParams(docId: Long): (Int, Int, Int) = {
    val p = 2 * (1 + (docId % 5).toInt)
    val c = 50 + (docId % 25).toInt
    val a = 100 * (1 + (docId % 8).toInt)
    (p, c, a)
  }

  def synthWav(docId: Long): Array[Byte] = {
    val (p, c, a) = synthParams(docId)
    val n = p * c
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      samples(i) = (a * (2 * (i % p) - (p - 1))).toShort; i += 1
    }
    encodeWav(SampleRate, samples)
  }

  /** Documents as an audio table: real WAV payload + typed metadata. */
  def asAudioTable(documents: DataFrame): Dataset[AudioRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"), col("lang"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, lang) => AudioRow(id, synthWav(id), lang) }
      }
  }

  /** Partition-wise decode + signal-statistics extraction. */
  def extractFeatures(audio: Dataset[AudioRow]): Dataset[AudioFeatures] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions { rows =>
      rows.map { r =>
        val (sr, n, mean, rms, peak, zc) = decodeWav(r.payload)
        AudioFeatures(r.doc_id, r.payload.length, sr, n,
          1000.0 * n / sr, mean, rms, peak, zc, r.meta_lang)
      }
    }
  }

  /** Real decimation resample: keep every `factor`-th sample and
    * re-encode at sampleRate/factor — duration is preserved.
    * 1-in/1-out partition-wise, no shuffle. */
  def resample(audio: Dataset[AudioRow], factor: Int): Dataset[AudioRow] = {
    require(factor >= 1)
    val spark = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions { rows =>
      rows.map { r =>
        val b = r.payload
        val (sr, n, _, _, _, _) = decodeWav(b)
        // re-walk for the data offset (decodeWav validated the layout)
        var off = 12; var dataOff = -1
        while (dataOff < 0) {
          val id = tag(b, off); val size = getI32(b, off + 4)
          if (id == "data") dataOff = off + 8
          else off += 8 + size + (size & 1)
        }
        val m = (n + factor - 1) / factor
        val out = new Array[Short](m)
        var i = 0
        while (i < m) {
          out(i) = getI16(b, dataOff + 2 * i * factor).toShort; i += 1
        }
        r.copy(payload = encodeWav(sr / factor, out))
      }
    }
  }

  /** Windowed loudness: fixed `windowMs` windows, per-window RMS —
    * the audio analogue of frame sampling (flatMap fan-out inside the
    * partition, no shuffle). */
  def loudnessWindows(
      audio: Dataset[AudioRow], windowMs: Int): Dataset[AudioWindow] = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.flatMap { r =>
      val b = r.payload
      val (sr, n, _, _, _, _) = decodeWav(b)
      var off = 12; var dataOff = -1
      while (dataOff < 0) {
        val id = tag(b, off); val size = getI32(b, off + 4)
        if (id == "data") dataOff = off + 8
        else off += 8 + size + (size & 1)
      }
      val win = math.max(1, sr * windowMs / 1000)
      val nw = (n + win - 1) / win
      (0 until nw).map { w =>
        val start = w * win
        val len = math.min(win, n - start)
        var sumSq = 0L; var i = 0
        while (i < len) {
          val s = getI16(b, dataOff + 2 * (start + i)); sumSq += s.toLong * s
          i += 1
        }
        AudioWindow(r.doc_id, w, len, math.sqrt(sumSq.toDouble / len))
      }
    }
  }
}

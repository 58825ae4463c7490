package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Audio

/** Real WAV decode over binary audio columns: codec round-trip with
  * chunk-walking (extra chunks tolerated), closed-form synthesis
  * stats, decimation resample, windowed loudness fan-out. */
class AudioSpec extends AnyFunSuite {
  import TestSession._

  test("WAV codec round-trip: decode recovers rate and statistics") {
    val samples = Array[Short](100, -100, 200, -200, 0, 300)
    val bytes = Audio.encodeWav(16000, samples)
    assert(bytes.length == 44 + 12)
    val (sr, n, mean, rms, peak, zc) = Audio.decodeWav(bytes)
    assert(sr == 16000 && n == 6)
    assert(math.abs(mean - samples.map(_.toInt).sum / 6.0) < 1e-9)
    val expRms = math.sqrt(samples.map(s => s.toLong * s).sum / 6.0)
    assert(math.abs(rms - expRms) < 1e-9)
    assert(peak == 300)
    // sign changes: 100/-100, -100/200, 200/-200; 0 breaks the chain
    assert(zc == 3)
  }

  test("decoder walks the chunk list: LIST chunk before data tolerated") {
    val canonical = Audio.encodeWav(8000, Array[Short](5, -5, 7))
    // splice an odd-sized LIST chunk between fmt and data (pads to even)
    val listBody = "INFOx".getBytes("US-ASCII") // 5 bytes -> 1 pad byte
    val out = new java.io.ByteArrayOutputStream()
    out.write(canonical, 0, 36) // RIFF..fmt chunk end
    out.write("LIST".getBytes("US-ASCII"))
    out.write(Array[Byte](5, 0, 0, 0))
    out.write(listBody); out.write(0) // pad
    out.write(canonical, 36, canonical.length - 36) // data chunk
    val (sr, n, _, _, peak, _) = Audio.decodeWav(out.toByteArray)
    assert(sr == 8000 && n == 3 && peak == 7)
  }

  test("decoder rejects non-WAV and non-PCM payloads") {
    intercept[IllegalArgumentException] {
      Audio.decodeWav("not a wav at all........".getBytes)
    }
    val bad = Audio.encodeWav(8000, Array[Short](1, 2))
    bad(20) = 3 // audioFormat = 3 (IEEE float)
    intercept[IllegalArgumentException] { Audio.decodeWav(bad) }
  }

  test("synthesis closed forms hold for random doc ids") {
    val rnd = new scala.util.Random(17)
    for (_ <- 0 until 40) {
      val id = math.abs(rnd.nextLong() % 1000000)
      val (p, c, a) = Audio.synthParams(id)
      val (sr, n, mean, rms, peak, zc) = Audio.decodeWav(Audio.synthWav(id))
      assert(sr == Audio.SampleRate)
      assert(n == p * c)
      assert(math.abs(mean) < 1e-12)
      assert(math.abs(rms - a * math.sqrt((p * p - 1.0) / 3.0)) < 1e-6)
      assert(peak == a * (p - 1))
      assert(zc == 2 * c - 1)
    }
  }

  test("decimation resample halves the rate, keeps the duration") {
    val docs = Tables(spark, sfDir).documents.limit(50)
    val audio = Audio.asAudioTable(docs)
    val res = Audio.resample(audio, 2)
    val both = Audio.extractFeatures(audio).toDF
      .select(col("doc_id"), col("sample_rate").as("sr0"),
        col("n_samples").as("n0"), col("duration_ms").as("d0"))
      .join(Audio.extractFeatures(res).toDF
        .select(col("doc_id"), col("sample_rate").as("sr1"),
          col("n_samples").as("n1"), col("duration_ms").as("d1")),
        "doc_id")
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getAs[Int]("sr1") == r.getAs[Int]("sr0") / 2)
      assert(r.getAs[Int]("n1") == (r.getAs[Int]("n0") + 1) / 2)
      assert(math.abs(r.getAs[Double]("d1") - r.getAs[Double]("d0")) < 0.26)
    }
  }

  test("windowed loudness: per-window RMS covers all samples") {
    val docs = Tables(spark, sfDir).documents.limit(20)
    val audio = Audio.asAudioTable(docs)
    // 15ms = 120 samples — a multiple of every synthesis period
    // (2,4,6,8,10), so every full window spans whole periods
    val wins = Audio.loudnessWindows(audio, 15).toDF
    val perDoc = wins.groupBy("doc_id")
      .agg(sum("n_samples").as("total"), count("*").as("nw"))
    val feats = Audio.extractFeatures(audio).toDF
      .select(col("doc_id"), col("n_samples"))
    val joined = perDoc.join(feats, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("total") == r.getAs[Int]("n_samples").toLong)
    }
    // sawtooth is amplitude-stationary: every full window has the same
    // RMS as the whole signal
    val full = wins.filter(col("n_samples") === 120)
      .join(Audio.extractFeatures(audio).toDF
        .select(col("doc_id"), col("rms").as("sig_rms")), "doc_id")
      .select(abs(col("rms") - col("sig_rms")).as("d"))
      .agg(max("d")).head.getDouble(0)
    assert(full < 1e-6)
  }

  test("q239 matches the closed-form oracle shape on sf0.001") {
    val df = SparkEntry.queries("q239_audio_decode")(spark,
      "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length > 0)
    rows.take(20).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (p, c, a) = Audio.synthParams(id)
      assert(r.getAs[Int]("n_samples") == p * c)
      assert(r.getAs[Int]("peak") == a * (p - 1))
      assert(r.getAs[Int]("zero_cross") == 2 * c - 1)
    }
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.DedupOps

/** One (band, signature) bucket membership of a streamed doc. */
case class BandDoc(band_key: String, doc_id: Long)

/** Per-bucket state: the doc ids seen in this LSH bucket so far,
  * capped — an over-popular band signature carries no similarity
  * signal, and the cap bounds both state size and emitted pairs
  * (same bounded-bucket guard as the batch operator). */
case class BucketState(docIds: Seq[Long])

/** An emitted near-duplicate candidate pair (doc_a < doc_b). */
case class CandPair(doc_a: Long, doc_b: Long)

/** Incremental MinHash-LSH near-dup candidates under Structured
  * Streaming — the streaming twin of DedupOps.minhashSignature +
  * minhashCandidates.
  *
  * The signature is computed PER ROW (array expressions only — no
  * aggregation), so the only stateful stage is the band-bucket
  * membership: flatMapGroupsWithState keyed by (band, signature)
  * holds the capped doc-id set per bucket and, as each new doc
  * arrives, emits its pairs against the docs already in the bucket.
  * A doc pair sharing multiple bands is emitted once per band —
  * downstream exact verification (verifyJaccard) is idempotent, and
  * deduplication is a watermarked dropDuplicates when needed.
  *
  * At corpus scale: state per bucket <= maxBucket longs, bucket keys
  * are hashes (uniform, no skew), and the stream shuffles once on the
  * band key. The NUMBER of bucket keys still grows with the corpus,
  * so long-running production streams should pass `idleTtl` to expire
  * idle buckets after that much processing time (near-dups in a
  * curation stream arrive close together; a bucket idle for the TTL
  * no longer contributes candidate pairs) — total state is then
  * bounded by the buckets touched within one TTL window. The TTL is
  * opt-in because processing-time timeouts make Spark re-trigger
  * no-data micro-batches to fire expirations — correct for a 24/7
  * stream, busy-work for a bounded replay/test.
  */
object StreamingLshDedup {

  def candidates(
      docs: DataFrame, textCol: String, k: Int = 16, bands: Int = 4,
      maxBucket: Int = 50, idleTtl: Option[String] = None): Dataset[CandPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = k / bands
    val banded = DedupOps.minhashSignature(docs, textCol, k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> slice(_mh, b * $rows + 1, $rows))"))
        .as(Seq("_band", "_sig")))
      .select(
        concat_ws(":", col("_band"), col("_sig").cast("string"))
          .as("band_key"),
        col("doc_id"))
      .as[BandDoc]
    val timeoutConf =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(
        OutputMode.Append, timeoutConf)(process(maxBucket, idleTtl))
  }

  private def process(maxBucket: Int, idleTtl: Option[String])(
      key: String, it: Iterator[BandDoc],
      gs: GroupState[BucketState]): Iterator[CandPair] = {
    if (gs.hasTimedOut) {
      // bucket idle past the TTL: drop its membership set
      gs.remove()
      return Iterator.empty
    }
    var members = gs.getOption.map(_.docIds.toVector).getOrElse(Vector.empty)
    val out = Vector.newBuilder[CandPair]
    for (d <- it.map(_.doc_id).toVector.distinct.sorted
         if !members.contains(d)) {
      if (members.length < maxBucket) {
        for (p <- members)
          out += (if (p < d) CandPair(p, d) else CandPair(d, p))
        members :+= d
      }
      // at the cap: the bucket is saturated — stop emitting from it,
      // exactly like the batch operator drops over-popular buckets
    }
    gs.update(BucketState(members))
    idleTtl.foreach(gs.setTimeoutDuration)
    out.result().iterator
  }
}

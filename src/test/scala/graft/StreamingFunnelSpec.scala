package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStreams, StreamingMatch}

/** The streaming conversion funnel is streaming MATCH with gap-filler
  * alternations (the standard funnel-to-regex encoding): a user
  * converts iff a view is later followed by a click which is later
  * followed by a purchase, with anything in between. Non-overlapping
  * restart makes the per-user match count the number of sequential
  * conversions. No separate streaming-funnel operator is needed — this
  * pins that the MATCH encoding agrees with the batch first-touch
  * subsequence derivation (q145's semantics). */
class StreamingFunnelSpec extends AnyFunSuite {
  import TestSession._

  // view, then click after it, then purchase after that; fillers admit
  // every label except the next funnel target so the NFA binds the
  // earliest eligible stage (shortest-match discipline)
  private val funnelPattern =
    "view (view|error|signup|purchase)* click " +
      "(view|click|error|signup)* purchase"

  lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_funnel_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming MATCH funnel equals the batch subsequence funnel") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    val q = StreamingMatch.matches(stream, funnelPattern)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val convertedStream = spark.table("funnel_out")
      .select(col("user_id")).distinct()

    // batch derivation, q145 semantics: first view, first click after
    // it, first purchase after that
    val ev = Tables(spark, sfDir).events
    val v = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
    val c = ev.where(col("event_type") === "click").as("e")
      .join(v, Seq("user_id")).where(col("ts") > col("t0"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val p = ev.where(col("event_type") === "purchase").as("e")
      .join(c, Seq("user_id")).where(col("ts") > col("t1"))
      .select(col("user_id")).distinct()

    assert(convertedStream.count() > 0)
    assert(convertedStream.exceptAll(p).isEmpty &&
      p.exceptAll(convertedStream).isEmpty,
      "streaming MATCH converters != batch subsequence converters")
  }
}

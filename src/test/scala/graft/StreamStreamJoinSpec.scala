package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream inner join with watermark-bounded state: purchases
  * joined to the clicks that preceded them within 1 hour, both sides
  * unbounded streams. The time-range condition + watermarks let Spark
  * evict click state older than (watermark - 1h), so state is bounded
  * by the join window, not the stream length — the 100 TB requirement.
  *
  * Files arrive time-ordered, so eviction can never drop a click that
  * a later purchase still needs; the streamed result must therefore
  * equal the batch join exactly, across micro-batch boundaries.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  import TestSession._

  test("watermarked stream-stream join equals the batch join") {
    val d = java.nio.file.Files.createTempDirectory("graft_ss_join")
    val ev = Tables(spark, sfDir).events.orderBy(col("ts"), col("event_id"))
    val n = ev.count()
    val firstHalf = ev.limit((n / 2).toInt)
    val secondHalf = ev.exceptAll(firstHalf)
    firstHalf.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("p1").toString)
    secondHalf.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("p2").toString)

    def split(df: org.apache.spark.sql.DataFrame) = {
      val purchases = df.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("pts"))
      val clicks = df.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("cts"))
      (purchases, clicks)
    }
    val cond = expr(
      "p_user = c_user AND cts >= pts - INTERVAL 1 HOUR AND cts <= pts")

    val stream = spark.readStream
      .schema(firstHalf.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(d.toString + "/p*")
    val (sp, sc) = split(stream)
    val q = sp.withWatermark("pts", "1 hour")
      .join(sc.withWatermark("cts", "1 hour"), cond)
      .select(col("p_user"), col("purchase_id"), col("click_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_join_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val (bp, bc) = split(Tables(spark, sfDir).events)
    val batch = bp.join(bc, cond)
      .select(col("p_user"), col("purchase_id"), col("click_id"))
    val streamed = spark.table("ss_join_out")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }
}

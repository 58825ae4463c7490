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

  test("LEFT OUTER stream-stream join null-extends after the window closes") {
    val d = java.nio.file.Files.createTempDirectory("graft_ss_outer")
    val ev = Tables(spark, sfDir).events.orderBy(col("ts"), col("event_id"))
    ev.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("p1").toString)
    // a sentinel far past the end pushes the watermark beyond every
    // real purchase's 1h window, so their null-extended rows flush —
    // without it the tail windows never close and outer rows are lost
    // Two sentinel batches push the watermark past every real window
    // and give the state store a batch to evict + emit in (outer rows
    // flush one batch late). The sentinels must SURVIVE the
    // purchase/click filters — withWatermark sits above them, so a
    // filtered-out event type would never advance the watermark — and
    // both sides need one, since the global watermark is the min
    // across inputs. user_id = -1 keeps them out of the comparison.
    for (i <- 2 to 3) {
      val base = ev.limit(1).select(
        (col("event_id") + lit(1000000 * i)).as("event_id"),
        (col("ts") + expr(s"INTERVAL ${1000 * i} HOURS")).as("ts"),
        lit(-1L).as("user_id"), col("event_type"),
        col("value"), col("props"))
      base.withColumn("event_type", lit("purchase"))
        .unionByName(base.withColumn("event_type", lit("click")))
        .coalesce(1).write.mode("overwrite")
        .parquet(d.resolve(s"p$i").toString)
    }

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
      .schema(Tables(spark, sfDir).events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(d.toString + "/p*")
    val (sp, sc) = split(stream)
    val q = sp.withWatermark("pts", "10 minutes")
      .join(sc.withWatermark("cts", "10 minutes"), cond, "left_outer")
      .select(col("p_user"), col("purchase_id"), col("click_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_outer_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val (bp, bc) = split(Tables(spark, sfDir).events)
    val batch = bp.join(bc, cond, "left_outer")
      .select(col("p_user"), col("purchase_id"), col("click_id"))
    val streamed = spark.table("ss_outer_out")
      .filter(col("p_user") >= 0)
    assert(streamed.filter(col("click_id").isNull).count() > 0,
      "no null-extended rows emitted")
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }
}

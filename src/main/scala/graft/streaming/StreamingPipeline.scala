package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** The end-to-end training-data pipeline (batch twin: q70) as ONE
  * streaming plan: exact dedup on the canonical token set (stateful
  * dropDuplicates), quality gate, language filter, per-source token
  * accounting — documents stream in, curated per-source stats stream
  * out (update mode).
  *
  * State shape at scale: the dedup state is one md5 per distinct
  * canonical form (bound it in production with
  * dropDuplicatesWithinWatermark over an ingest-time column); the
  * aggregation state is one row per source. Everything else is
  * stateless codegen'd scalar work.
  */
object StreamingPipeline {

  def curate(docs: DataFrame): DataFrame = {
    val toks = TF.tokens(col("text"))
    val nChars = length(col("text")).cast("double")
    val nPunct = length(regexp_replace(col("text"), "[^.!?,;:]", ""))
      .cast("double")
    val nStop = TF.stopwordHits(toks, TF.langStopwords("en")).cast("double")
    val quality =
      least(size(toks).cast("double") / lit(200.0), lit(1.0)) * 0.5 +
        (nStop / size(toks).cast("double")) * 0.3 +
        (lit(1.0) - nPunct / nChars) * 0.2
    docs
      .withColumn("canon",
        md5(array_join(array_sort(TF.tokenSet(col("text"))), " ")))
      .dropDuplicates("canon")
      .where(quality >= 0.3)
      .where(TF.langId(col("text")) === "en")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TF.tokens(col("text"))).cast("long")).as("total_tokens"))
  }
}

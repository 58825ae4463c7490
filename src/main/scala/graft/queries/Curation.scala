package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Round-3 surface: corpus-curation accounting operators a large-scale
  * training-data pipeline needs beyond dedup/quality (reference:
  * sclera's analytics operators are the model for "analytics as
  * relational ops"; these follow the same declarative shape).
  *
  * All four stay inside whole-stage codegen: window sums, explode, and
  * hash aggregates only — no UDFs, no driver-side loops, so each scales
  * by adding partitions.
  */
object Curation {

  /** Dialect-neutral: executed verbatim by spark.sql AND DuckDB. */
  private val percentileDiscQuery =
    """SELECT l_returnflag,
      |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25,
      |  percentile_disc(0.50) WITHIN GROUP (ORDER BY l_quantity) AS p50,
      |  percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS p75
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LOCF gap-fill (ordered-stream imputation, reference IMPUTED over
    // a stream): carry each user's last click value forward over their
    // event stream. One window pass, passthrough doubles (no
    // arithmetic => exact oracle parity).
    "q123_locf" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.events
        .withColumn("v",
          when(col("event_type") === "click", col("value")))
        .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("event_id"), col("v_filled"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // Exact discrete percentiles (value actually present in the data,
    // unlike interpolated q74): WITHIN GROUP syntax runs verbatim in
    // both engines.
    "q124_percentile_disc" -> { (spark, dir) =>
      Tables(spark, dir).registerAll()
      spark.sql(percentileDiscQuery)
    },

    // Per-source language-distribution entropy + Gini impurity: the
    // standard corpus-mixing diagnostics (is a source monolingual?).
    // One hash aggregate + one 1-row-per-group window pass.
    "q119_entropy" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val counts = t.documents
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n"))
      val bySource = Window.partitionBy(col("source"))
      counts
        .withColumn("p",
          col("n").cast("double") / sum(col("n")).over(bySource).cast("double"))
        .groupBy(col("source"))
        .agg(
          round(sum(-col("p") * log(col("p"))), 6).as("entropy"),
          round(lit(1.0) - sum(col("p") * col("p")), 6).as("gini"),
          count(lit(1)).as("n_langs"))
        .orderBy(col("source"))
    },

    // Equi-width histogram of lineitem prices: global min/max via a
    // broadcast 1-row aggregate, then a 20-bucket hash count. The
    // 2-pass shape (tiny agg + counted scan) is the 100 TB plan; no
    // sort, no wide shuffle.
    "q120_histogram" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val x = t.lineitem.select(col("l_extendedprice").as("x"))
      val mm = x.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      x.crossJoin(broadcast(mm))
        .withColumn("w", (col("hi") - col("lo")) / lit(20.0))
        .withColumn("b",
          least(floor((col("x") - col("lo")) / col("w")), lit(19L)).cast("int"))
        .groupBy(col("b"), col("lo"), col("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("b"), col("n"),
          round(col("lo") + col("b") * col("w"), 6).as("edge"))
        .orderBy(col("b"))
    },

    // Fixed-size token chunks with overlap (context windows for
    // training): window length 16, stride 12 => 4-token overlap.
    // sequence() + posexplode fan out inside the scan partition — no
    // shuffle at all until the final presentation sort.
    "q121_doc_chunking" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      t.documents
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("ntok", size(col("toks")))
        .select(col("doc_id"), col("toks"),
          posexplode(expr("sequence(0, ntok - 1, 12)"))
            .as(Seq("chunk_id", "start")))
        .select(col("doc_id"), col("chunk_id"),
          expr("slice(toks, start + 1, 16)").as("chunk"))
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).as("chunk_len"),
          array_join(col("chunk"), " ").as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_id"))
    },

    // Sequence-packing accounting: docs are laid out per source in
    // doc_id order and packed into 256-token context bins by running
    // offset (bin = start offset div 256). Reports docs + tokens per
    // bin — the packing-efficiency view a data loader needs. One
    // window cumsum per source partition, then a hash aggregate.
    "q122_seq_packing" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      t.documents
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("ntok"))
        .withColumn("cum", sum(col("ntok")).over(w))
        .withColumn("bin", expr("(cum - ntok) div 256"))
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tokens"))
        .orderBy(col("source"), col("bin"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q123_locf" ->
      """SELECT user_id, event_id,
        |  LAST_VALUE(CASE WHEN event_type = 'click' THEN value END
        |      IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS v_filled
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q124_percentile_disc" -> percentileDiscQuery,

    "q119_entropy" ->
      """WITH c AS (
        |  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
        |s AS (
        |  SELECT source, CAST(n AS DOUBLE) /
        |    CAST(SUM(n) OVER (PARTITION BY source) AS DOUBLE) AS p
        |  FROM c)
        |SELECT source, ROUND(SUM(-p * LN(p)), 6) AS entropy,
        |  ROUND(1.0 - SUM(p * p), 6) AS gini, COUNT(*) AS n_langs
        |FROM s GROUP BY source ORDER BY source""".stripMargin,

    "q120_histogram" ->
      """WITH mm AS (
        |  SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
        |  FROM lineitem),
        |b AS (
        |  SELECT LEAST(CAST(FLOOR((l_extendedprice - lo) / ((hi - lo) / 20.0))
        |      AS BIGINT), 19) AS b, lo, (hi - lo) / 20.0 AS w
        |  FROM lineitem, mm)
        |SELECT CAST(b AS INT) AS b, COUNT(*) AS n,
        |  ROUND(lo + b * w, 6) AS edge
        |FROM b GROUP BY b, lo, w ORDER BY b""".stripMargin,

    "q121_doc_chunking" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS ntok
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, CAST(ntok - 1 AS BIGINT), 12)) AS i
        |  FROM d),
        |c AS (
        |  SELECT doc_id, CAST(i // 12 AS INT) AS chunk_id,
        |    list_slice(toks, i + 1, i + 16) AS chunk
        |  FROM u)
        |SELECT doc_id, chunk_id, CAST(len(chunk) AS INT) AS chunk_len,
        |  array_to_string(chunk, ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q122_seq_packing" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |  FROM documents),
        |c AS (
        |  SELECT source, ntok,
        |    CAST(SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id)
        |      AS BIGINT) AS cum
        |  FROM d)
        |SELECT source, (cum - ntok) // 256 AS bin, COUNT(*) AS n_docs,
        |  CAST(SUM(ntok) AS BIGINT) AS tokens
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}

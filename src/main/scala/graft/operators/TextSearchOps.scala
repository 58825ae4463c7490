package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Okapi BM25 ranked retrieval as a relational plan (the reference's
  * text-search surface re-expressed Spark-first; sclera exposes search
  * through external text engines — here the posting-list shape is the
  * relational plan itself).
  *
  * Scale notes: tf is computed ONLY for the query terms (the isin
  * filter prunes the exploded token stream before any shuffle); df and
  * the corpus stats are tiny aggregates; per-term weights pivot into
  * fixed-order columns so the score sum is deterministic across
  * engines; the global top-k funnels through the bounded graft_topk_by
  * aggregate — map-side combined, never a corpus-wide ranking window.
  * At 100 TB the tf table is the pre-built inverted-index posting list
  * and the per-query shape (|terms| postings joins + bounded top-k) is
  * unchanged.
  */
object TextSearchOps {

  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "GRAFT SEARCH needs at least one query term")
    graft.plans.TopKBy.register(docs.sparkSession)
    val toks = docs
      .select(col(idCol), explode(TF.regexTokens(col(textCol))).as("term"))
    val dlen = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
      .persist()
    val st = dlen.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl").cast("decimal(38,6)")).cast("double") /
        count(lit(1)).cast("double")).as("avgdl")).head()
    val nDocs = st.getAs[Double]("n_docs")
    val avgdl = st.getAs[Double]("avgdl")
    val tf = toks.where(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // tf rows are unique per (doc, term), so every conditional sum
    // below aggregates a single value — no float-order nondeterminism.
    val w = tf.join(broadcast(dfreq), "term").join(dlen, idCol)
      .withColumn("idf",
        log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)))
      .withColumn("w",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * (col("dl").cast("double") / lit(avgdl)))))
    val termSums: Seq[Column] = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("w"))).as(s"w$i")
    }
    val score = terms.indices
      .map(i => coalesce(col(s"w$i"), lit(0.0)))
      .reduce(_ + _)
    w.groupBy(col(idCol)).agg(termSums.head, termSums.tail: _*)
      .withColumn("score", round(score, 6))
      .groupBy()
      .agg(expr(s"graft_topk_by(score, $idCol, $idCol, $k)").as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("int").as("rk"),
        col("col.tie").as(idCol), col("col.score").as("score"))
      .orderBy(col("rk"))
  }
}

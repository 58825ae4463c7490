package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Length-2 sequential pattern mining (PrefixSpan's first level) over
  * per-key ordered label streams — the support-counting companion to
  * SeqMatchOp's regex MATCH (reference: the sequence-analytics family
  * under analytics/sequence/).
  *
  * A key supports pattern A->B when some A-labeled row precedes some
  * B-labeled row in the ordering column, which reduces to
  * first_ord(A) < last_ord(B) over the per-(key, label) summary — so
  * the fact collapses in ONE aggregate to at most |keys| x |labels|
  * rows of two ordinals each, and pair generation fans out at most
  * |labels|^2 per key. A->A support means two A-rows at distinct
  * ordinals (ties between equal ordinals are not observable).
  */
object SeqPatternOps {

  def seqPatterns(df: DataFrame, keyCol: String, ordCol: String,
      labelCol: String): DataFrame =
    supportsFromSummary(
      df.groupBy(col(keyCol).as("k"), col(labelCol).as("lbl"))
        .agg(min(col(ordCol)).as("f"), max(col(ordCol)).as("l")))

  /** Support table from an already-collapsed (k, lbl, f, l) summary —
    * shared by the batch operator and the streaming twin (whose
    * MapState carries exactly this summary incrementally). */
  def supportsFromSummary(per: DataFrame): DataFrame = {
    val sup = per.as("a").join(per.as("b"), Seq("k"))
      .where(col("a.f") < col("b.l"))
      .groupBy(col("a.lbl").as("ante"), col("b.lbl").as("cons"))
      .agg(count(lit(1)).as("support_users"))
    val tot = per.agg(countDistinct(col("k")).as("n_users"))
    sup.crossJoin(broadcast(tot))
      .select(col("ante"), col("cons"), col("support_users"),
        round(col("support_users").cast("double") /
          col("n_users").cast("double"), 6).as("support"))
      .orderBy(col("ante"), col("cons"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus language-model operators: CCNet-style perplexity scoring
  * (Wenzek et al. 2020) with a bigram Jelinek-Mercer LM trained on the
  * corpus itself, and quantile bucketing of the scores via the
  * distributed-rank shape (range repartition + per-partition offsets —
  * never a single-partition ranking window).
  *
  * Scale notes: LM "training" is two token-level aggregations
  * (map-side combined); scoring joins stay keyed on tokens (the
  * vocabulary is never broadcast or collected); the per-document NLL
  * fold is position-ordered so the double sum is reproducible.
  */
object LmOps {

  /** Per-document average NLL + perplexity under the corpus bigram LM
    * (λ=0.7 bigram / 0.3 unigram interpolation; first token scored by
    * the unigram). Output: idCol, n_tok, avg_nll, ppl. */
  def perplexity(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val base = docs.select(col(idCol), split(col(textCol), " ").as("arr"))
    val toks = base
      .select(col(idCol), col("arr"),
        posexplode(col("arr")).as(Seq("pos", "tok")))
      .withColumn("w1",
        when(col("pos") > 0, element_at(col("arr"), col("pos"))))
      .drop("arr")
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tot = toks.agg(count(lit(1)).as("nt"))
    val bigr = toks.where(col("pos") > 0)
      .groupBy(col("w1"), col("tok")).agg(count(lit(1)).as("c12"))
    // every scored bigram occurs in the corpus (it came from it), so
    // c12 >= 1 and c1 >= 1 whenever pos > 0 — no zero-prob guard
    val scored = toks
      .join(uni.select(col("tok"), col("c").as("c2")), "tok")
      .join(uni.select(col("tok").as("w1"), col("c").as("c1")),
        Seq("w1"), "left")
      .join(bigr, Seq("w1", "tok"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("lnp",
        when(col("pos") === 0,
          -log(col("c2").cast("double") / col("nt").cast("double")))
        .otherwise(-log(
          lit(0.7) * (col("c12").cast("double") / col("c1").cast("double"))
          + lit(0.3) * (col("c2").cast("double") / col("nt").cast("double")))))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        expr("""aggregate(
          transform(array_sort(collect_list(struct(pos, lnp))),
            p -> p.lnp),
          0D, (a, x) -> a + x)""").as("nll"))
      .select(col(idCol), col("n_tok"),
        round(col("nll") / col("n_tok").cast("double"), 6).as("avg_nll"))
      .withColumn("ppl", round(exp(col("avg_nll")), 6))
  }

  /** Exact NTILE(k) over (sortCol, idCol) without a global window:
    * range repartition, per-partition row numbers, offset join —
    * the q147 distributed-rank shape. Adds an int `bucket_id`. */
  def distributedNtile(df: DataFrame, k: Int, sortCol: String,
      idCol: String, total: DataFrame): DataFrame = {
    // partition count follows the session (scale-adaptive); the global
    // rank is partitioning-independent because (sortCol, idCol) is a
    // unique total order.
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, col(sortCol), col(idCol))
      .sortWithinPartitions(col(sortCol), col(idCol))
    // per-partition ordinal via monotonically_increasing_id bit-split
    // ((pid << 33) | 0-based position, assigned in sorted iterator
    // order) — whole-stage codegen, no interpreted Row conversion.
    val local = sorted
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("pid", shiftright(col("_mid"), 33).cast("int"))
      .withColumn("rn",
        col("_mid").bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
      .drop("_mid")
    CacheScope.scoped(local)
    val counts = local.groupBy(col("pid")).agg(count(lit(1)).as("c"))
    val offs = counts.alias("a")
      .join(counts.alias("b"), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid"))
      .agg(coalesce(sum(col("b.c")), lit(0L)).as("off"))
    local.join(broadcast(offs), Seq("pid"))
      .crossJoin(broadcast(total.toDF("nn")))
      .withColumn("p", col("off") + col("rn") - 1)
      .withColumn("bucket_id", expr(
        s"""CAST(CASE WHEN nn DIV $k = 0 THEN p + 1
           |  WHEN p < (nn DIV $k + 1) * (nn % $k)
           |    THEN p DIV (nn DIV $k + 1) + 1
           |  ELSE nn % $k
           |    + (p - (nn DIV $k + 1) * (nn % $k)) DIV (nn DIV $k) + 1
           |END AS INT)""".stripMargin))
      .drop("pid", "rn", "p", "nn")
  }

  /** The full CCNet partition: perplexity + head/middle/tail tercile
    * labels. Output: idCol, n_tok, avg_nll, ppl, bucket. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val perDoc = perplexity(docs, idCol, textCol)
    val n = docs.agg(count(lit(1))) // 1 scored row per input doc
    distributedNtile(perDoc, 3, "avg_nll", idCol, n)
      .select(col(idCol), col("n_tok"), col("avg_nll"), col("ppl"),
        expr("CASE bucket_id WHEN 1 THEN 'head' WHEN 2 THEN 'middle' " +
          "ELSE 'tail' END").as("bucket"))
      .orderBy(col(idCol))
  }
}

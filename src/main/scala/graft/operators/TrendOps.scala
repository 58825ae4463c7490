package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust monotone-trend estimation/testing over any keyed
  * (time, value) series relation — the generic operator behind the
  * `GRAFT TREND <t> KEY <k> TIME <c> VALUE <c> METHOD ...` statement
  * and the q311/q312 gate queries (which run THROUGH these bodies,
  * so the statement and the oracle-checked queries cannot drift).
  *
  * Both methods materialize the O(n²) pairwise frame per key — the
  * caller supplies a per-key series that is bounded (calendar days,
  * model rows), never the raw fact; the only fact-scale work is the
  * caller's aggregate that produced the series.
  */
object TrendOps {

  /** Theil 1950 / Sen 1968 median-slope trend per key: slope = exact
    * median of pairwise slopes, intercept = exact median of the
    * residuals under that slope. Medians are middle-rank row_number
    * selections (deterministic under ties); the even-case midpoint is
    * one commutative two-value AVG — bit-reproducible cross-engine.
    * Output: (key, n_days, n_pairs, slope, intercept). */
  def theilSen(series: DataFrame, keyCol: String, timeCol: String,
      valueCol: String): DataFrame = {
    val idx = series
      .select(col(keyCol), col(timeCol),
        col(valueCol).cast("double").as("__x"))
      .withColumn("__i", row_number()
        .over(Window.partitionBy(col(keyCol)).orderBy(col(timeCol)))
        .cast("double"))
    val a = idx.select(col(keyCol).as("__et"),
      col("__i").as("__ia"), col("__x").as("__xa"))
    val b = idx.select(col(keyCol).as("__et2"),
      col("__i").as("__ib"), col("__x").as("__xb"))
    val slopes = a
      .join(b, col("__et") === col("__et2") && col("__ia") < col("__ib"))
      .select(col("__et"), col("__ia"), col("__ib"),
        ((col("__xb") - col("__xa"))
          / (col("__ib") - col("__ia"))).as("__s"))
    val ws = Window.partitionBy(col("__et"))
      .orderBy(col("__s"), col("__ia"), col("__ib"))
    val wc = Window.partitionBy(col("__et"))
    val med = slopes
      .withColumn("__rn", row_number().over(ws).cast("long"))
      .withColumn("__m", count(lit(1)).over(wc))
      .where(col("__rn") === expr("(__m + 1) div 2")
        || col("__rn") === expr("(__m + 2) div 2"))
      .groupBy(col("__et"))
      .agg(avg(col("__s")).as("slope"), max(col("__m")).as("n_pairs"))
    val resid = idx
      .join(med, col(keyCol) === col("__et"))
      .withColumn("__r", col("__x") - col("slope") * col("__i"))
    val wr = Window.partitionBy(col(keyCol))
      .orderBy(col("__r"), col("__i"))
    val wrc = Window.partitionBy(col(keyCol))
    resid
      .withColumn("__rn", row_number().over(wr).cast("long"))
      .withColumn("__n", count(lit(1)).over(wrc))
      .where(col("__rn") === expr("(__n + 1) div 2")
        || col("__rn") === expr("(__n + 2) div 2"))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n_days"), max(col("n_pairs")).as("n_pairs"),
        max(col("slope")).as("slope"), avg(col("__r")).as("intercept"))
  }

  /** Mann 1945 / Kendall 1975 trend test per key: S = Σ sign(Δ) and
    * the tie sums stay integer; only the closing Var S /
    * continuity-corrected Z / tie-adjusted tau-b formulas are fp.
    * Output: (key, n_days, n_distinct, s_stat, var_s, z, tau_b). */
  def mannKendall(series: DataFrame, keyCol: String, timeCol: String,
      valueCol: String): DataFrame = {
    val idx = series
      .select(col(keyCol), col(timeCol), col(valueCol).as("__x"))
      .withColumn("__i", row_number()
        .over(Window.partitionBy(col(keyCol)).orderBy(col(timeCol))))
    val a = idx.select(col(keyCol).as("__et"),
      col("__i").as("__ia"), col("__x").as("__xa"))
    val b = idx.select(col(keyCol).as("__et2"),
      col("__i").as("__ib"), col("__x").as("__xb"))
    val s = a.join(b, col("__et") === col("__et2")
        && col("__ia") < col("__ib"))
      .groupBy(col("__et"))
      .agg(sum(signum(col("__xb") - col("__xa")).cast("long")).as("__s"),
        count(lit(1)).as("__n_pairs"))
    val ties = idx.groupBy(col(keyCol), col("__x"))
      .agg(count(lit(1)).as("__tv"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_distinct"),
        sum(col("__tv")).as("__n"),
        sum(col("__tv") * (col("__tv") - 1L)
          * (lit(2L) * col("__tv") + 5L)).as("__tie3"),
        sum(col("__tv") * (col("__tv") - 1L)).as("__tie2"))
    ties.join(s, col(keyCol) === col("__et"))
      .withColumn("var_s",
        (col("__n") * (col("__n") - 1L) * (lit(2L) * col("__n") + 5L)
          - col("__tie3")).cast("double") / lit(18.0))
      .select(col(keyCol), col("__n").as("n_days"),
        col("n_distinct"), col("__s").as("s_stat"), col("var_s"),
        when(col("__s") > 0L,
            (col("__s") - 1L).cast("double") / sqrt(col("var_s")))
          .when(col("__s") < 0L,
            (col("__s") + 1L).cast("double") / sqrt(col("var_s")))
          .otherwise(lit(0.0)).as("z"),
        (col("__s").cast("double")
          / sqrt((col("__n_pairs") - col("__tie2") / lit(2L))
              .cast("double")
            * col("__n_pairs").cast("double"))).as("tau_b"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Series-smoothing operators over an ordered (time, value) relation
  * (reference analogue: the analytics evaluators the ORDERED BY
  * family feeds; the GRAFT SMOOTH statement is their SQL front door).
  *
  * Scale shape shared with q257/q303/q304: the input is expected to be
  * an already-bounded series (a calendar-grain aggregate of the fact,
  * never the raw fact) — the sequential recurrence folds over the
  * sorted array INSIDE one aggregate row, so the distributed work is
  * exactly one collect_list aggregate. The recurrences repeat every
  * shared subexpression textually, keeping the IEEE double operation
  * sequence reproducible by a recursive-CTE oracle.
  */
object SmoothOps {

  /** Local-level Kalman filter: per step predict (p += q), gain
    * (k = p / (p + r)), update (l += k * (z - l); p *= 1 - k); init
    * l = first value, p = r. Emits one row per observation from the
    * second on: (time, actual, one-step pred, gain, filtered). */
  def kalman(df: DataFrame, timeCol: String, valueCol: String,
      q: Double, r: Double): DataFrame = {
    val tType = df.schema(timeCol).dataType.sql
    val series = df
      .select(col(timeCol).as("t"), col(valueCol).cast("double").as("x"))
      .agg(sort_array(collect_list(struct(col("t"), col("x")))).as("xs"))
    val qL = s"${q}D"
    val rL = s"${r}D"
    val gain = s"(acc.p + $qL) / (acc.p + $qL + $rL)"
    val folded = series.select(expr(
      s"""aggregate(
         |  slice(xs, 2, greatest(size(xs) - 1, 0)),
         |  named_struct(
         |    'l', if(size(xs) > 0, xs[0].x, cast(null as double)),
         |    'p', $rL,
         |    'f', cast(array() as array<struct<t: $tType, a: double,
         |      pred: double, gain: double, filt: double>>)),
         |  (acc, e) -> named_struct(
         |    'l', acc.l + ($gain) * (e.x - acc.l),
         |    'p', (1.0D - ($gain)) * (acc.p + $qL),
         |    'f', array_append(acc.f, named_struct(
         |      't', e.t, 'a', e.x,
         |      'pred', acc.l,
         |      'gain', $gain,
         |      'filt', acc.l + ($gain) * (e.x - acc.l)))))
         |""".stripMargin.trim).as("st"))
    folded.select(explode(col("st.f")).as("e"))
      .select(col("e.t").as(timeCol),
        round(col("e.a"), 6).as("actual"),
        round(col("e.pred"), 6).as("pred"),
        round(col("e.gain"), 6).as("gain"),
        round(col("e.filt"), 6).as("filt"))
  }
}
